package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

/** Catalyst optimizer rule: rewrite a pure interval (theta) join into a
  * bucketed equi-join.
  *
  * A join whose only condition is `point >= lo AND point < hi` has no
  * equi-join keys, so Spark plans BroadcastNestedLoopJoin (or a cartesian
  * product) — O(n*m) comparisons, unusable at 100 TB. This rule detects the
  * point-in-interval shape on LongType columns and rewrites it to:
  *
  *   - point side:    add `_graft_bucket = point div binSize`
  *   - interval side: `Generate(explode(sequence(lo div binSize,
  *                    (hi-1) div binSize)))` — one row per covered bucket
  *   - join:          on bucket equality AND the ORIGINAL condition
  *                    (kept in full as the residual filter, so the rewrite
  *                    is correct for any interval, including empty ones)
  *
  * The equi key lets the planner choose shuffled-hash / sort-merge, making
  * cost proportional to per-bucket collision products instead of n*m. This
  * is the logical-plan twin of [[graft.operators.RangeJoin.timeWindowJoin]]
  * (same bucketing algebra), applied automatically to SQL front-door
  * queries — the open-source expression of the range-join optimization
  * that commercial Spark runtimes ship as a hint.
  *
  * Correctness notes:
  *   - `div` (IntegralDivide) truncates toward zero, which is monotonic
  *     non-decreasing in the numerator for a positive divisor, so every
  *     point in [lo, hi) lands in a bucket within
  *     [lo div b, (hi-1) div b] — no pair is missed.
  *   - Empty intervals (hi <= lo): `sequence` with inferred step emits a
  *     descending bucket range; the spurious candidates are then removed by
  *     the residual original condition.
  *   - NULL point / bounds: bucket or sequence evaluates to NULL, and
  *     NULL never equi-joins — same no-match semantics as the theta join.
  *   - Fires only when the join has NO equi conjunct already (also makes
  *     the rule a no-op on its own output, so the fixed-point batch
  *     terminates).
  *
  * Sizing note: each interval row expands to one generated row per covered
  * bucket (~width/binSize). Pick binSize on the order of the typical
  * interval width — the same contract as the bin size in commercial
  * range-join hints. A binSize orders of magnitude below the widest
  * interval multiplies that row's fan-out accordingly (pathological case:
  * a near-Long-range interval would try to materialize a giant sequence
  * array), so the rule is opt-in per session rather than globally on.
  *
  * Register per session (idempotent):
  * {{{ RangeJoinRewrite.install(spark, binSize = 600) }}}
  */
case class RangeJoinRewrite(binSize: Long) extends Rule[LogicalPlan] {
  require(binSize > 0, "binSize must be positive")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if j.resolved && cond.deterministic && !hasEquiKey(cond, left, right) =>
      rewrite(j, left, right, cond).getOrElse(j)
  }

  private def splitConjuncts(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitConjuncts(l) ++ splitConjuncts(r)
    case other     => Seq(other)
  }

  /** True if any conjunct is already an equality with one side per child —
    * then Spark has a hash-join path and the rewrite is unnecessary. */
  private def hasEquiKey(cond: Expression, left: LogicalPlan, right: LogicalPlan): Boolean =
    splitConjuncts(cond).exists {
      case EqualTo(a, b)       => oneSideEach(a, b, left, right)
      case EqualNullSafe(a, b) => oneSideEach(a, b, left, right)
      case _                   => false
    }

  private def oneSideEach(a: Expression, b: Expression,
                          left: LogicalPlan, right: LogicalPlan): Boolean =
    (a.references.subsetOf(left.outputSet) && b.references.subsetOf(right.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty) ||
    (a.references.subsetOf(right.outputSet) && b.references.subsetOf(left.outputSet) &&
      a.references.nonEmpty && b.references.nonEmpty)

  private def rewrite(j: Join, left: LogicalPlan, right: LogicalPlan,
                      cond: Expression): Option[LogicalPlan] = {
    val conjuncts = splitConjuncts(cond)
    // normalize lower bounds to (point, lo) and strict uppers to (point, hi)
    val lowers = conjuncts.collect {
      case GreaterThanOrEqual(p, lo) => (p, lo)
      case LessThanOrEqual(lo, p)    => (p, lo)
    }
    val uppers = conjuncts.collect {
      case LessThan(p, hi)    => (p, hi)
      case GreaterThan(hi, p) => (p, hi)
    }
    val candidates = for {
      (p1, lo) <- lowers
      (p2, hi) <- uppers
      if p1.semanticEquals(p2)
      if Seq(p1, lo, hi).forall(e => supportedType(e.dataType) && e.deterministic)
      pointIsLeft <- side(p1, lo, hi, left, right)
    } yield (p1, lo, hi, pointIsLeft)

    candidates.headOption.map { case (point0, lo0, hi0, pointIsLeft) =>
      // Timestamps bucket through their epoch-seconds cast (monotonic, so
      // the covering-range argument holds unchanged); the residual original
      // condition still compares full-precision values.
      def asLong(e: Expression): Expression =
        if (e.dataType == LongType) e
        else Cast(e, LongType, Some(conf.sessionLocalTimeZone))
      val (point, lo, hi) = (asLong(point0), asLong(lo0), asLong(hi0))
      val bin = Literal(binSize, LongType)
      val (pointPlan, intervalPlan) = if (pointIsLeft) (left, right) else (right, left)

      val pBucket = Alias(IntegralDivide(point, bin), "_graft_bucket_p")()
      val pointProj = Project(pointPlan.output :+ pBucket, pointPlan)

      // Sequence is TimeZoneAwareExpression: it only resolves with a
      // timeZoneId, even over plain longs.
      // The stop bucket uses hi UNadjusted even though hi is exclusive:
      // subtracting 1 would under-cover coarser-granularity buckets (a
      // timestamp point < hi inside hi's own second lands one bucket past
      // floor((hi_sec-1)/bin)), risks ANSI overflow at Long.MinValue, and
      // saves at most one spurious bucket per interval — which the residual
      // original condition removes anyway.
      val seqExpr = Sequence(
        IntegralDivide(lo, bin),
        IntegralDivide(hi, bin),
        None,
        Some(conf.sessionLocalTimeZone))
      val bucketAttr = AttributeReference("_graft_bucket", LongType, nullable = true)()
      val gen = Generate(Explode(seqExpr), unrequiredChildIndex = Nil, outer = false,
        qualifier = None, generatorOutput = Seq(bucketAttr), child = intervalPlan)

      val newCond = And(EqualTo(pBucket.toAttribute, bucketAttr), cond)
      val (nl, nr) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
      // restore the original output (drop the helper bucket columns)
      Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
    }
  }

  /** LongType buckets directly; TimestampType through its epoch-seconds
    * cast. (The comparison operators guarantee all three expressions share
    * a type after analyzer coercion.) */
  private def supportedType(t: DataType): Boolean =
    t == LongType || t == TimestampType

  /** Some(true) if point comes from left and bounds from right; Some(false)
    * for the mirror; None if the split is ambiguous. */
  private def side(p: Expression, lo: Expression, hi: Expression,
                   left: LogicalPlan, right: LogicalPlan): Option[Boolean] = {
    val bounds = lo.references ++ hi.references
    if (p.references.nonEmpty && bounds.nonEmpty &&
        p.references.subsetOf(left.outputSet) && bounds.subsetOf(right.outputSet))
      Some(true)
    else if (p.references.nonEmpty && bounds.nonEmpty &&
             p.references.subsetOf(right.outputSet) && bounds.subsetOf(left.outputSet))
      Some(false)
    else None
  }
}

object RangeJoinRewrite {
  /** Install the rule into a session's experimental optimizer batch
    * (idempotent: replaces any previously installed instance). */
  def install(spark: SparkSession, binSize: Long): Unit = {
    val others = spark.experimental.extraOptimizations
      .filterNot(_.isInstanceOf[RangeJoinRewrite])
    spark.experimental.extraOptimizations = others :+ RangeJoinRewrite(binSize)
  }
}
