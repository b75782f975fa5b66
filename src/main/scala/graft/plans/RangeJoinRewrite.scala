package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, TimestampType}

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
  * range-join hints. Passing [[RangeJoinRewrite.AutoBin]] (0) instead
  * derives the width from the POINT side's CBO column statistics at plan
  * time (`ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS` +
  * `spark.sql.cbo.enabled`): density = rowCount / point-column span, and
  * the bin targets [[RangeJoinRewrite.TargetRowsPerBucket]] expected point
  * rows per cell — per-bucket join products stay bounded however dense the
  * data gets, which a statically-chosen width cannot guarantee (the bin
  * shrinks as density grows). Interval width is runtime data the stats
  * cannot see, so the occupancy target replaces the width heuristic; joins
  * whose intervals span many derived cells are still caught by the
  * maxFanout guard below. Without usable stats the rule falls back to
  * [[RangeJoinRewrite.DefaultBinSize]]. The bin width never changes the
  * RESULT, only the plan. The rewrite is fan-out-guarded: interval rows that
  * can never match (lo >= hi, compared at full precision) are filtered out
  * before the Generate, and rows whose bucket fan-out would exceed
  * `maxFanout` are routed to a theta-join fallback branch instead of
  * materializing a giant sequence array — so a pathological interval
  * (near-Long-range width, or binSize orders of magnitude too small)
  * degrades to the original slow-but-correct nested-loop for THOSE rows
  * only, never to a runtime failure. The fallback join is tagged so the
  * fixed-point optimizer batch does not re-rewrite its own output.
  * The fallback branch exists in EVERY rewritten plan (whether any row
  * exceeds maxFanout is runtime data); with AQE enabled (Spark's default)
  * the usual empty wide-side collapses via empty-relation propagation at
  * runtime, so the branch's steady-state cost is one filter pass over the
  * interval side (measured: q45 in isolation ~0.2 s of its 0.8 s total at
  * sf0.1). Without AQE the nested-loop join over an empty side still
  * executes its point-side scan — keep AQE on.
  *
  * Register per session (idempotent):
  * {{{ RangeJoinRewrite.install(spark, binSize = 600) }}}
  */
case class RangeJoinRewrite(binSize: Long, maxFanout: Long = 4096L)
    extends Rule[LogicalPlan] {
  require(binSize >= 0, "binSize must be positive (or AutoBin = 0 for stats-derived)")
  require(maxFanout > 0, "maxFanout must be positive")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), _)
        if j.resolved && cond.deterministic && !hasEquiKey(cond, left, right) &&
          j.getTagValue(RangeJoinRewrite.skipTag).isEmpty =>
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
      val (pointPlan, intervalPlan) = if (pointIsLeft) (left, right) else (right, left)
      val binWidth = effectiveBinSize(point0, pointPlan)
      val bin = Literal(binWidth, LongType)

      // Fan-out guards on the interval side:
      //  - nonEmpty: lo < hi at FULL precision (an interval with lo >= hi
      //    can never satisfy point >= lo AND point < hi, and an inverted
      //    one would explode into a long DESCENDING bucket sequence). Must
      //    compare the original expressions, not the seconds-truncated
      //    longs: a sub-second timestamp interval truncates to lo == hi but
      //    still matches points.
      //  - bounded: estimated bucket span <= maxFanout, computed in DOUBLE
      //    so near-Long-range widths cannot ANSI-overflow the guard itself.
      //  NULL bounds make both guards NULL -> the row is dropped from both
      //  branches, same no-match outcome as the theta join.
      val nonEmpty = LessThan(lo0, hi0)
      val bounded = LessThanOrEqual(
        Subtract(Cast(hi, DoubleType), Cast(lo, DoubleType)),
        Literal(binWidth.toDouble * maxFanout.toDouble, DoubleType))
      val bucketable = Filter(And(nonEmpty, bounded), intervalPlan)

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
        qualifier = None, generatorOutput = Seq(bucketAttr), child = bucketable)

      val newCond = And(EqualTo(pBucket.toAttribute, bucketAttr), cond)
      val (nl, nr) = if (pointIsLeft) (pointProj, gen) else (gen, pointProj)
      val bucketed = Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))

      // Overflow branch: interval rows too wide to bucket keep the original
      // slow-but-correct theta join (few rows by construction — each would
      // have generated > maxFanout rows instead). Tagged so the fixed-point
      // optimizer batch doesn't recursively rewrite its own fallback.
      val wide = Filter(And(nonEmpty, Not(bounded)), intervalPlan)
      val (fl, fr) = if (pointIsLeft) (pointPlan, wide) else (wide, pointPlan)
      val fallback = Join(fl, fr, Inner, Some(cond), j.hint)
      fallback.setTagValue(RangeJoinRewrite.skipTag, ())
      val fallbackProj = Project(j.output, fallback)

      Union(Seq(bucketed, fallbackProj))
    }
  }

  /** The bucket width this join will use. Explicit binSize wins; AutoBin
    * derives from the point side's CBO column statistics (see the class
    * doc's sizing note): bin = TargetRowsPerBucket / density, so expected
    * point rows per cell is the constant target at any density. Exposed
    * private[plans] so the spec can assert the derivation. */
  private[plans] def effectiveBinSize(point: Expression, pointPlan: LogicalPlan): Long = {
    if (binSize > 0) return binSize
    val derived: Option[Long] = point.references.toSeq match {
      case Seq(attr: Attribute) =>
        val stats = pointPlan.stats
        for {
          rc <- stats.rowCount if rc > 0
          cs <- stats.attributeStats.get(attr)
          mn <- cs.min
          mx <- cs.max
          span <- spanSeconds(attr.dataType, mn, mx) if span > 0
        } yield {
          val density = rc.toDouble / span
          math.max(1L, math.min(RangeJoinRewrite.MaxAutoBinSize,
            (RangeJoinRewrite.TargetRowsPerBucket / density).round))
        }
      case _ => None
    }
    derived.getOrElse(RangeJoinRewrite.DefaultBinSize)
  }

  /** ColumnStat min/max, in this rule's bucket unit (seconds): timestamps
    * are stored as epoch MICROS in catalog statistics; longs as-is. */
  private def spanSeconds(t: DataType, mn: Any, mx: Any): Option[Double] = (t, mn, mx) match {
    case (LongType, a: Long, b: Long)      => Some((b - a).toDouble)
    case (TimestampType, a: Long, b: Long) => Some((b - a).toDouble / 1e6)
    case _                                 => None
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
  /** Marks the wide-interval fallback join so the fixed-point optimizer
    * batch never re-rewrites the rule's own output (tags survive makeCopy/
    * withNewChildren, so later rules touching the join keep the mark). */
  private[plans] val skipTag = TreeNodeTag[Unit]("graft.rangeJoinRewrite.skip")

  /** binSize sentinel: derive the bucket width from the point side's CBO
    * column statistics at plan time (falls back to [[DefaultBinSize]]
    * without stats). */
  val AutoBin: Long = 0L
  /** Auto mode's expected point rows per bucket cell. Bounds every
    * per-bucket join product at ~target * per-cell interval rows whatever
    * the density; small enough that one cell's group never strains an SMJ
    * buffer, large enough that cell management stays negligible. */
  val TargetRowsPerBucket: Long = 1024L
  /** Auto mode without usable stats: 10-minute cells, the session-scale
    * magnitude the gate queries use — supply binSize explicitly (or
    * ANALYZE the point table) for a fitted width. */
  val DefaultBinSize: Long = 600L
  /** Auto-derivation ceiling (~35k years of seconds): a near-empty point
    * side would otherwise derive an absurd width; at these sizes every
    * interval lands in one or two cells regardless. */
  val MaxAutoBinSize: Long = 1L << 40

  /** Install the rule into a session's experimental optimizer batch
    * (idempotent: replaces any previously installed instance). */
  def install(spark: SparkSession, binSize: Long, maxFanout: Long = 4096L): Unit = {
    val others = spark.experimental.extraOptimizations
      .filterNot(_.isInstanceOf[RangeJoinRewrite])
    spark.experimental.extraOptimizations = others :+ RangeJoinRewrite(binSize, maxFanout)
  }
}
