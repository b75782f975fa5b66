package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.graftbridge.DatasetBridge

/** Whole-operator Catalyst extension: per-group top-k without sorting.
  *
  * The DataFrame way to take the k best rows per group is
  * `row_number() OVER (PARTITION BY g ORDER BY o) <= k`. Spark 3.5+
  * already prunes its shuffle volume (InferWindowGroupLimit plans a
  * Partial WindowGroupLimit before the exchange), but the built-in plan is
  *
  *   Sort(full partition) -> WindowGroupLimit(Partial) -> Exchange ->
  *   Sort -> WindowGroupLimit(Final) -> Window -> Filter
  *
  * — every input partition is FULLY SORTED (O(n log n) rows map-side) just
  * to take its first k per group, then the survivors are sorted again and
  * pushed through the whole Window machinery. This operator replaces both
  * sorts and the Window with bounded heaps:
  *
  *   - partial [[TopKPerGroupExec]]: each input partition keeps a heap of
  *     k rows per group — O(n log k) comparisons, no sort, at most
  *     k * groups rows leave each partition;
  *   - Exchange on the group keys (inserted by EnsureRequirements from the
  *     final node's ClusteredDistribution requirement);
  *   - final [[TopKPerGroupExec]]: merges the per-partition candidates with
  *     the same bounded heap.
  *
  * Shuffle volume is min(n, k * |groups| * partitions) — same as the
  * built-in group-limit — but no node ever materializes or sorts a whole
  * partition: per-heap memory is O(k) rows, per-task memory
  * O(k * groups-in-task). For the same reason as hash aggregation, group
  * cardinality per task should fit in memory; with k small that bound is
  * weaker than the hash-agg bound a groupBy on the same keys would need.
  * Measured at sf0.1 (150k orders, 10k customers, k=3, local[32]):
  * 0.38-0.62 s vs 0.47-1.0 s for the window twin — the structural term
  * (full-partition sort vs heap) grows with rows-per-partition.
  *
  * Semantics = `row_number <= k` (ties broken by the ordering itself; pass
  * a total order — e.g. include a unique key as the last sort column — for
  * a deterministic result, exactly as with row_number).
  *
  * Registration: [[TopKPerGroup.install]] hooks the strategy into a
  * session's experimental methods; [[GraftSparkExtensions]] is the
  * `spark.sql.extensions`-conf equivalent for cluster deployment.
  */
case class TopKPerGroupNode(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroupNode =
    copy(child = newChild)
}

/** Physical bounded-heap top-k per group; `partial` mirrors partial/final
  * hash aggregation (partial prunes map-side, final merges after the
  * group-key exchange). */
case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution)
    else if (groupExprs.isEmpty) Seq(AllTuples) // global top-k
    else Seq(ClusteredDistribution(groupExprs))

  override protected def doExecute(): RDD[InternalRow] = {
    val groupE = groupExprs
    val orderE = order
    val kk = k
    val childOut = child.output
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(groupE, childOut)
      val ord = GenerateOrdering.generate(orderE, childOut)
      // head of each heap = worst row currently kept (max under ord), so a
      // better row replaces it in O(log k); rows/keys are copied out of the
      // scan's reused buffers before retention
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](kk, ord.reverse)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < kk) heap.add(row.copy())
        else if (ord.lt(row, heap.peek())) { heap.poll(); heap.add(row.copy()) }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as partial -> (exchange) -> final. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, o, k, child) =>
      val part = TopKPerGroupExec(g, o, k, partial = true, planLater(child))
      TopKPerGroupExec(g, o, k, partial = false, part) :: Nil
    case _ => Nil
  }
}

object TopKPerGroup {

  /** Register the planner strategy in a session (idempotent). */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** Top-k rows per group of `df`. `orderKeys` are (column, ascending)
    * pairs evaluated in sequence; include a unique key last for a
    * deterministic (row_number-equivalent) result. */
  def apply(df: DataFrame, groupCols: Seq[String], orderKeys: Seq[(String, Boolean)],
            k: Int): DataFrame = {
    val spark = df.sparkSession
    install(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => spark.sessionState.conf.resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not among ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderKeys.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    DatasetBridge.ofRows(spark,
      TopKPerGroupNode(groupCols.map(attr), order, k, analyzed))
  }
}

/** `spark.sql.extensions`-style registration
  * (`--conf spark.sql.extensions=graft.plans.GraftSparkExtensions`): the
  * cluster-deployment path for the same strategy + optimizer rule the
  * library installs per-session via the `install` helpers. */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => TopKPerGroupStrategy)
    ext.injectOptimizerRule(_ => RangeJoinRewrite(binSize = 600L))
  }
}
