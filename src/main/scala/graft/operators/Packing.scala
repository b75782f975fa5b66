package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Context-window packing: assign ordered documents to fixed token budgets
  * (pack k = the docs whose running pre-sum falls in [k*budget, (k+1)*budget))
  * — the standard greedy packing used to fill LLM pretraining contexts.
  *
  * The naive formulation is a running sum over a GLOBAL window (no
  * partitionBy), which funnels the entire corpus through one task — broken
  * at scale. This is the classic two-phase distributed prefix sum instead:
  *
  *   1. range-repartition by the order column (so partition i holds a
  *      contiguous, globally-ordered slice) and compute per-partition
  *      running sums — fully parallel;
  *   2. aggregate one total per partition (a tiny frame: one row per
  *      partition), turn those into cumulative offsets with a window over
  *      that tiny frame, and broadcast-join the offset back;
  *   3. global running sum = local running sum + partition offset.
  *
  * Identical output to the global window (asserted by equivalence test);
  * the only non-parallel step works on #partitions rows.
  */
object Packing {

  /** Adds `cum` (inclusive global running sum of weightCol in orderCol
    * order) and `pack_id` (floor((cum - weight) / budget)). */
  def packBudget(df: DataFrame, orderCol: String, weightCol: String,
                 budget: Long, numPartitions: Int = 0): DataFrame = {
    val parted = (if (numPartitions > 0)
        df.repartitionByRange(numPartitions, col(orderCol))
      else df.repartitionByRange(col(orderCol)))
      .withColumn("_pid", spark_partition_id())
    val localW = Window.partitionBy("_pid").orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = parted.withColumn("_local_cum", sum(col(weightCol)).over(localW))
    // one row per partition -> cumulative offset of everything BEFORE pid
    val offW = Window.orderBy("_pid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = local.groupBy("_pid")
      .agg(sum(col(weightCol)).as("_ptotal"))
      .withColumn("_offset", coalesce(sum(col("_ptotal")).over(offW), lit(0L)))
      .select("_pid", "_offset")
    local.join(broadcast(offsets), "_pid")
      .withColumn("cum", col("_local_cum") + col("_offset"))
      .withColumn("pack_id",
        floor((col("cum") - col(weightCol)) / budget.toDouble).cast("long"))
      .drop("_pid", "_local_cum", "_offset")
  }
}
