package graft.core

import org.apache.spark.sql.DataFrame

/** Scale-adaptive fan-out for compute-heavy map stages (optimization
  * round 15, guide §2: derive partitioning from the input, never a
  * constant).
  *
  * A small input — one parquet file, one cached block, one micro-batch —
  * plans as ONE partition, so a downstream stage doing real per-row work
  * (shingling + 64-hash MinHash signatures, percentile buffers, n-gram
  * explosion) runs on a single core no matter how many the session has.
  * At cluster scale the same plan has thousands of input partitions and
  * needs no help; an unconditional repartition there would add a full
  * shuffle of the payload for nothing.
  *
  * [[fanOut]] is therefore a NO-OP when the input already carries at
  * least the session's default parallelism, and a round-robin
  * repartition to exactly that width when it does not. Round-robin keeps
  * rows intact (no key skew possible), stays deterministic under task
  * retry (Spark sorts before round-robin repartition — SPARK-23207), and
  * REPARTITION_BY_NUM is exempt from AQE coalescing, so the width
  * sticks. Only use above order-insensitive consumers (aggregations,
  * joins, exact counters) — it reorders rows. */
object Parallelism {
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    // getNumPartitions inspects the planned RDD lineage; it runs no job
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
