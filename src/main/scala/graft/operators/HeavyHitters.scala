package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Exact distributed heavy hitters (frequent items) via two phases:
  *
  *   1. candidates — each partition runs a Misra-Gries summary of
  *      `capacity` counters over its local stream (O(1) amortized per
  *      item, O(capacity) memory). MG guarantees every item whose LOCAL
  *      frequency exceeds n_p/(capacity+1) survives locally; summing the
  *      contrapositive over partitions shows every item with GLOBAL
  *      frequency > n/(capacity+1) survives in at least one partition —
  *      so for any threshold fraction minFrac > 1/(capacity+1) the union
  *      of per-partition candidates is a superset of the true answer.
  *      At most capacity rows leave each partition.
  *   2. verify — exact counts for the candidate set only: the candidates
  *      (≤ capacity * partitions rows) broadcast-join back against the
  *      corpus, one hash aggregation over the filtered stream, then the
  *      exact threshold cut.
  *
  * The result is therefore EXACT (identical to groupBy-count-filter) while
  * never shuffling the full corpus: phase 1 shuffles only candidate ids,
  * phase 2 aggregates only rows matching a candidate. This is the
  * standard exact-frequent-items shape at 100 TB, where a full
  * groupBy(token) over the corpus would shuffle every token occurrence.
  *
  * Determinism: candidate SETS vary with partitioning (MG evictions are
  * order-dependent), but the guarantee above makes the post-verify result
  * partitioning-invariant — only true >= threshold items survive, and all
  * of them do. (OperatorsSpec checks both the guarantee and the exact
  * equality against the naive plan on adversarial data.)
  */
object HeavyHitters {

  /** Misra-Gries over one iterator: classic k-counter summary. */
  private[operators] def misraGries(items: Iterator[String],
                                    capacity: Int): Iterator[String] = {
    val counters = new java.util.HashMap[String, Long](capacity * 2)
    items.foreach { item =>
      val c = counters.get(item)
      if (c != 0L || counters.containsKey(item)) counters.put(item, c + 1L)
      else if (counters.size < capacity) counters.put(item, 1L)
      else {
        // decrement-all step; remove zeroed counters
        val it = counters.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          if (e.getValue == 1L) it.remove() else e.setValue(e.getValue - 1L)
        }
      }
    }
    import scala.jdk.CollectionConverters._
    counters.keySet().iterator().asScala
  }

  /** All items of `itemCol` whose exact count >= ceil(minFrac * n), with
    * that exact count — bit-identical to groupBy-count-filter provided
    * minFrac > 1/(capacity+1) (enforced). Nulls are ignored (as groupBy
    * on a filtered corpus would). */
  def exact(df: DataFrame, itemCol: String, minFrac: Double,
            capacity: Int = 4096): DataFrame = {
    require(minFrac > 1.0 / (capacity + 1),
      s"minFrac=$minFrac below the MG guarantee 1/(capacity+1)=${1.0 / (capacity + 1)}; " +
        "raise capacity or the threshold")
    val spark = df.sparkSession
    import spark.implicits._
    val items: Dataset[String] =
      df.select(col(itemCol).cast("string")).filter(col(itemCol).isNotNull).as[String]
    val cap = capacity
    // ONE pass over the corpus produces both the MG candidates AND the
    // total count: each partition appends a (null, n_p) marker row to its
    // <= capacity candidate rows. The tiny summary is cached, n and the
    // candidate set derived from it, and the candidates localCheckpoint'ed
    // so the final verify join cannot re-trigger the corpus scan once the
    // cache is released — 2 corpus reads total (candidates + verify), the
    // algorithm's minimum.
    val summary = items.mapPartitions { it =>
      var np = 0L
      val counted = it.map { x => np += 1; x }
      val kept = misraGries(counted, cap).toArray // exhausts `counted` first
      kept.iterator.map(i => (i, 0L)) ++ Iterator((null: String, np))
    }.toDF("item", "np").persist()
    try {
      val n = summary.filter(col("item").isNull)
        .agg(coalesce(sum("np"), lit(0L))).head().getLong(0)
      val threshold = math.ceil(minFrac * n).toLong
      val candidates = summary.filter(col("item").isNotNull)
        .select("item").distinct().localCheckpoint()
      items.toDF("item")
        .join(broadcast(candidates), "item")
        .groupBy("item").agg(count(lit(1)).as("cnt"))
        .filter(col("cnt") >= threshold)
    } finally summary.unpersist()
  }
}
