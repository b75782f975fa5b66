package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Interval/range join: pairs (l, r) with r.time in [l.time, l.time + win).
  *
  * A naive theta-join plans as BroadcastNestedLoopJoin — O(n*m) comparisons,
  * unusable at scale. This implementation buckets time into `win`-sized
  * cells: each left row joins only rows in its own and the next bucket
  * (every [t, t+win) interval spans at most two cells), turning the plan
  * into an equi-join (shuffled hash / sort-merge) plus a residual filter.
  * Comparisons drop from O(n*m) to O(sum of per-bucket products) — the
  * standard overlap-join optimization (cf. Spark's own range-join hints in
  * Databricks runtime, expressed here with open-source primitives).
  */
object RangeJoin {

  /** left: (lcols..., ltime); right: (rcols..., rtime); win in seconds.
    * Output: all (left x right) rows with rtime in [ltime, ltime + win). */
  def timeWindowJoin(left: DataFrame, right: DataFrame,
                     leftTime: String, rightTime: String,
                     winSeconds: Long,
                     extraCondition: org.apache.spark.sql.Column = lit(true)): DataFrame = {
    val lb = left
      .withColumn("_lsec", unix_timestamp(col(leftTime)))
      .withColumn("_bucket", explode(array(
        expr(s"_lsec div $winSeconds"),
        expr(s"_lsec div $winSeconds") + 1)))
    val rb = right
      .withColumn("_rsec", unix_timestamp(col(rightTime)))
      .withColumn("_bucket", expr(s"_rsec div $winSeconds"))
    // bucketing uses floor-seconds; the residual filter compares the full-
    // precision timestamps (unix_timestamp truncates sub-second parts)
    lb.join(rb, Seq("_bucket"))
      .filter(col(rightTime) >= col(leftTime) &&
        col(rightTime) < col(leftTime) + expr(s"INTERVAL $winSeconds SECONDS") &&
        extraCondition)
      .drop("_bucket", "_lsec", "_rsec")
  }
}
