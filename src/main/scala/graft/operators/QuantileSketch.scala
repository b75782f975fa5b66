package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketches on a FIXED INTEGER GRID — the
  * pre-aggregated sketch-table pattern (q57's HLL shape) for
  * percentiles: build a per-segment PARTIAL sketch (bounded bucket
  * counts on a declared [lo, hi) grid), union-merge partials with plain
  * counter addition, answer any quantile from the merged counters.
  *
  * Why a grid and not KLL/t-digest: the merge is EXACT integer
  * arithmetic (element-wise sum), so it is associative, commutative,
  * and replay-deterministic — partials built per ingest batch, merged
  * in any order, any number of times, always yield the same counters
  * bit-for-bit, and a DuckDB oracle replays the whole pipeline in SQL.
  * Randomized compactors (KLL) and centroid drift (t-digest) trade that
  * determinism for adaptivity; a declared-domain grid keeps the error
  * contract just as explicit: the reported quantile is the upper edge
  * of the bucket containing the target rank, so it is within ONE CELL
  * WIDTH ((hi-lo)/buckets) of the exact quantile value — the envelope
  * FunctionsSpec asserts quantitatively.
  *
  * 100 TB shape: a partial is at most `buckets` counter rows per
  * segment however many rows the segment holds — per-batch partials are
  * built map-side (groupBy on a codegen'd bucket expression), stored as
  * a tiny sketch table, and a quantile query touches ONLY the sketch
  * table: one keyed sum + one cumulative window over `buckets` rows per
  * key, never the raw corpus. */
object QuantileSketch {

  /** The grid cell of a value: floor((v - lo) / width) clamped to
    * [0, buckets) — same IEEE754 double arithmetic in any engine, so
    * bucket assignment replays bit-exactly. Out-of-domain values clamp
    * to the edge cells (their quantiles saturate at the domain bounds —
    * declare the domain wide enough to matter). */
  def bucketOf(v: Column, lo: Double, hi: Double, buckets: Int): Column = {
    val w = (hi - lo) / buckets
    least(greatest(floor((v.cast("double") - lit(lo)) / lit(w)), lit(0.0)),
      lit((buckets - 1).toDouble)).cast("long")
  }

  /** PARTIAL sketches: one (segment, bucket, cnt) counter table —
    * ≤ `buckets` rows per segment leave the aggregation, map-side
    * partials collapse each task's slice first. */
  def partials(df: DataFrame, valueCol: String, segmentCols: Seq[String],
               lo: Double, hi: Double, buckets: Int): DataFrame =
    df.groupBy((segmentCols.map(col) :+
        bucketOf(col(valueCol), lo, hi, buckets).as("bucket")): _*)
      .agg(count(lit(1)).as("cnt"))

  /** UNION-MERGE partial sketches down to `keyCols` granularity: counter
    * addition — exact, order-independent, repeatable. */
  def merge(partials: DataFrame, keyCols: Seq[String]): DataFrame =
    partials.groupBy((keyCols.map(col) :+ col("bucket")): _*)
      .agg(sum("cnt").as("cnt"))

  /** Quantile query over a MERGED sketch: for each key and each q, the
    * first bucket whose cumulative count reaches rank ceil(q·N), and
    * that bucket's upper value edge — within one cell width of the
    * exact quantile. Output: key..., q, bucket, sketch_val. */
  def quantiles(merged: DataFrame, keyCols: Seq[String], qs: Seq[Double],
                lo: Double, hi: Double, buckets: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = (hi - lo) / buckets
    val keys = keyCols.map(col)
    val cum = merged.withColumn("cum",
      sum("cnt").over(Window.partitionBy(keys: _*).orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tot = merged.groupBy(keys: _*).agg(sum("cnt").as("n"))
    val qdf = qs.map(q => s"($q)").mkString(", ")
    // CAST: a bare 0.25 literal parses as DECIMAL — the rank arithmetic
    // and the output column must be DOUBLE for engine-stable replay
    val probes = merged.sparkSession.sql(
      s"SELECT CAST(q AS DOUBLE) AS q FROM VALUES $qdf AS t(q)")
    // per (key, q): the minimal bucket at-or-past the target rank. The
    // probe side is |qs| rows — broadcast; the sketch side is ≤ buckets
    // rows per key, so the "join" work is sketch-table-sized, not data-
    // sized
    cum.join(tot, keyCols)
      .join(broadcast(probes),
        col("cum") >= ceil(col("q") * col("n")).cast("long"))
      .groupBy((keys :+ col("q")): _*)
      .agg(min("bucket").as("bucket"))
      .withColumn("sketch_val",
        lit(lo) + (col("bucket") + lit(1L)) * lit(w))
  }
}
