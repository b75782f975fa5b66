package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch as a DECLARATIVE two-phase shape (build a tiny counter
  * table once, answer point-frequency queries from it forever) — the
  * streaming-agg cousin of the exact Misra-Gries pass in
  * [[HeavyHitters]]: MG returns the exact heavy tail, CMS answers
  * arbitrary point lookups later with a bounded overcount
  * (est - true <= 2N/width with probability 1 - 2^-depth per query).
  *
  * The d hash rows are DISJOINT 32-bit slices of one md5 of the key —
  * d independent uniform hashes for d <= 4 at one hash invocation per
  * row, and a formula every ANSI SQL engine can replay bit-exactly
  * (the DuckDB oracle regenerates the same cells), unlike Spark's
  * builtin `count_min_sketch` whose binary blob is implementation-seeded.
  *
  * Scale shape: the build is one codegen'd projection + a groupBy whose
  * map-side partial aggregation collapses every partition to at most
  * depth*width cells before the shuffle — the reduce stage moves
  * O(depth*width) rows per partition regardless of corpus size. The
  * finished sketch is <= depth*width rows, so estimation broadcasts it
  * and stays a map-only pass over the probe side.
  */
object CountMin {

  /** Counter cells `(row, bucket, c)` for a CMS of `depth` hash rows and
    * `width` buckets over `df(keyCol)` (strings). At most depth*width
    * rows come back — persist or write this, it IS the sketch. */
  def sketch(df: DataFrame, keyCol: String, depth: Int = 4,
             width: Int = 1024): DataFrame = {
    require(depth >= 1 && depth <= 4,
      "md5 yields 4 disjoint 32-bit slices; depth must be in [1,4]")
    require(width > 0, "width must be positive")
    df.select(posexplode(array(bucketCols(col(keyCol), depth, width): _*))
        .as(Seq("row", "bucket")))
      .groupBy("row", "bucket").agg(count(lit(1)).as("c"))
  }

  /** Point estimates for each distinct key in `probes(keyCol)`: the
    * classic min over the key's `depth` counters. Cells the sketch never
    * touched count 0 (a key that never occurred can still estimate 0 when
    * its cells are collision-free). Output: probes' columns + `est`. */
  def estimate(cells: DataFrame, probes: DataFrame, keyCol: String,
               depth: Int = 4, width: Int = 1024): DataFrame = {
    val probeCols = probes.columns.toSeq
    probes
      .select(probeCols.map(col) :+
        posexplode(array(bucketCols(col(keyCol), depth, width): _*))
          .as(Seq("row", "bucket")): _*)
      .join(broadcast(cells), Seq("row", "bucket"), "left")
      .withColumn("_c", coalesce(col("c"), lit(0L)))
      .groupBy(probeCols.map(col): _*)
      .agg(min("_c").as("est"))
  }

  /** Hash row i's bucket: hex slice [8i, 8i+8) of md5(key), mod width. */
  private def bucketCols(key: Column, depth: Int, width: Int): Seq[Column] =
    (0 until depth).map { i =>
      conv(substring(md5(key), 1 + 8 * i, 8), 16, 10).cast("long") % width
    }
}
