package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for SCOPED compaction (`compact(where => ...)` /
  * [[graft.core.ManifestTable.compactScoped]]): the 100 TB claim is that
  * a maintenance pass over ONE slice of a table costs that slice's bytes,
  * never the table — so as the table grows by adding MORE slices, the
  * scoped rewrite of one fixed slice should stay ~flat while a full
  * compact grows with the table.
  *
  * Setup: S slices of R rows each, every slice inserted as its own
  * fragmented pair of files with a disjoint `k` range; measure
  * `compact(where => '<slice-0 range>')` and a full `compact()` at
  * S = 4, 16, 64 slices. Prints one JSON line with both time series and
  * the files-rewritten counts (the scoped pass must keep selecting the
  * same ~2 files at every S).
  *
  * Usage: `sbt "runMain graft.tools.ScopedCompactScale"`. */
object ScopedCompactScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("scoped-compact-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.core.TempDirs.create("graft_scscale_")
    graft.catalog.GraftCatalog.register(spark, "gss", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gss.db")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rowsPerSlice = 200000L
    val sliceWidth = 1000000L
    def stage(table: String, slices: Int): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS gss.db.$table")
      spark.sql(s"CREATE TABLE gss.db.$table (k BIGINT, h STRING) USING manifest")
      (0 until slices).foreach { sl =>
        // two fragmented inserts per slice -> >= 2 files with this
        // slice's disjoint k range (something for the scoped pass to merge)
        (0 to 1).foreach { half =>
          val lo = sl * sliceWidth + half * (rowsPerSlice / 2)
          spark.sql(s"INSERT INTO gss.db.$table SELECT id, " +
            s"sha2(CAST(id AS STRING), 256) FROM " +
            s"range($lo, ${lo + rowsPerSlice / 2})")
        }
      }
    }

    val results = Seq(4, 16, 64).map { slices =>
      val t = s"sc$slices"
      stage(t, slices)
      var scopedFiles = 0L
      val tScoped = time {
        scopedFiles = spark.sql(s"CALL gss.system.compact('db.$t', " +
          s"where => 'k < $sliceWidth')").head().getLong(0)
      }
      val tFull = time {
        spark.sql(s"CALL gss.system.compact('db.$t')").collect()
      }
      (slices, tScoped, tFull, scopedFiles)
    }
    val json = results.map { case (s, ts, tf, n) =>
      s"""{"slices":$s,"scoped_sec":${math.round(ts * 100) / 100.0},""" +
        s""""full_sec":${math.round(tf * 100) / 100.0},"scoped_files":$n}"""
    }.mkString("[", ",", "]")
    println(s"""{"probe":"scoped_compact_scale","rows_per_slice":$rowsPerSlice,"runs":$json}""")
    spark.stop()
  }
}
