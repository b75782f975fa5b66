package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for REPLACE WHERE (`df.writeTo(t).overwrite(cond)`): the
  * 100 TB claim is that replacing one slice costs that slice — discovery
  * is stats-skipped, non-matching files are re-listed never read, and the
  * rewrite touches only the files holding matching rows. So as the table
  * grows by adding MORE slices, replacing one fixed slice should stay
  * ~flat while a whole-table rewrite (AlwaysTrue overwrite) grows with
  * the table.
  *
  * Setup: S slices of R rows each, every slice inserted as its own file
  * set with a disjoint `k` range; measure `overwrite(k in slice-0 range)`
  * with a fresh slice-0 batch, and a full `overwrite(lit(true))`, at
  * S = 4, 16, 64. Prints one JSON line with both time series.
  *
  * Usage: `sbt "runMain graft.tools.ReplaceWhereScale"`. */
object ReplaceWhereScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("replace-where-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.core.TempDirs.create("graft_rwscale_")
    graft.catalog.GraftCatalog.register(spark, "grw", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS grw.db")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    val rowsPerSlice = 200000L
    val sliceWidth = 1000000L
    def stage(table: String, slices: Int): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS grw.db.$table")
      spark.sql(s"CREATE TABLE grw.db.$table (k BIGINT, h STRING) USING manifest")
      (0 until slices).foreach { sl =>
        val lo = sl * sliceWidth
        spark.sql(s"INSERT INTO grw.db.$table SELECT id, " +
          s"sha2(CAST(id AS STRING), 256) FROM range($lo, ${lo + rowsPerSlice})")
      }
    }

    def freshSlice0() = spark.range(0, rowsPerSlice)
      .select(col("id").as("k"), sha2(concat(lit("r"), col("id").cast("string")), 256).as("h"))

    val results = Seq(4, 16, 64).map { slices =>
      val t = s"rw$slices"
      stage(t, slices)
      // replace ONE fixed slice: discovery skips every other slice's
      // files on stats, the rewrite stages ~1 slice of survivors+batch
      val tScoped = time {
        freshSlice0().writeTo(s"grw.db.$t")
          .overwrite(col("k") >= 0L && col("k") < sliceWidth)
      }
      val n = spark.table(s"grw.db.$t").count()
      require(n == slices * rowsPerSlice,
        s"row count drifted after scoped replace: $n")
      // the contrast: a whole-table overwrite rewrites everything
      // (the staging copy builds OUTSIDE the timed block — only the
      // snapshot overwrite itself is measured)
      spark.table(s"grw.db.$t").writeTo(s"grw.db.${t}_copy").create()
      val tFull = time {
        spark.table(s"grw.db.${t}_copy").writeTo(s"grw.db.$t").overwrite(lit(true))
      }
      (slices, tScoped, tFull)
    }

    val json = results.map { case (s, ts, tf) =>
      f"""{"slices":$s,"scoped_sec":$ts%.2f,"full_sec":$tf%.2f}"""
    }.mkString("[", ",", "]")
    // scoped must stay ~flat from 4 to 64 slices; full grows with the table
    println(s"""{"probe":"replace_where_scale","runs":$json}""")
    spark.stop()
  }
}
