package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for the commit-time NDV sketch overhead: a table declaring
  * `graft.ndv.columns` pays one extra grouped aggregation over the
  * just-written DELTA per commit ([[graft.core.NdvStats.collectSketches]]).
  * The claim to verify is that this stays O(delta) and a modest fraction
  * of the write itself — an INSERT's wall time with sketching should sit
  * within ~1.3× of the same INSERT without, at 10× apart delta sizes
  * (overhead proportional to the delta, not the table).
  *
  * Times INSERTs of 200k and 2M rows (two sketch columns: one bigint, one
  * string) into fresh ndv-declared vs plain tables, plus the serve-side
  * planning cost (sketch union at scan build). Prints one JSON line.
  * Usage: `sbt "runMain graft.tools.NdvScale"`. */
object NdvScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("ndv-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.core.TempDirs.create("graft_ndvscale_")
    graft.catalog.GraftCatalog.register(spark, "gns", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gns.db")

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def insertTime(table: String, ndv: Boolean, rows: Long): Double = {
      val props = if (ndv)
        s" TBLPROPERTIES ('${graft.catalog.GraftCatalog.NdvColsProp}'='k,h')"
      else ""
      spark.sql(s"DROP TABLE IF EXISTS gns.db.$table")
      spark.sql(s"CREATE TABLE gns.db.$table (k BIGINT, h STRING, pad STRING) " +
        "USING manifest" + props)
      time {
        spark.sql(s"INSERT INTO gns.db.$table SELECT id % 99991, " +
          s"sha2(CAST(id AS STRING), 256), repeat('x', 32) FROM range($rows)")
      }
    }

    // warmup (JIT + codegen), unrecorded
    insertTime("warm", ndv = true, 50000L)

    val out = Seq(200000L, 2000000L).flatMap { n =>
      val plain = insertTime(s"plain_$n", ndv = false, n)
      val sketched = insertTime(s"ndv_$n", ndv = true, n)
      // serve-side: scan-build merges the planned files' sketches
      val planSec = time {
        spark.table(s"gns.db.ndv_$n").queryExecution.optimizedPlan.stats
      }
      Seq(
        s""""insert_plain_$n":$plain""",
        s""""insert_ndv_$n":$sketched""",
        s""""overhead_ratio_$n":${sketched / plain}""",
        s""""plan_with_ndv_sec_$n":$planSec""")
    }
    println(s"""{"metric":"ndv_scale",${out.mkString(",")}}""")
    spark.stop()
  }
}
