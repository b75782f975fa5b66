package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale probe for CHECK-constraint enforcement overhead: the batch path
  * folds the checks into the write projection as lazy raise_error branches
  * ([[graft.catalog.Constraints.guard]]) — no extra pass over the delta —
  * and the DML path evaluates codegen'd predicates per row in the task
  * writers. The claim to verify is that a constrained INSERT's wall time
  * sits within noise of the identical unconstrained INSERT at 2M rows
  * (ratio ≈ 1.0×, NOT the ~2× a validate-then-write pre-pass would cost),
  * and a constrained merge-on-read UPDATE stays within noise too.
  *
  * Prints one JSON line. Usage: `sbt "runMain graft.tools.ConstraintScale"`. */
object ConstraintScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("constraint-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = graft.core.TempDirs.create("graft_ckscale_")
    graft.catalog.GraftCatalog.register(spark, "gcs", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gcs.db")
    val pfx = graft.catalog.Constraints.Prefix

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def insertTime(table: String, checked: Boolean, rows: Long): Double = {
      val props = if (checked)
        s" TBLPROPERTIES ('${pfx}pos'='k >= 0', '${pfx}len'='length(h) = 64')"
      else ""
      spark.sql(s"DROP TABLE IF EXISTS gcs.db.$table")
      spark.sql(s"CREATE TABLE gcs.db.$table (k BIGINT, h STRING, pad STRING) " +
        "USING manifest" + props)
      time {
        spark.sql(s"INSERT INTO gcs.db.$table SELECT id % 99991, " +
          s"sha2(CAST(id AS STRING), 256), repeat('x', 32) FROM range($rows)")
      }
    }

    def updateTime(table: String, checked: Boolean, rows: Long): Double = {
      val props = "'graft.dml.mode'='merge-on-read'" +
        (if (checked) s", '${pfx}pos'='k >= 0'" else "")
      spark.sql(s"DROP TABLE IF EXISTS gcs.db.$table")
      spark.sql(s"CREATE TABLE gcs.db.$table (k BIGINT, h STRING) " +
        s"USING manifest TBLPROPERTIES ($props)")
      spark.sql(s"INSERT INTO gcs.db.$table SELECT id, " +
        s"sha2(CAST(id AS STRING), 256) FROM range($rows)")
      time {
        spark.sql(s"UPDATE gcs.db.$table SET k = k + 1 WHERE k % 10 = 3")
      }
    }

    // warmup (JIT + codegen), unrecorded
    insertTime("warm", checked = true, 50000L)

    def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def run3(f: => Double): Double = med(Seq(f, f, f))

    val insPlain = run3(insertTime("ip", checked = false, 2000000L))
    val insChecked = run3(insertTime("ic", checked = true, 2000000L))
    val updPlain = run3(updateTime("up", checked = false, 1000000L))
    val updChecked = run3(updateTime("uc", checked = true, 1000000L))

    def r(x: Double) = math.rint(x * 1000) / 1000
    println(s"""{"metric":"constraint_scale","insert_plain_sec":${r(insPlain)},""" +
      s""""insert_checked_sec":${r(insChecked)},""" +
      s""""insert_ratio":${r(insChecked / insPlain)},""" +
      s""""update_plain_sec":${r(updPlain)},""" +
      s""""update_checked_sec":${r(updChecked)},""" +
      s""""update_ratio":${r(updChecked / updPlain)}}""")
    spark.stop()
  }
}
