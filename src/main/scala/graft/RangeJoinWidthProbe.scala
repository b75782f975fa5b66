package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale-study probe for the range-join bucket width: times q24's core
  * join (signups x purchases within 600 s) on one events table at given
  * bucket widths. Usage:
  * {{{ runMain graft.RangeJoinWidthProbe <sfDir> [auto|<seconds> ...] }}}
  * (default: auto 600 — the auto-sized width vs the legacy fixed width).
  * One warmup run, then best-of-3, full materialization via toRdd.count —
  * the Bench measurement convention. Scratch tooling for the STATE.md
  * scaling study, not part of the library surface.
  */
object RangeJoinWidthProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val widths: Seq[Option[Long]] =
      if (args.length <= 1) Seq(None, Some(600L))
      else args.drop(1).toSeq.map { case "auto" => None; case s => Some(s.toLong) }
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val ev = graft.core.Tables.events(spark, sfDir)
    ev.cache().count()
    val signups = ev.filter(col("event_type") === "signup")
      .select(col("event_id").as("l_event_id"), col("ts").as("l_ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("r_event_id"), col("ts").as("r_ts"))
    val autoW = graft.operators.RangeJoin.autoBucketSeconds(purchases, "r_ts", 600L)
    println(s"[probe] dir=$sfDir autoWidth=$autoW")

    widths.foreach { w =>
      def join = graft.operators.RangeJoin.timeWindowJoin(
        signups, purchases, "l_ts", "r_ts", 600L, bucketSeconds = w)
      val rows = join.queryExecution.toRdd.count() // warmup + row count
      val best = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        join.queryExecution.toRdd.count()
        (System.nanoTime() - t0) / 1e9
      }.min
      println(f"[probe] dir=$sfDir width=${w.map(_.toString).getOrElse("auto")}%s " +
        f"rows=$rows%d best=$best%.3f s")
    }
    spark.stop()
  }
}
