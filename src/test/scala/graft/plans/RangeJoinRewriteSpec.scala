package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The optimizer rewrite must (a) keep results identical to the naive theta
  * join on arbitrary data — including empty and null intervals — and
  * (b) actually remove the nested-loop join from the physical plan. */
class RangeJoinRewriteSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  private def withRule[T](binSize: Long)(f: => T): T = {
    RangeJoinRewrite.install(spark, binSize)
    try f
    finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[RangeJoinRewrite])
  }

  private val rnd = new scala.util.Random(11)
  private val points = (1 to 500).map(i => (i.toLong, rnd.nextLong() % 10000L)).toDF("p_id", "p")
  private val intervals = (1 to 200).map { i =>
    val lo = rnd.nextLong() % 10000L
    // mix of regular, empty (hi <= lo) and degenerate intervals
    val hi = lo + (rnd.nextInt(400) - 100)
    (i.toLong, lo, hi)
  }.toDF("w_id", "lo", "hi")

  test("rewrite == naive theta join, incl. empty intervals and both orders") {
    points.createOrReplaceTempView("pts")
    intervals.createOrReplaceTempView("wins")
    val q =
      """SELECT p_id, w_id FROM pts JOIN wins ON p >= lo AND p < hi"""
    val qFlipped = // point side on the right, bounds written mirrored
      """SELECT p_id, w_id FROM wins JOIN pts ON lo <= p AND hi > p"""
    val naive = spark.sql(q).as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    withRule(binSize = 137) {
      assert(spark.sql(q).as[(Long, Long)].collect().toSet === naive)
      assert(spark.sql(qFlipped).as[(Long, Long)].collect().toSet === naive)
    }
  }

  test("null points and null bounds match nothing, same as naive") {
    val p = Seq((1L, Some(5L)), (2L, None)).toDF("p_id", "p")
    val w = Seq((10L, Some(0L), Some(10L)), (11L, None, Some(10L)),
      (12L, Some(0L), None)).toDF("w_id", "lo", "hi")
    val cond = col("p") >= col("lo") && col("p") < col("hi")
    val naive = p.join(w, cond).select("p_id", "w_id").as[(Long, Long)].collect().toSet
    val rewritten = withRule(binSize = 4) {
      p.join(w, cond).select("p_id", "w_id").as[(Long, Long)].collect().toSet
    }
    assert(rewritten === naive)
    assert(naive === Set((1L, 10L)))
  }

  test("physical plan: nested-loop join replaced by an equi join") {
    val cond = col("p") >= col("lo") && col("p") < col("hi")
    val before = points.join(intervals, cond).queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin") || before.contains("CartesianProduct"))
    withRule(binSize = 137) {
      val after = points.join(intervals, cond).queryExecution.executedPlan.toString
      // bucketed equi join on the hot path; the single remaining nested-loop
      // is the fan-out-guarded fallback branch (filtered to rows whose
      // bucket span exceeds maxFanout — none here)
      assert(after.contains("_graft_bucket"), s"rewrite did not fire:\n$after")
      val nBnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(after).length
      assert(nBnlj <= 1 && !after.contains("CartesianProduct"),
        s"unguarded nested-loop path:\n$after")
    }
  }

  test("property: equivalence holds across random bin sizes") {
    val cond = col("p") >= col("lo") && col("p") < col("hi")
    val naive = points.join(intervals, cond)
      .select("p_id", "w_id").as[(Long, Long)].collect().toSet
    // bin sizes spanning smaller-than-interval, comparable, and much larger
    for (bin <- Seq(1L, 7L, 64L, 100L, 999L, 100000L)) {
      val got = withRule(binSize = bin) {
        points.join(intervals, cond).select("p_id", "w_id")
          .as[(Long, Long)].collect().toSet
      }
      assert(got === naive, s"mismatch at binSize=$bin")
    }
  }

  test("timestamp intervals rewrite too, incl. sub-second points near hi") {
    import java.sql.Timestamp
    val rnd = new scala.util.Random(13)
    val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
    // sub-second jitter specifically exercises the hi-unadjusted stop
    // bucket (a point < hi inside hi's own second must still match)
    val pts = (1 to 300).map(i =>
      (i.toLong, new Timestamp(base + rnd.nextInt(3600_000))))
      .toDF("p_id", "pt")
    val wins = (1 to 120).map { i =>
      val lo = base + rnd.nextInt(3600_000)
      (i.toLong, new Timestamp(lo), new Timestamp(lo + rnd.nextInt(120_000)))
    }.toDF("w_id", "wlo", "whi")
    val cond = col("pt") >= col("wlo") && col("pt") < col("whi")
    val naive = pts.join(wins, cond).select("p_id", "w_id")
      .as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)
    withRule(binSize = 60) {
      val df = pts.join(wins, cond)
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("_graft_bucket"), s"timestamp rewrite did not fire:\n$plan")
      val nBnlj = "BroadcastNestedLoopJoin".r.findAllMatchIn(plan).length
      assert(nBnlj <= 1 && !plan.contains("CartesianProduct"),
        s"unguarded nested-loop path:\n$plan")
      assert(df.select("p_id", "w_id").as[(Long, Long)].collect().toSet === naive)
    }
  }

  test("pathological intervals: giant width and inverted bounds neither fail nor mismatch") {
    // One near-Long-range interval (fan-out would be ~Long.MaxValue/bin
    // buckets — materializing that sequence must NOT be attempted), one
    // severely inverted interval (lo >> hi would be a long descending
    // sequence), plus normal ones. The guard must route the wide row to the
    // theta fallback and drop the inverted row, with results identical to
    // the naive join.
    val p = Seq((1L, 5L), (2L, 500L), (3L, -100000L)).toDF("p_id", "p")
    val w = Seq(
      (10L, Long.MinValue + 10, Long.MaxValue - 10), // giant: matches all
      (11L, 9000000L, -9000000L),                    // inverted: matches none
      (12L, 0L, 10L),                                // normal: matches p=5
      (13L, 400L, 600L)                              // normal: matches p=500
    ).toDF("w_id", "lo", "hi")
    val cond = col("p") >= col("lo") && col("p") < col("hi")
    val naive = p.join(w, cond).select("p_id", "w_id").as[(Long, Long)].collect().toSet
    withRule(binSize = 10) {
      val got = p.join(w, cond).select("p_id", "w_id").as[(Long, Long)].collect().toSet
      assert(got === naive)
      assert(got === Set((1L, 10L), (2L, 10L), (3L, 10L), (1L, 12L), (2L, 13L)))
    }
  }

  test("fallback branch is not re-rewritten by the fixed-point batch") {
    val p = Seq((1L, 5L)).toDF("p_id", "p")
    val w = Seq((10L, Long.MinValue + 10, Long.MaxValue - 10)).toDF("w_id", "lo", "hi")
    val cond = col("p") >= col("lo") && col("p") < col("hi")
    withRule(binSize = 10) {
      val optimized = p.join(w, cond).queryExecution.optimizedPlan
      // exactly one bucketed branch and one fallback: a runaway fixed-point
      // recursion would nest unions / multiply Generate nodes
      val unions = optimized.collect { case u: org.apache.spark.sql.catalyst.plans.logical.Union => u }
      val gens = optimized.collect { case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g }
      assert(unions.size == 1, s"expected 1 Union, plan:\n$optimized")
      assert(gens.size == 1, s"expected 1 Generate, plan:\n$optimized")
    }
  }

  test("sub-second timestamp interval (lo == hi after seconds truncation) still matches") {
    import java.sql.Timestamp
    // interval [12:00:00.200, 12:00:00.800) — truncates to lo_sec == hi_sec;
    // the never-match filter must compare full precision or this pair is lost
    val pts = Seq((1L, Timestamp.valueOf("2024-01-01 12:00:00.5"))).toDF("p_id", "pt")
    val wins = Seq((10L,
      Timestamp.valueOf("2024-01-01 12:00:00.2"),
      Timestamp.valueOf("2024-01-01 12:00:00.8"))).toDF("w_id", "wlo", "whi")
    val cond = col("pt") >= col("wlo") && col("pt") < col("whi")
    withRule(binSize = 60) {
      val got = pts.join(wins, cond).select("p_id", "w_id").as[(Long, Long)].collect().toSet
      assert(got === Set((1L, 10L)))
    }
  }

  test("AutoBin: bucket width derives from ANALYZE'd column stats, result unchanged") {
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.sql("DROP TABLE IF EXISTS rjr_cbo_pts")
      val loc = java.nio.file.Files.createTempDirectory("graft_rjr_cbo_").toString
      points.write.format("parquet").option("path", loc).saveAsTable("rjr_cbo_pts")
      spark.sql("ANALYZE TABLE rjr_cbo_pts COMPUTE STATISTICS FOR ALL COLUMNS")
      val tbl = spark.table("rjr_cbo_pts")
      val optimized = tbl.queryExecution.optimizedPlan
      val attr = optimized.output.find(_.name == "p").get
      // expected: bin = TargetRowsPerBucket / (rowCount / span)
      val stats = optimized.stats
      val cs = stats.attributeStats(attr)
      val span = (cs.max.get.asInstanceOf[Long] - cs.min.get.asInstanceOf[Long]).toDouble
      val expected = math.max(1L,
        (RangeJoinRewrite.TargetRowsPerBucket * span / stats.rowCount.get.toDouble).round)
      val rule = RangeJoinRewrite(RangeJoinRewrite.AutoBin)
      assert(rule.effectiveBinSize(attr, optimized) === expected)
      assert(expected !== RangeJoinRewrite.DefaultBinSize,
        "fixture must make the derived width distinguishable from the fallback")
      // end-to-end: the auto-sized rewrite fires and matches the naive join
      intervals.createOrReplaceTempView("rjr_cbo_wins")
      val q = "SELECT p_id, w_id FROM rjr_cbo_pts JOIN rjr_cbo_wins ON p >= lo AND p < hi"
      val naive = spark.sql(q).as[(Long, Long)].collect().toSet
      assert(naive.nonEmpty)
      withRule(binSize = RangeJoinRewrite.AutoBin) {
        val df = spark.sql(q)
        val plan = df.queryExecution.executedPlan.toString
        assert(plan.contains("_graft_bucket"), s"auto rewrite did not fire:\n$plan")
        assert(df.as[(Long, Long)].collect().toSet === naive)
      }
      spark.sql("DROP TABLE rjr_cbo_pts")
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None    => spark.conf.unset("spark.sql.cbo.enabled")
    }
  }

  test("AutoBin without usable stats falls back to the default width, still correct") {
    val cond = col("p") >= col("lo") && col("p") < col("hi")
    val naive = points.join(intervals, cond)
      .select("p_id", "w_id").as[(Long, Long)].collect().toSet
    // a LocalRelation has a row count but no column stats -> fallback
    val rule = RangeJoinRewrite(RangeJoinRewrite.AutoBin)
    val pPlan = points.queryExecution.optimizedPlan
    val pAttr = pPlan.output.find(_.name == "p").get
    assert(rule.effectiveBinSize(pAttr, pPlan) === RangeJoinRewrite.DefaultBinSize)
    withRule(binSize = RangeJoinRewrite.AutoBin) {
      val df = points.join(intervals, cond).select("p_id", "w_id")
      assert(df.queryExecution.executedPlan.toString.contains("_graft_bucket"))
      assert(df.as[(Long, Long)].collect().toSet === naive)
    }
  }

  test("joins with an existing equi key are left untouched") {
    val a = Seq((1L, 2L)).toDF("k", "v")
    val b = Seq((1L, 0L, 5L)).toDF("k2", "lo", "hi")
    withRule(binSize = 10) {
      val plan = a.join(b, col("k") === col("k2") && col("v") >= col("lo") &&
        col("v") < col("hi")).queryExecution.optimizedPlan.toString
      assert(!plan.contains("_graft_bucket"))
    }
  }
}
