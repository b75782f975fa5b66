package graft.core

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Commit-time per-file histograms and their serve-time equi-height
  * merge: exact grid collection (NaN/null/constant edges), marker JSON
  * round trip, and the re-binning math (mass-balanced monotone edges,
  * skew visible in the cuts). */
class HistStatsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  test("collectHists: exact equi-width counts; NaN excluded; all-null and constant files") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_hist_").toString
    // file a: k uniform 0..15 (one per bucket), d has a NaN pollution
    (0 until 16).map(i => (i.toLong, if (i == 3) Double.NaN else i.toDouble, "x"))
      .toDF("k", "d", "s").coalesce(1).write.parquet(s"$dir/fa")
    // file b: k constant 7, d all null
    Seq((7L, Option.empty[Double], "y"), (7L, Option.empty[Double], "z"))
      .toDF("k", "d", "s").coalesce(1).write.parquet(s"$dir/fb")
    def one(sub: String): String = {
      val f = new java.io.File(s"$dir/$sub").listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      s"$sub/${f.getName}"
    }
    val files = Seq(one("fa"), one("fb"))
    // the production path: one fused sketch+bounds pass, then the counts
    val (_, bounds) =
      NdvStats.collectSketchesAndBounds(spark, dir, files, Seq("k", "d", "s"))
    val hists = HistStats.collectHists(spark, dir, files, Seq("k", "d", "s"), bounds)
    assert(hists.keySet === files.toSet)
    val fa = hists(files.head)
    // strings are ineligible
    assert(!fa.contains("s"))
    // k in fa: 16 values over [0,15] -> one per bucket
    assert(fa("k") === FileStats.Hist(0.0, 15.0, Vector.fill(16)(1L)))
    // d in fa: NaN at i=3 is EXCLUDED — 15 values over [0,15]
    assert(fa("d").total === 15L)
    assert(fa("d").lo === 0.0 && fa("d").hi === 15.0)
    val fb = hists(files(1))
    // constant column: single-bucket point mass
    assert(fb("k") === FileStats.Hist(7.0, 7.0, Vector(2L)))
    // all-null column: empty grid (zero non-null values)
    assert(fb("d") === FileStats.Hist(0.0, 0.0, Vector.empty))
  }

  test("collectHists grids date/timestamp on catalyst's number line (days / micros)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_hist_dt_").toString
    // 4 consecutive days, 4 timestamps one second apart
    (0 until 4).map(i => (java.sql.Date.valueOf(java.time.LocalDate.of(2024, 1, 1 + i)),
        java.sql.Timestamp.from(java.time.Instant.parse("2024-01-01T00:00:00Z")
          .plusSeconds(i))))
      .toDF("d", "ts").coalesce(1).write.parquet(s"$dir/fa")
    val f = new java.io.File(s"$dir/fa").listFiles()
      .filter(_.getName.endsWith(".parquet")).head
    val files = Seq(s"fa/${f.getName}")
    val (sketches, bounds) =
      NdvStats.collectSketchesAndBounds(spark, dir, files, Seq("d", "ts"))
    // both columns sketch (distinct days/micros = distinct values)
    assert(sketches(files.head).keySet === Set("d", "ts"))
    val hists = HistStats.collectHists(spark, dir, files, Seq("d", "ts"), bounds)
    val day0 = java.time.LocalDate.of(2024, 1, 1).toEpochDay.toDouble
    val hd = hists(files.head)("d")
    assert(hd.lo === day0 && hd.hi === day0 + 3 && hd.total === 4L,
      s"date grid must be in epoch days: $hd")
    val us0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli * 1000.0
    val ht = hists(files.head)("ts")
    assert(ht.lo === us0 && ht.hi === us0 + 3e6 && ht.total === 4L,
      s"timestamp grid must be in epoch micros: $ht")
  }

  test("marker JSON round-trips the histogram next to sketch and bounds") {
    val st = FileStats.Stats(10L, Map(
      "k" -> FileStats.ColStats(
        Some(FileStats.LongVal(1)), Some(FileStats.LongVal(9)), Some(0L),
        ndvSketch = None,
        hist = Some(FileStats.Hist(1.0, 9.0, Vector(4L, 0L, 6L))))),
      Some(123L))
    val back = FileStats.parse(FileStats.render(st))
    assert(back.contains(st))
    // a legacy marker without "hg" still parses (hist absent)
    val legacy = FileStats.parse("""{"rc":5,"c":{"k":{"mn":1,"mx":2,"nc":0}}}""")
    assert(legacy.exists(_.col("k").exists(_.hist.isEmpty)))
  }

  test("mergedEquiHeight: mass-balanced cuts reflect skew; constant and empty edges") {
    // 90 rows uniform in [0,10) + 10 rows uniform in [90,100]: the merged
    // equi-height cuts must crowd into the dense low region
    val dense = FileStats.Hist(0.0, 10.0, Vector.fill(16)(0L).updated(0, 90L))
    // single bucket carrying all 90 rows spans [0, 0.625) of [0,10] — use
    // a uniform grid instead so the segment math is exercised
    val denseU = FileStats.Hist(0.0, 10.0,
      Vector(6L, 6L, 6L, 6L, 6L, 6L, 6L, 6L, 5L, 5L, 5L, 5L, 5L, 5L, 6L, 6L)) // 90
    val sparse = FileStats.Hist(90.0, 100.0, Vector.fill(16)(0L)
      .updated(0, 5L).updated(15, 5L)) // 10
    val Some((height, bins)) =
      HistStats.mergedEquiHeight(Seq(denseU, sparse), bins = 10, ndvTotal = 50)
    assert(math.abs(height - 10.0) < 1e-9) // 100 rows / 10 bins
    assert(bins.head._1 === 0.0 && bins.last._2 === 100.0)
    // edges monotone
    bins.sliding(2).foreach { case Seq(a, b) => assert(a._2 <= b._1 + 1e-9) }
    // 90% of the mass below 10 -> at least 8 of 10 cuts land below 10
    assert(bins.count(_._2 <= 10.0 + 1e-6) >= 8,
      s"cuts ignore the skew: ${bins.map(b => f"${b._1}%.1f..${b._2}%.1f")}")
    // per-bin ndv apportioned by range share, never 0
    assert(bins.forall(_._3 >= 1L))
    val wide = bins.last // spans most of [10,100]
    assert(wide._3 > bins.head._3, "range-share ndv: wide bin must carry more")
    // constant column: point bins with ndv 1
    val Some((h2, b2)) = HistStats.mergedEquiHeight(
      Seq(FileStats.Hist(5.0, 5.0, Vector(40L))), bins = 4, ndvTotal = 1)
    assert(h2 === 10.0 && b2.forall(b => b._1 === 5.0 && b._2 === 5.0 && b._3 === 1L))
    // nothing to serve from empty/zero grids
    assert(HistStats.mergedEquiHeight(
      Seq(FileStats.Hist(0, 0, Vector.empty)), 4, 10).isEmpty)
  }

  test("manifest commits with declared NDV columns carry grids through a staged append") {
    val dir = "file://" + Files.createTempDirectory("graft_histmt_").toString
    import spark.implicits._
    val d1 = (1 to 100).map(i => (i.toLong % 10, s"p$i")).toDF("k", "p")
    ManifestTable.write(d1, dir)
    // write() has no ndv column channel — attach via a staged append
    val d2 = (1 to 50).map(i => (i.toLong % 5, s"q$i")).toDF("k", "p")
    val staged = ManifestTable.stagePool(d2, dir)
    val stats = ManifestTable.collectStats(dir, staged, Seq("k"))
    ManifestTable.commitStagedAppend(dir, staged, stats = Some(stats))
    val st = ManifestTable.state(dir, ManifestTable.currentVersion(dir).get)
    val appended = staged.flatMap(f => st.stats.get(f))
    assert(appended.nonEmpty)
    assert(appended.forall(_.col("k").exists(s =>
      s.hist.isDefined && s.ndvSketch.isDefined)),
      "staged append must carry both sketch and grid for the declared column")
    assert(appended.map(_.col("k").get.hist.get.total).sum === 50L)
  }
}
