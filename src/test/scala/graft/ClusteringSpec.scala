package graft

import java.nio.file.Files

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data clustering for scan efficiency: sorting on the filter column at
  * write time gives every parquet row group a narrow min/max range, so the
  * reader's predicate pushdown skips whole row groups — the single biggest
  * bytes-read lever at 100 TB after partition pruning (it is what
  * OPTIMIZE ... ZORDER approximates for one dimension). The spec MEASURES
  * the effect via the scan's numOutputRows metric: the same selective
  * filter over the same rows must emit far fewer rows from a clustered
  * scan than from a randomly-ordered one (rows in surviving row groups),
  * not just post-filter equally. */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // write timestamps as INT64 micros: the INT96 legacy default carries
    // stats Spark's reader will not use for row-group pruning
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  /** Rows the (single) file scan emitted after row-group pruning. */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics populate
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$executed")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sort-clustered write lets predicate pushdown skip row groups") {
    // cluster on a DATE column: the source's TIMESTAMP_NTZ type reaches the
    // plan's PushedFilters list but parquet predicate creation bails on NTZ,
    // so no row group is ever skipped (observed); INT32 dates push cleanly
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_date"),
        col("l_quantity"), col("l_extendedprice"))
    val total = base.count()

    // small row groups so the file holds many (default 128 MiB would give
    // one group at this SF and nothing could be skipped)
    val clusteredDir = Files.createTempDirectory("graft_clustered_").toString
    base.sort("ship_date").coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(clusteredDir)
    val shuffledDir = Files.createTempDirectory("graft_shuffled_").toString
    // clustering destroyed: order by a hash of the key
    base.sort(xxhash64(col("l_orderkey"), col("ship_date"))).coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(shuffledDir)

    // typed literals: comparing against bare strings would wrap the COLUMN
    // in a cast and disable pushdown
    def monthScan(dir: String) = spark.read.parquet(dir)
      .filter(col("ship_date").between(
        lit(java.sql.Date.valueOf("1995-02-01")),
        lit(java.sql.Date.valueOf("1995-02-28"))))
    val clusteredRows = scanOutputRows(monthScan(clusteredDir))
    val shuffledRows = scanOutputRows(monthScan(shuffledDir))
    val matching = monthScan(clusteredDir).count()
    assert(matching === monthScan(shuffledDir).count()) // same query result

    // unclustered: every row group spans the full date range -> nothing
    // skipped, the scan emits (about) every row
    assert(shuffledRows > total / 2,
      s"expected ~no pruning on shuffled layout: $shuffledRows of $total")
    // clustered: only row groups overlapping the month survive
    assert(clusteredRows < total / 10,
      s"expected >90% of rows pruned on clustered layout: $clusteredRows of $total")
    assert(clusteredRows >= matching)
  }

  test("zorder2 interleaves bits correctly and preserves locality") {
    import graft.functions.ZOrder.zorder2
    import spark.implicits._
    val rows = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 1L),
        (0x7fffffffL, 0L), (0x7fffffffL, 0x7fffffffL))
      .toDF("a", "b")
      .select(zorder2(col("a"), col("b")).as("z")).as[Long].collect()
    // a -> even bits, b -> odd bits
    assert(rows(0) === 0L)
    assert(rows(1) === 1L)              // a=0b1          -> bit 0
    assert(rows(2) === 2L)              // b=0b1          -> bit 1
    assert(rows(3) === 0b111L)          // a=0b11, b=0b1  -> bits 0,2 + 1
    assert(rows(4) === 0x1555555555555555L) // all 31 a-bits -> even positions
    // the z-address NEVER sets the sign bit: max domain fills bits 0..61,
    // so a plain ascending sort walks the z-curve
    assert(rows(5) === 0x3fffffffffffffffL && rows.forall(_ >= 0L))
  }

  test("z-order clustering prunes row groups on BOTH dimensions") {
    // linear sort answers only its leading column; the interleaved key
    // gives every row group a narrow box in (date, partkey) space
    import graft.functions.ZOrder.zorder2
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01")).as("ship_day"))
    val total = base.count()

    def write(df: org.apache.spark.sql.DataFrame, sortCol: org.apache.spark.sql.Column) = {
      val dir = Files.createTempDirectory("graft_zorder_").toString
      df.sort(sortCol).coalesce(1)
        .write.option("parquet.block.size", 64 * 1024)
        .mode("overwrite").parquet(dir)
      dir
    }
    val linearDir = write(base, col("ship_day"))
    val zorderDir = write(base, zorder2(col("ship_day"), col("l_partkey")))

    def dayScan(dir: String) = spark.read.parquet(dir)
      .filter(col("ship_day").between(1100, 1130)) // ~one month
    def partScan(dir: String) = spark.read.parquet(dir)
      .filter(col("l_partkey").between(100, 160))
    // same answers from both layouts
    assert(dayScan(linearDir).count() === dayScan(zorderDir).count())
    assert(partScan(linearDir).count() === partScan(zorderDir).count())

    // leading-column filter: both layouts prune (z-order somewhat coarser)
    assert(scanOutputRows(dayScan(linearDir)) < total / 10)
    assert(scanOutputRows(dayScan(zorderDir)) < total / 2,
      "z-order lost all locality on dimension 1")
    // second-dimension filter: linear layout reads ~everything, z-order
    // skips the row groups whose partkey box misses the range
    val linearPart = scanOutputRows(partScan(linearDir))
    val zorderPart = scanOutputRows(partScan(zorderDir))
    assert(linearPart > total / 2,
      s"expected ~no pruning on linear layout's 2nd dim: $linearPart of $total")
    assert(zorderPart < linearPart / 2,
      s"z-order pruned only $linearPart -> $zorderPart of $total")
  }

  test("zorderKey: domain scaling, nulls to bucket 0, degenerate dims, type errors") {
    import graft.functions.ZOrder
    import spark.implicits._
    // two decorrelated dims on wildly different scales: the scaled key
    // must order identically to interleaving the raw grid positions
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (java.lang.Long.valueOf(0L), java.lang.Double.valueOf(0.0)),
      (java.lang.Long.valueOf(1000000L), java.lang.Double.valueOf(0.0)),
      (java.lang.Long.valueOf(0L), java.lang.Double.valueOf(0.001)),
      (java.lang.Long.valueOf(1000000L), java.lang.Double.valueOf(0.001)),
      (java.lang.Long.valueOf(500000L), java.lang.Double.valueOf(0.0005)),
      (null, java.lang.Double.valueOf(0.001)))
      .toDF("big", "small")
    val keyed = df.select(col("big"), col("small"),
        ZOrder.zorderKey(df, Seq("big", "small")).as("z"))
      .collect().map(r => ((Option(r.get(0)), r.getDouble(1)), r.getLong(2))).toMap
    // corners: (min,min) -> 0; null scales like min
    assert(keyed((Some(0L), 0.0)) === 0L)
    assert(keyed((None, 0.001)) === keyed((Some(0L), 0.001)))
    // max bucket is clamped inside the dilation domain, sign never set
    assert(keyed.values.forall(_ >= 0L))
    // ordering: the center point z-sorts strictly between the corners
    assert(keyed((Some(0L), 0.0)) < keyed((Some(500000L), 0.0005)))
    assert(keyed((Some(500000L), 0.0005)) < keyed((Some(1000000L), 0.001)))
    // a CONSTANT dimension collapses to 0: key = linear in the other
    val const = Seq((1L, 7L), (2L, 7L), (3L, 7L)).toDF("a", "c")
    val ks = const.select(ZOrder.zorderKey(const, Seq("a", "c")).as("z"))
      .as[Long].collect()
    assert(ks.sorted.toSeq === ks.toSeq && ks.distinct.length === 3)
    // non-orderable column refuses loudly; arity is exactly 2
    val bad = Seq((1L, Seq("x"))).toDF("a", "s")
    val e = intercept[IllegalArgumentException](ZOrder.zorderKey(bad, Seq("a", "s")))
    assert(e.getMessage.contains("must be numeric"))
    intercept[IllegalArgumentException](ZOrder.zorderKey(bad, Seq("a")))
  }

  test("zorderKey string dimensions: prefix rank preserves order; string filter prunes") {
    import graft.functions.ZOrder
    import spark.implicits._
    // the truncated-prefix encoding must order like Spark's binary string
    // collation, including the "ab" < "b" case padding exists for, and
    // strings past the 6-byte prefix share a bucket (graceful degradation)
    val strs = Seq("", "a", "ab", "abc", "b", "ba", "prefix-same-1",
      "prefix-same-2", "z", null)
    val sdf = strs.map(s => (s, 0L)).toDF("s", "i")
    // constant second dim (collapses to 0) -> key is linear in the
    // scaled string dim, so full-key comparisons read the string rank
    val keyOf = sdf.select(col("s"),
        ZOrder.zorderKey(sdf, Seq("s", "i")).as("z"))
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    val nonNull = strs.filter(_ != null).sorted
    nonNull.sliding(2).foreach {
      case Seq(lo, hi) =>
        assert(keyOf(Some(lo)) <= keyOf(Some(hi)),
          s"prefix rank broke order: '$lo' vs '$hi'")
      case _ => ()
    }
    assert(keyOf(Some("ab")) < keyOf(Some("b")), "right-padding contract")
    assert(keyOf(Some("prefix-same-1")) === keyOf(Some("prefix-same-2")),
      "identical 6-byte prefixes share a bucket")
    assert(keyOf(None) === keyOf(Some("")), "null scales to bucket 0 like the min")

    // measured pruning: z-order on (s STRING, n) — a string-range filter
    // skips row groups an n-linear sort reads in full
    val base = spark.range(20000).select(
      concat(chr(lit(65) + pmod(col("id") * 7, lit(26))),
        lit("-suffix-"), pmod(col("id"), lit(50)).cast("string")).as("s"),
      pmod(col("id") * 13, lit(1000)).as("n"))
    val total = base.count()
    def write(sortCol: org.apache.spark.sql.Column) = {
      val dir = Files.createTempDirectory("graft_zorder_str_").toString
      base.sort(sortCol).coalesce(1)
        .write.option("parquet.block.size", 16 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .mode("overwrite").parquet(dir)
      dir
    }
    val linearDir = write(col("n"))
    val zDir = write(ZOrder.zorderKey(base, Seq("s", "n")))
    def strScan(dir: String) = spark.read.parquet(dir)
      .filter(col("s").startsWith("E"))
    assert(strScan(linearDir).count() === strScan(zDir).count())
    val (linStr, zStr) = (scanOutputRows(strScan(linearDir)),
      scanOutputRows(strScan(zDir)))
    assert(linStr > total / 2 && zStr < linStr / 2,
      s"string-dim pruning: linear read $linStr, z-order read $zStr of $total")
    // and the numeric dim still prunes on the same layout
    def nScan(dir: String) = spark.read.parquet(dir)
      .filter(col("n") < 60)
    assert(nScan(linearDir).count() === nScan(zDir).count())
    assert(scanOutputRows(nScan(zDir)) < total / 2,
      "numeric dim lost locality under a string co-dimension")
  }

  test("zorder3/zorder4 interleave bits correctly and never set the sign bit") {
    import graft.functions.ZOrder.{zorder3, zorder4}
    import spark.implicits._
    val r3 = Seq((0L, 0L, 0L), (1L, 0L, 0L), (0L, 1L, 0L), (0L, 0L, 1L),
        (3L, 0L, 0L), (0x1fffffL, 0L, 0L), (0x1fffffL, 0x1fffffL, 0x1fffffL))
      .toDF("a", "b", "c")
      .select(zorder3(col("a"), col("b"), col("c")).as("z")).as[Long].collect()
    assert(r3(0) === 0L)
    assert(r3(1) === 1L)      // a bit 0 -> position 0
    assert(r3(2) === 2L)      // b bit 0 -> position 1
    assert(r3(3) === 4L)      // c bit 0 -> position 2
    assert(r3(4) === 0b1001L) // a=0b11 -> positions 0, 3
    assert(r3(5) === 0x1249249249249249L) // all 21 a-bits -> stride-3 comb
    // full 3-D domain fills bits 0..62 exactly: Long.MaxValue, sign clear
    assert(r3(6) === Long.MaxValue && r3.forall(_ >= 0L))

    val r4 = Seq((0L, 0L, 0L, 0L), (1L, 0L, 0L, 0L), (0L, 1L, 0L, 0L),
        (0L, 0L, 1L, 0L), (0L, 0L, 0L, 1L), (3L, 0L, 0L, 0L),
        (0x7fffL, 0L, 0L, 0L), (0x7fffL, 0x7fffL, 0x7fffL, 0x7fffL))
      .toDF("a", "b", "c", "d")
      .select(zorder4(col("a"), col("b"), col("c"), col("d")).as("z"))
      .as[Long].collect()
    assert(r4(0) === 0L)
    assert(r4(1) === 1L && r4(2) === 2L && r4(3) === 4L && r4(4) === 8L)
    assert(r4(5) === 0b10001L) // a=0b11 -> positions 0, 4
    assert(r4(6) === 0x0111111111111111L) // all 15 a-bits -> stride-4 comb
    assert(r4(7) === 0x0fffffffffffffffL && r4.forall(_ >= 0L))
  }

  test("3-D z-order clustering prunes row groups on ALL THREE dimensions") {
    // the N-dim generalization of the 2-D layout contract: with three
    // interleaved dimensions every row group gets a narrow box in ALL of
    // them, so a selective filter on any single dimension skips groups a
    // linear sort could only skip for its leading column
    import graft.functions.ZOrder
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        datediff(to_date(col("l_shipdate")), lit("1992-01-01")).as("ship_day"))
    val total = base.count()

    // 3 dims share the interleave's bit budget, so per-dim discrimination
    // needs more row groups than the 2-D test: 16 KB groups give ~40 of
    // them (~1.8 bits/dim) — at real scale the group count is the file
    // count, thousands, and per-dim boxes are far narrower
    def write(df: org.apache.spark.sql.DataFrame, sortCol: org.apache.spark.sql.Column) = {
      val dir = Files.createTempDirectory("graft_zorder3_").toString
      df.sort(sortCol).coalesce(1)
        .write.option("parquet.block.size", 16 * 1024)
        .option("parquet.page.size", 8 * 1024)
        .mode("overwrite").parquet(dir)
      dir
    }
    val linearDir = write(base, col("ship_day"))
    val zDir = write(base,
      ZOrder.zorderKey(base, Seq("ship_day", "l_partkey", "l_suppkey")))

    def dayScan(dir: String) = spark.read.parquet(dir)
      .filter(col("ship_day").between(1100, 1130))
    def partScan(dir: String) = spark.read.parquet(dir)
      .filter(col("l_partkey").between(100, 160))
    def suppScan(dir: String) = spark.read.parquet(dir)
      .filter(col("l_suppkey").between(10, 13))
    // same answers from both layouts
    assert(dayScan(linearDir).count() === dayScan(zDir).count())
    assert(partScan(linearDir).count() === partScan(zDir).count())
    assert(suppScan(linearDir).count() === suppScan(zDir).count())
    // every dimension prunes on the 3-D layout (coarser per-dim than 2-D
    // — 3 dims share the same bit budget — but real on all three at once)
    assert(scanOutputRows(dayScan(zDir)) < total / 2,
      "3-D z-order lost locality on dimension 1")
    val (linPart, zPart) = (scanOutputRows(partScan(linearDir)),
      scanOutputRows(partScan(zDir)))
    assert(linPart > total / 2 && zPart < linPart / 2,
      s"dim-2 pruning: linear read $linPart, z-order read $zPart of $total")
    val (linSupp, zSupp) = (scanOutputRows(suppScan(linearDir)),
      scanOutputRows(suppScan(zDir)))
    assert(linSupp > total / 2 && zSupp < linSupp / 2,
      s"dim-3 pruning: linear read $linSupp, z-order read $zSupp of $total")
  }

  test("clustered compaction = OPTIMIZE: fewer files AND prunable layout") {
    import graft.core.LakeCompaction
    // simulate the small-file storm: many tiny unclustered files
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_date"))
    val total = base.count()
    def freshStorm(): String = {
      val dir = Files.createTempDirectory("graft_storm_").toString
      base.repartition(64).write.mode("overwrite").parquet(dir)
      dir
    }

    val plainDir = freshStorm()
    val (beforeP, afterP) = LakeCompaction.compactParquet(
      spark, plainDir, targetFileBytes = 64 * 1024)
    val clusteredDir = freshStorm()
    val (_, afterC) = LakeCompaction.compactParquet(
      spark, clusteredDir, targetFileBytes = 64 * 1024,
      clusterBy = Seq("ship_date"))
    assert(beforeP > afterP, s"compaction did not shrink files: $beforeP -> $afterP")

    def monthScan(dir: String) = spark.read.parquet(dir)
      .filter(col("ship_date").between(
        lit(java.sql.Date.valueOf("1995-02-01")),
        lit(java.sql.Date.valueOf("1995-02-28"))))
    assert(monthScan(plainDir).count() === monthScan(clusteredDir).count())
    val plainRows = scanOutputRows(monthScan(plainDir))
    val clusteredRows = scanOutputRows(monthScan(clusteredDir))
    // plain coalesce keeps every output file spanning the full date range;
    // cluster-by gives each file a narrow range -> the scan skips most rows
    assert(afterC > 1, s"need multiple output files to show pruning: $afterC")
    assert(plainRows > total / 2, s"unexpected pruning on plain compaction: $plainRows")
    assert(clusteredRows < total / 4,
      s"clustered compaction did not enable pruning: $clusteredRows of $total")
  }
}
