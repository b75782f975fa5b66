package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ManifestTable

/** Streaming into catalog manifest tables: `writeStream.toTable` lands
  * each micro-batch as one committed manifest version (readable mid-flight
  * by batch SQL, time-travelable), epoch replays are exactly-once, and
  * complete mode replaces the snapshot per epoch. */
class CatalogStreamingSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gs", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_catalog_stream_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gs.db")

  private def tableDir(t: String): String = s"$root/db/$t"

  test("writeStream.toTable appends one manifest version per micro-batch") {
    ensureDb()
    import spark.implicits._
    spark.sql("CREATE TABLE gs.db.sink (key STRING, x BIGINT) USING manifest")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val ckpt = Files.createTempDirectory("graft_cstream_ck_").toString
    val q = source.toDF().toDF("key", "x")
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("append").toTable("gs.db.sink")
    try {
      source.addData(("a", 1L), ("b", 2L))
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM gs.db.sink").head().getLong(0) === 2L)
      val vAfterFirst = ManifestTable.currentVersion(tableDir("sink")).get
      source.addData(("c", 3L))
      q.processAllAvailable()
      assert(spark.sql("SELECT sum(x) FROM gs.db.sink").head().getLong(0) === 6L)
      val vAfterSecond = ManifestTable.currentVersion(tableDir("sink")).get
      assert(vAfterSecond === vAfterFirst + 1, "each epoch must commit one version")
      // the pre-batch version stays time-travelable
      assert(spark.sql(
        s"SELECT count(*) FROM gs.db.sink VERSION AS OF $vAfterFirst")
        .head().getLong(0) === 2L)
    } finally q.stop()
  }

  test("two concurrent streaming writers interleave gapless, exact epochs") {
    // the streaming twin of CommitRaceSpec's two batch JVMs: two
    // independent queries (distinct checkpoints, distinct queryIds) race
    // epoch commits into ONE manifest table — the optimistic commit loop
    // must serialize them into gapless versions with both writers' rows
    // exactly once
    ensureDb()
    import spark.implicits._
    spark.sql("CREATE TABLE gs.db.race2 (src STRING, x BIGINT) USING manifest")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val a = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val b = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val qa = a.toDF().selectExpr("'a' AS src", "value AS x")
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_race_a_").toString)
      .outputMode("append").toTable("gs.db.race2")
    val qb = b.toDF().selectExpr("'b' AS src", "value AS x")
      .writeStream.option("checkpointLocation",
        Files.createTempDirectory("graft_race_b_").toString)
      .outputMode("append").toTable("gs.db.race2")
    try {
      // interleave epochs from both writers, letting them race in pairs
      (0 until 3).foreach { i =>
        a.addData(i.toLong); b.addData(100L + i)
        val ta = new Thread(() => qa.processAllAvailable())
        val tb = new Thread(() => qb.processAllAvailable())
        ta.start(); tb.start(); ta.join(120000); tb.join(120000)
      }
      val dir = tableDir("race2")
      val versions = ManifestTable.allVersions(dir)
      assert(versions === (1L to versions.length), s"gapped versions: $versions")
      assert(versions.length === 6, s"6 epoch commits expected: $versions")
      val got = spark.sql("SELECT src, count(*) AS n, sum(x) AS s " +
        "FROM gs.db.race2 GROUP BY src ORDER BY src").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(got === Seq(("a", 3L, 3L), ("b", 3L, 303L)),
        s"both writers' epochs must land exactly once: $got")
    } finally { qa.stop(); qb.stop() }
  }

  test("epoch replay commits exactly once (at-least-once -> exactly-once)") {
    ensureDb()
    import spark.implicits._
    spark.sql("CREATE TABLE gs.db.replay (key STRING, x BIGINT) USING manifest")
    val dir = tableDir("replay")
    val sw = new ManifestStreamingWrite(dir,
      spark.table("gs.db.replay").schema, "qfixed", truncate = false)
    def runEpoch(epoch: Long): Unit = {
      val factory = sw.createStreamingWriterFactory(null)
      val w = factory.createWriter(0, epoch * 100 + 1, epoch)
      Seq(("a", epoch)).foreach { case (k, v) =>
        w.write(org.apache.spark.sql.catalyst.InternalRow(
          org.apache.spark.unsafe.types.UTF8String.fromString(k), v))
      }
      sw.commit(epoch, Array(w.commit()))
    }
    runEpoch(0)
    assert(ManifestTable.currentVersion(dir) === Some(1L))
    // replay of the SAME epoch (failure between sink commit and offset
    // write): pool already referenced -> no new version, no duplicates
    runEpoch(0)
    assert(ManifestTable.currentVersion(dir) === Some(1L))
    assert(spark.sql("SELECT count(*) FROM gs.db.replay").head().getLong(0) === 1L)
    runEpoch(1)
    assert(ManifestTable.currentVersion(dir) === Some(2L))
    assert(spark.sql("SELECT count(*) FROM gs.db.replay").head().getLong(0) === 2L)
  }

  test("streaming into a WAP branch: epochs stage on the branch, exactly-once across restart, publish exact") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.swap (key STRING, x BIGINT) USING manifest")
    spark.sql("INSERT INTO gs.db.swap SELECT 'seed', CAST(0 AS BIGINT)") // main v1
    spark.sql("CALL gs.system.branch('db.swap', 'live')")
    val dir = tableDir("swap")
    val ckpt = Files.createTempDirectory("graft_swap_ck_").toString
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    def run(): Unit = {
      spark.conf.set(GraftCatalog.WapBranchConf, "live")
      try {
        val q = source.toDF()
          .selectExpr("CAST(value AS STRING) AS key", "value AS x")
          .writeStream.option("checkpointLocation", ckpt).toTable("gs.db.swap")
        try q.processAllAvailable() finally q.stop()
      } finally spark.conf.unset(GraftCatalog.WapBranchConf)
    }
    source.addData(1L, 2L)
    run()
    // epochs landed on the branch log only; main still at its seed
    assert(spark.sql("SELECT count(*) FROM gs.db.swap").head().getLong(0) === 1L,
      "stream epochs must stage on the branch, not main")
    assert(spark.sql("SELECT count(*) FROM gs.db.swap VERSION AS OF 'live'")
      .head().getLong(0) === 3L)
    // restart on the same checkpoint: only the new offsets commit
    source.addData(3L)
    run()
    assert(spark.sql("SELECT count(*) FROM gs.db.swap VERSION AS OF 'live'")
      .head().getLong(0) === 4L,
      "restart must deliver only the delta — duplicate epochs on the branch")
    // direct epoch replay against the branch (failure between sink commit
    // and offset write): the pool is already referenced by the BRANCH log,
    // so the replay must skip — exactly-once holds on branch logs too
    val sw = new ManifestStreamingWrite(dir,
      spark.table("gs.db.swap").schema, "qbr", truncate = false,
      Nil, Some("live"))
    def runEpoch(epoch: Long): Unit = {
      val factory = sw.createStreamingWriterFactory(null)
      val w = factory.createWriter(0, epoch * 100 + 1, epoch)
      w.write(org.apache.spark.sql.catalyst.InternalRow(
        org.apache.spark.unsafe.types.UTF8String.fromString("r"), 9L))
      sw.commit(epoch, Array(w.commit()))
    }
    runEpoch(0)
    val headAfter = ManifestTable.branchHead(dir, "live")
    runEpoch(0) // replayed epoch
    assert(ManifestTable.branchHead(dir, "live") === headAfter,
      "epoch replay must not commit a second branch version")
    assert(spark.sql("SELECT count(*) FROM gs.db.swap VERSION AS OF 'live'")
      .head().getLong(0) === 5L)
    // publish: main atomically gains exactly the audited stream output
    spark.sql("CALL gs.system.fast_forward('db.swap', 'live')").collect()
    assert(spark.sql("SELECT count(*) FROM gs.db.swap").head().getLong(0) === 5L)
    assert(spark.sql("SELECT CAST(sum(x) AS BIGINT) FROM gs.db.swap")
      .head().getLong(0) === (0L + 1 + 2 + 3 + 9))
  }

  test("stream epochs into an NDV-declared table keep serving distinct counts") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.ndvs (k BIGINT, v STRING) USING manifest " +
      s"TBLPROPERTIES ('${GraftCatalog.NdvColsProp}'='k')")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Long]
    val q = source.toDF().selectExpr("value % 100 AS k", "CAST(value AS STRING) AS v")
      .writeStream
      .option("checkpointLocation",
        Files.createTempDirectory("graft_ndvs_ck_").toString)
      .toTable("gs.db.ndvs")
    try {
      source.addData(0L until 500L: _*)
      q.processAllAvailable()
      source.addData(500L until 1000L: _*)
      q.processAllAvailable()
    } finally q.stop()
    // both epochs' files carry sketches, so the merged NDV serves
    val saved = spark.conf.getOption("spark.sql.cbo.enabled")
    val served = try {
      spark.conf.set("spark.sql.cbo.enabled", "true")
      spark.table("gs.db.ndvs").queryExecution.optimizedPlan.stats
        .attributeStats.find(_._1.name == "k").flatMap(_._2.distinctCount)
    } finally saved match {
      case Some(v) => spark.conf.set("spark.sql.cbo.enabled", v)
      case None    => spark.conf.unset("spark.sql.cbo.enabled")
    }
    assert(served.exists(n => (n.toLong - 100L).abs <= 5),
      s"streamed epochs must serve NDV: $served")
  }

  test("complete mode replaces the snapshot each epoch") {
    ensureDb()
    import spark.implicits._
    spark.sql("CREATE TABLE gs.db.agg (key STRING, n BIGINT) USING manifest")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val ckpt = Files.createTempDirectory("graft_cstream_ck2_").toString
    val q = source.toDF().toDF("key")
      .groupBy("key").agg(count(lit(1)).as("n"))
      .writeStream.option("checkpointLocation", ckpt)
      .outputMode("complete").toTable("gs.db.agg")
    try {
      source.addData("a", "a", "b")
      q.processAllAvailable()
      source.addData("a")
      q.processAllAvailable()
      val state = spark.sql("SELECT key, n FROM gs.db.agg ORDER BY key").collect()
        .map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(state === Seq(("a", 3L), ("b", 1L)),
        "complete mode must hold exactly the latest aggregate state")
    } finally q.stop()
  }

  test("readStream.table streams manifest versions as micro-batches") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.src (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gs.db.src SELECT id, 'b1' FROM range(10)")       // v1
    val ckpt = Files.createTempDirectory("graft_cstream_ck3_").toString
    val q = spark.readStream.table("gs.db.src")
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("src_stream").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.sql("SELECT count(*) FROM src_stream").head().getLong(0) === 10L)
      // a new commit arrives as a NEW batch containing only its files' rows
      spark.sql("INSERT INTO gs.db.src SELECT id + 100, 'b2' FROM range(4)") // v2
      q.processAllAvailable()
      val rows = spark.sql("SELECT v, count(*) AS n FROM src_stream GROUP BY v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(rows === Map("b1" -> 10L, "b2" -> 4L))
      assert(q.lastProgress.sources.head.endOffset === "2",
        "the stream offset must be the manifest version")
    } finally q.stop()
  }

  test("a restarted reader stream resumes from its version checkpoint") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.src2 (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gs.db.src2 SELECT id FROM range(5)")             // v1
    val ckpt = Files.createTempDirectory("graft_cstream_ck4_").toString
    val outDir = Files.createTempDirectory("graft_cstream_out_").toString
    def run(): Unit = {
      val q = spark.readStream.table("gs.db.src2")
        .writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).outputMode("append").start()
      try q.processAllAvailable() finally q.stop()
    }
    run()
    assert(spark.read.parquet(outDir).count() === 5L)
    spark.sql("INSERT INTO gs.db.src2 SELECT id + 10 FROM range(3)")        // v2
    run() // SAME checkpoint: the restart must deliver only the delta
    assert(spark.read.parquet(outDir).count() === 8L,
      "restart must resume at the checkpointed version, not re-read the table")
    assert(spark.read.parquet(outDir).agg(
        org.apache.spark.sql.functions.sum("id")).head().getLong(0) ===
      ((0 until 5) ++ (10 until 13)).sum.toLong)
  }

  test("a fresh stream with start_version skips history before the cursor") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.src3 (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gs.db.src3 SELECT id FROM range(7)")          // v1
    spark.sql("INSERT INTO gs.db.src3 SELECT id + 50 FROM range(2)")     // v2
    val ckpt = Files.createTempDirectory("graft_cstream_ck7_").toString
    val q = spark.readStream.option("start_version", "1").table("gs.db.src3")
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("src3_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val ids = spark.sql("SELECT id FROM src3_out ORDER BY id").collect().map(_.getLong(0))
      assert(ids.toSeq === Seq(50L, 51L), s"must begin after v1, got ${ids.toSeq}")
    } finally q.stop()
  }

  test("Trigger.AvailableNow drains the table to its pinned version and stops") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.src4 (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gs.db.src4 SELECT id FROM range(6)")          // v1
    spark.sql("INSERT INTO gs.db.src4 SELECT id + 50 FROM range(2)")     // v2
    val ckpt = Files.createTempDirectory("graft_cstream_ck8_").toString
    val outDir = Files.createTempDirectory("graft_cstream_out2_").toString
    def drain(): Unit = {
      val q = spark.readStream.table("gs.db.src4")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", outDir).start()
      try assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      finally q.stop()
    }
    drain() // drains v1+v2, then STOPS on its own
    assert(spark.read.parquet(outDir).count() === 8L)
    spark.sql("INSERT INTO gs.db.src4 SELECT id + 90 FROM range(3)")     // v3
    drain() // second drain picks up exactly the delta
    assert(spark.read.parquet(outDir).count() === 11L)
  }

  test("maxFilesPerTrigger/maxVersionsPerTrigger bound backfill batches, exactly-once") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.thr (id BIGINT) USING manifest")
    // 4 versions x 2 files: an unthrottled backfill would be ONE 8-file batch
    (0 until 4).foreach { i =>
      spark.sql(s"INSERT INTO gs.db.thr SELECT /*+ REPARTITION(2) */ id + ${i * 10} FROM range(5)")
    }
    val ckpt = Files.createTempDirectory("graft_cstream_thr_").toString
    val outDir = Files.createTempDirectory("graft_cstream_throut_").toString
    def drain(maxFiles: String): Seq[Long] = {
      val q = spark.readStream.option("maxFilesPerTrigger", maxFiles)
        .table("gs.db.thr")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", outDir).start()
      try assert(q.awaitTermination(120000), "AvailableNow query must self-terminate")
      finally q.stop()
      q.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    }
    // a 2-file budget admits exactly one 2-file version per batch: the
    // backfill drains in 4 bounded batches, not one 8-file gulp
    val batches = drain(maxFiles = "2")
    assert(batches === Seq(5L, 5L, 5L, 5L), s"batch sizes: $batches")
    assert(spark.read.parquet(outDir).count() === 20L)
    // exactly-once across a throttled RESTART: new versions drain from the
    // checkpointed offset, still throttled, no replays
    spark.sql("INSERT INTO gs.db.thr SELECT /*+ REPARTITION(2) */ id + 100 FROM range(4)")
    spark.sql("INSERT INTO gs.db.thr SELECT /*+ REPARTITION(2) */ id + 200 FROM range(3)")
    val batches2 = drain(maxFiles = "2")
    assert(batches2 === Seq(4L, 3L), s"restart batch sizes: $batches2")
    assert(spark.read.parquet(outDir).count() === 27L)
    // version budget on the CHANGE stream: 1 version per batch
    val ckpt2 = Files.createTempDirectory("graft_cstream_thr2_").toString
    val q2 = spark.readStream
      .option("maxVersionsPerTrigger", "1").option("start_version", "4")
      .table("gs.db.thr.changes")
      .writeStream.option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("thr_cdc").outputMode("append").start()
    try assert(q2.awaitTermination(120000))
    finally q2.stop()
    val cdcBatches = q2.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(cdcBatches === Seq(4L, 3L), s"cdc batch sizes: $cdcBatches")
    assert(spark.sql("SELECT count(*) FROM thr_cdc").head().getLong(0) === 7L)
    // bytes budget (stats-carried lengths): 1 byte admits exactly one
    // version per batch — the whole 6-version history drains in 6 batches
    val ckpt3 = Files.createTempDirectory("graft_cstream_thr3_").toString
    val q3 = spark.readStream.option("maxBytesPerTrigger", "1")
      .table("gs.db.thr")
      .writeStream.option("checkpointLocation", ckpt3)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .format("memory").queryName("thr_bytes").outputMode("append").start()
    try assert(q3.awaitTermination(120000))
    finally q3.stop()
    val byteBatches = q3.recentProgress.toSeq.map(_.numInputRows).filter(_ > 0)
    assert(byteBatches === Seq(5L, 5L, 5L, 5L, 4L, 3L),
      s"bytes-throttle batch sizes: $byteBatches")
  }

  test("round trip: one manifest table as sink then source of two streams") {
    ensureDb()
    import spark.implicits._
    spark.sql("CREATE TABLE gs.db.hub (key STRING, x BIGINT) USING manifest")
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val source = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, Long)]
    val ckptIn = Files.createTempDirectory("graft_cstream_ck5_").toString
    val ckptOut = Files.createTempDirectory("graft_cstream_ck6_").toString
    val in = source.toDF().toDF("key", "x")
      .writeStream.option("checkpointLocation", ckptIn)
      .outputMode("append").toTable("gs.db.hub")
    val out = spark.readStream.table("gs.db.hub")
      .writeStream.option("checkpointLocation", ckptOut)
      .format("memory").queryName("hub_out").outputMode("append").start()
    try {
      source.addData(("a", 1L), ("b", 2L))
      in.processAllAvailable()
      out.processAllAvailable()
      source.addData(("a", 3L))
      in.processAllAvailable()
      out.processAllAvailable()
      val got = spark.sql("SELECT key, sum(x) AS t FROM hub_out GROUP BY key ORDER BY key")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(got === Seq(("a", 4L), ("b", 2L)),
        "rows must flow stream -> versioned table -> stream exactly once")
    } finally { in.stop(); out.stop() }
  }

  test("readStream on t.changes streams the change feed, deletes included") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.cdf (id BIGINT, v STRING) USING manifest " +
      "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gs.db.cdf SELECT id, 'b1' FROM range(10)")        // v1
    val ckpt = Files.createTempDirectory("graft_cstream_cdf_").toString
    val q = spark.readStream.table("gs.db.cdf.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("cdf_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      // the fresh stream's first batch = the current snapshot as inserts
      assert(spark.sql("SELECT count(*) FROM cdf_out WHERE _change_type = 'insert'")
        .head().getLong(0) === 10L)
      // a merge-on-read DELETE arrives as delete pre-images of exactly
      // the killed rows; an ordinary append as plain inserts
      spark.sql("DELETE FROM gs.db.cdf WHERE id IN (2, 5)")                  // v2
      spark.sql("INSERT INTO gs.db.cdf SELECT id + 100, 'b2' FROM range(3)") // v3
      q.processAllAvailable()
      val byType = spark.sql(
        "SELECT _change_type, count(*) AS n FROM cdf_out GROUP BY _change_type")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(byType === Map("insert" -> 13L, "delete" -> 2L))
      assert(spark.sql(
        "SELECT id FROM cdf_out WHERE _change_type = 'delete' ORDER BY id")
        .collect().map(_.getLong(0)).toSeq === Seq(2L, 5L))
      assert(q.lastProgress.sources.head.endOffset === "3",
        "the change stream's offset must be the manifest version")
    } finally q.stop()
  }

  test("a change stream seeds from start_version and skips prior history") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.cdf2 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gs.db.cdf2 SELECT id, 'old' FROM range(5)")       // v1
    spark.sql("INSERT INTO gs.db.cdf2 SELECT id + 10, 'new' FROM range(2)")  // v2
    val ckpt = Files.createTempDirectory("graft_cstream_cdf2_").toString
    val q = spark.readStream.option("start_version", "1").table("gs.db.cdf2.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("cdf2_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      val got = spark.sql("SELECT v, count(*) FROM cdf2_out GROUP BY v")
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(got === Map("new" -> 2L), "only the post-cursor window streams")
    } finally q.stop()
  }

  test("keyedlog t.changes streams the journal: appends, compaction, row-level UPDATE; restart exactly-once") {
    ensureDb()
    // bucket-declared so every write clusters one file per key — the
    // UPDATE's matched set (and so the feed's delete/insert pairs) is
    // deterministic at any parallelism
    spark.sql("CREATE TABLE gs.db.klog (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog PARTITIONED BY (bucket(2, key))")
    spark.sql("INSERT INTO gs.db.klog VALUES ('a', 1, 10), ('b', 2, 20)")    // journal v0
    val ckpt = Files.createTempDirectory("graft_cstream_kl_").toString
    val outDir = Files.createTempDirectory("graft_cstream_klout_").toString
    var lastOffset: String = ""
    def drain(): Unit = {
      val q = spark.readStream.table("gs.db.klog.changes")
        .writeStream.option("checkpointLocation", ckpt)
        .format("parquet").option("path", outDir).outputMode("append").start()
      try {
        q.processAllAvailable()
        Option(q.lastProgress).foreach(p => lastOffset = p.sources.head.endOffset)
      } finally q.stop()
    }
    def byType: Map[String, Long] =
      spark.read.parquet(outDir).groupBy("_change_type").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    drain()
    assert(byType === Map("insert" -> 2L), "v0 arrives as plain inserts")
    spark.sql("INSERT INTO gs.db.klog VALUES ('a', 3, 30)")                  // v1
    drain()
    assert(byType === Map("insert" -> 3L))
    // WHILE THE STREAM IS DOWN: a compaction rewrite, an append, and a
    // row-level UPDATE land; the restarted stream must deliver exactly
    // the checkpointed window (1, 4] — rewrite refresh rows, the new
    // insert, and the UPDATE as tombstone-served delete pre-images plus
    // insert post-images
    spark.sql("CALL gs.system.compact('db.klog')")                           // v2 (rewrite)
    spark.sql("INSERT INTO gs.db.klog VALUES ('c', 4, 40)")                  // v3
    spark.sql("UPDATE gs.db.klog SET metric = metric + 1000 WHERE key = 'a'")// v4 (rm/ad)
    drain()
    assert(byType === Map("insert" -> 6L, "rewrite" -> 3L, "delete" -> 2L),
      s"got $byType")
    assert(lastOffset === "4", "the stream offset must be the journal version")
    // the UPDATE's images: pre-images carry the old metrics, post-images
    // the bumped ones
    val del = spark.read.parquet(outDir)
      .where("_change_type = 'delete'").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(del === Set(("a", 1L, 10L), ("a", 3L, 30L)), s"pre-images: $del")
    val bumped = spark.read.parquet(outDir)
      .where("_change_type = 'insert' AND metric > 1000").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(bumped === Set(("a", 1L, 1010L), ("a", 3L, 1030L)),
      s"post-images: $bumped")
    // exactly-once: an idle restart re-delivers nothing
    drain()
    assert(byType === Map("insert" -> 6L, "rewrite" -> 3L, "delete" -> 2L))
  }

  test("keyedlog change stream: start_version seeding + AvailableNow + version throttle") {
    ensureDb()
    spark.sql("CREATE TABLE gs.db.klog2 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gs.db.klog2 VALUES ('a', 1, 1)")   // v0
    spark.sql("INSERT INTO gs.db.klog2 VALUES ('b', 2, 2)")   // v1
    spark.sql("INSERT INTO gs.db.klog2 VALUES ('c', 3, 3)")   // v2
    val ckpt = Files.createTempDirectory("graft_cstream_kl2_").toString
    val q = spark.readStream
      .option("start_version", "0")            // skip v0
      .option("maxVersionsPerTrigger", "1")    // one journal version per batch
      .table("gs.db.klog2.changes")
      .writeStream.option("checkpointLocation", ckpt)
      .format("memory").queryName("klog2_out").outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      q.awaitTermination(60000)
      val keys = spark.sql("SELECT key FROM klog2_out ORDER BY key")
        .collect().map(_.getString(0)).toSeq
      assert(keys === Seq("b", "c"), "window (0, head] only")
      val dataBatches = q.recentProgress.count(_.numInputRows > 0)
      assert(dataBatches === 2,
        s"throttle must split the drain into 2 one-version batches, got $dataBatches")
    } finally q.stop()
  }
}
