package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ManifestTable

/** Zero-copy table CLONE (`CALL g.system.clone`): an independent table
  * materialized over the source's data plane at a version — no data
  * copied at any table size. The clone's private lineage (its own DML,
  * appends, versions, time travel) lives in a pinned branch log on the
  * source dir; DROP TABLE releases the pin; the source refuses drop/
  * rename while pins exist; maintenance procedures aim at the physical
  * table only. */
class CloneSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gc", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_clone_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gc.db")

  private def dataDir(table: String) = s"$root/db/$table"

  private def nums(table: String): Seq[Long] =
    spark.sql(s"SELECT id FROM $table ORDER BY id")
      .collect().map(_.getLong(0)).toSeq

  test("clone shares the source's data plane and diverges independently") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.src (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gc.db.src SELECT id, CAST(id AS STRING) FROM range(10)")
    spark.sql("INSERT INTO gc.db.src SELECT id + 10, 'b' FROM range(5)")

    val row = spark.sql("CALL gc.system.clone('db.src', 'db.cl')").head()
    val pin = row.getString(1)
    assert(row.getLong(0) === 2L, "clone forks the source's current version")
    assert(pin === ManifestTable.CloneBranchPrefix + "db.cl")

    // ZERO COPY: the pin's fork snapshot lists the SOURCE's physical file
    // keys verbatim — nothing was rewritten or duplicated
    val srcFiles = ManifestTable.state(dataDir("src"), 2L).files.toSet
    val pinLog = ManifestTable.branchLogDir(dataDir("src"), pin)
    assert(ManifestTable.state(pinLog,
      ManifestTable.currentVersion(pinLog).get).files.toSet === srcFiles)

    assert(nums("gc.db.cl") === (0L until 15L))

    // diverge the clone: DML + append land in the pin's log only
    spark.sql("DELETE FROM gc.db.cl WHERE id >= 10")
    spark.sql("INSERT INTO gc.db.cl SELECT id + 100, 'c' FROM range(3)")
    // diverge the source the other way
    spark.sql("INSERT INTO gc.db.src SELECT id + 200, 'd' FROM range(2)")

    assert(nums("gc.db.cl") === ((0L until 10L) ++ Seq(100L, 101L, 102L)),
      "the clone sees its own DML, never the source's later commits")
    assert(nums("gc.db.src") === ((0L until 15L) ++ Seq(200L, 201L)),
      "the source never sees the clone's DML")
  }

  test("clone at a past version pins that snapshot") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.past (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.past SELECT id FROM range(4)")
    spark.sql("INSERT INTO gc.db.past SELECT id + 4 FROM range(4)")
    spark.sql("CALL gc.system.clone('db.past', 'db.pastcl', version => 1)")
    assert(nums("gc.db.pastcl") === (0L until 4L))
    // the fork ANCHORS version 1 against vacuum even after the source
    // moves on: snapshot-replace the source, vacuum, clone still reads
    spark.sql("INSERT OVERWRITE gc.db.past SELECT id + 50 FROM range(2)")
    spark.sql("CALL gc.system.vacuum('db.past', keep => 1, orphan_retain_ms => 0)")
    assert(nums("gc.db.pastcl") === (0L until 4L),
      "vacuum on the source must retain every pool the clone references")
    assert(nums("gc.db.past") === Seq(50L, 51L))
  }

  test("clone time travel runs in its own lineage; tags/branches rejected") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.tt (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.tt SELECT id FROM range(3)")
    spark.sql("CALL gc.system.clone('db.tt', 'db.ttcl')")
    spark.sql("INSERT INTO gc.db.ttcl SELECT id + 10 FROM range(2)")
    // branch-log v1 IS the clone-time snapshot; v2 adds the clone's rows
    assert(nums("gc.db.ttcl VERSION AS OF 1") === (0L until 3L))
    assert(nums("gc.db.ttcl VERSION AS OF 2") === Seq(0L, 1L, 2L, 10L, 11L))
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM gc.db.ttcl VERSION AS OF 'sometag'").collect()
    }
    assert(e.getMessage.contains("clones support only numeric"))
  }

  test("clone metadata: history/files serve the clone's lineage") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.md (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.md SELECT id FROM range(6)")
    spark.sql("CALL gc.system.clone('db.md', 'db.mdcl')")
    spark.sql("INSERT INTO gc.db.mdcl SELECT id + 10 FROM range(3)")
    val hist = spark.sql("SELECT version FROM gc.db.mdcl.history ORDER BY version")
      .collect().map(_.getLong(0)).toSeq
    assert(hist === Seq(1L, 2L), "clone history = its branch-log versions")
    val files = spark.sql("SELECT file, bytes FROM gc.db.mdcl.files").collect()
    assert(files.length >= 2, "fork snapshot's files + the clone's append")
    assert(files.forall(_.getLong(1) > 0L),
      "file sizes must resolve against the shared data plane")
    // refs/changes are source-side concepts: absent on a clone
    intercept[Exception] { spark.table("gc.db.mdcl.refs").collect() }
  }

  test("maintenance procedures refuse clones; branch procs refuse pins") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.mt (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.mt SELECT id FROM range(3)")
    spark.sql("CALL gc.system.clone('db.mt', 'db.mtcl')")
    for (call <- Seq(
        "CALL gc.system.compact('db.mtcl')",
        "CALL gc.system.vacuum('db.mtcl')",
        "CALL gc.system.rollback('db.mtcl', 1)",
        "CALL gc.system.tag('db.mtcl', 'nope')")) {
      val e = intercept[Exception](spark.sql(call).collect())
      assert(e.getMessage.contains("zero-copy clone"), call)
    }
    // the pin namespace is reserved against user branch lifecycle calls
    val pin = ManifestTable.CloneBranchPrefix + "db.mtcl"
    for (call <- Seq(
        s"CALL gc.system.branch('db.mt', '$pin')",
        s"CALL gc.system.fast_forward('db.mt', '$pin')")) {
      val e = intercept[Exception](spark.sql(call).collect())
      assert(e.getMessage.contains("reserved"), call)
    }
    // drop_branch refuses a LIVE pin (the clone table still exists)...
    val eLive = intercept[Exception](
      spark.sql(s"CALL gc.system.drop_branch('db.mt', '$pin')").collect())
    assert(eLive.getMessage.contains("live zero-copy clone pin"))
    // ...but accepts an ORPHANED one (crash between pin-create and
    // descriptor-write leaves a pin no table points at) — the recovery
    // path for an otherwise undroppable blocker of the source's DROP
    val orphan = ManifestTable.CloneBranchPrefix + "db.never_written"
    ManifestTable.createBranch(dataDir("mt"), orphan)
    assert(spark.sql(s"CALL gc.system.drop_branch('db.mt', '$orphan')")
      .head().getBoolean(0))
    // a clone of a clone would chain pins across drops: refused
    val e2 = intercept[Exception](
      spark.sql("CALL gc.system.clone('db.mtcl', 'db.mtcl2')").collect())
    assert(e2.getMessage.contains("itself a clone"))
  }

  test("expire_refs never expires a clone pin") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.ret (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.ret SELECT id FROM range(3)")
    spark.sql("CALL gc.system.clone('db.ret', 'db.retcl')")
    spark.sql("CALL gc.system.branch('db.ret', 'stale')")
    Thread.sleep(80)
    val dropped = spark.sql("CALL gc.system.expire_refs('db.ret', 1)").head()
    assert(dropped.getLong(0) === 1L && dropped.getString(1) === "branch:stale",
      "the ordinary stale branch expires; the clone pin is load-bearing")
    assert(nums("gc.db.retcl") === (0L until 3L))
  }

  test("DROP TABLE lifecycle: clone releases its pin; source refuses while pinned") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.lc (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.lc SELECT id FROM range(3)")
    spark.sql("CALL gc.system.clone('db.lc', 'db.lccl')")
    val eDrop = intercept[Exception](spark.sql("DROP TABLE gc.db.lc"))
    assert(eDrop.getMessage.contains("clones still pin"))
    val eRen = intercept[Exception](
      spark.sql("ALTER TABLE gc.db.lc RENAME TO db.lc2"))
    assert(eRen.getMessage.contains("pin its data plane"))
    // dropping the clone releases the pin...
    spark.sql("DROP TABLE gc.db.lccl")
    assert(ManifestTable.branches(dataDir("lc")).isEmpty)
    // ...and the source becomes droppable
    spark.sql("DROP TABLE gc.db.lc")
    assert(spark.sql("SHOW TABLES IN gc.db").collect()
      .forall(_.getString(1) != "lc"))
  }

  test("a dropped clone's private pools become vacuum-collectable; live ones never") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.vc (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.vc SELECT id FROM range(4)")
    spark.sql("CALL gc.system.clone('db.vc', 'db.vccl')")
    spark.sql("INSERT INTO gc.db.vccl SELECT id + 10 FROM range(3)")
    val dir = dataDir("vc")
    val pinLog = ManifestTable.branchLogDir(dir,
      ManifestTable.CloneBranchPrefix + "db.vccl")
    // the clone's append staged a PRIVATE pool in the SHARED data plane
    val privatePools = ManifestTable.state(pinLog,
        ManifestTable.currentVersion(pinLog).get)
      .files.map(_.split("/", 2).head).toSet --
      ManifestTable.state(dir, ManifestTable.currentVersion(dir).get)
        .files.map(_.split("/", 2).head).toSet
    assert(privatePools.nonEmpty, "the clone's insert must have staged a pool")
    val fs = graft.core.LakeStorage.openFor(dir)
    def poolExists(p: String) =
      fs.exists(new org.apache.hadoop.fs.Path(dir, p))
    // while the clone LIVES, source vacuum retains its pools
    spark.sql("CALL gc.system.vacuum('db.vc', keep => 1, orphan_retain_ms => 0)")
    assert(privatePools.forall(poolExists),
      "vacuum must retain pools referenced only by a live clone's pin")
    assert(nums("gc.db.vccl") === ((0L until 4L) ++ Seq(10L, 11L, 12L)))
    // after DROP, the pin is gone and the pools are collectable garbage
    spark.sql("DROP TABLE gc.db.vccl")
    spark.sql("CALL gc.system.vacuum('db.vc', keep => 1, orphan_retain_ms => 0)")
    assert(privatePools.forall(p => !poolExists(p)),
      "a dropped clone's private pools must be vacuum-collectable")
    assert(nums("gc.db.vc") === (0L until 4L), "the source is untouched")
  }

  test("WAP session conf never re-routes a clone") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.wap (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.wap SELECT id FROM range(3)")
    spark.sql("CALL gc.system.clone('db.wap', 'db.wapcl')")
    // a same-named staging branch on the shared source dir must not
    // hijack the clone's reads or writes
    spark.sql("CALL gc.system.branch('db.wap', 'stage')")
    spark.conf.set(GraftCatalog.WapBranchConf, "stage")
    try {
      spark.sql("INSERT INTO gc.db.wapcl SELECT id + 10 FROM range(2)")
      assert(nums("gc.db.wapcl") === Seq(0L, 1L, 2L, 10L, 11L),
        "the clone writes to its pin, not the session's WAP branch")
      assert(ManifestTable.branchHead(dataDir("wap"), "stage").contains(1L),
        "the staging branch must not receive the clone's insert")
    } finally spark.conf.unset(GraftCatalog.WapBranchConf)
  }

  test("deep clone: physical migration survives source vacuum, drop, and dir removal") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.dsrc (id BIGINT, v STRING) USING manifest " +
      "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gc.db.dsrc SELECT id, CAST(id AS STRING) FROM range(10)")
    // a pending deletion vector: the deep copy must carry the vector
    // files and refs, not just the data pools
    spark.sql("DELETE FROM gc.db.dsrc WHERE id IN (2, 3)")
    val row = spark.sql(
      "CALL gc.system.clone('db.dsrc', 'db.ddst', deep => true)").collect().head
    assert(row.getString(1).startsWith("deep("), row.getString(1))
    def idsOf(t: String): Seq[Long] =
      spark.sql(s"SELECT id FROM gc.db.$t ORDER BY id")
        .collect().map(_.getLong(0)).toSeq
    val expect = Seq(0L, 1L) ++ (4L to 9L)
    assert(idsOf("ddst") == expect)
    // no pin left behind: the copy is self-sufficient, so the source
    // keeps no clone branch for it
    assert(!spark.sql("SELECT name FROM gc.db.dsrc.refs").collect()
      .exists(_.getString(0).contains("ddst")))
    // the target owns its data plane outright: drop the source TABLE and
    // remove its directory wholesale — the deep clone still reads
    spark.sql("DROP TABLE gc.db.dsrc")
    val srcPath = java.nio.file.Paths.get(dataDir("dsrc").stripPrefix("file://"))
    if (java.nio.file.Files.exists(srcPath)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(srcPath).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
    assert(idsOf("ddst") == expect, "deep clone must not reference the source")
    // and it is a full table of its own: DML works
    spark.sql("DELETE FROM gc.db.ddst WHERE id >= 8")
    assert(idsOf("ddst") == Seq(0L, 1L) ++ (4L to 7L))
  }

  test("deep clone of an identity table carries the high-water mark") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.isrc (id BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "v STRING) USING manifest")
    spark.sql("INSERT INTO gc.db.isrc VALUES (NULL, 'a'), (NULL, 'b'), (NULL, 'c')")
    spark.sql("CALL gc.system.clone('db.isrc', 'db.idst', deep => true)")
    // the clone's first insert must continue ABOVE the copied keys, not
    // restart the sequence at the identity START and silently collide
    spark.sql("INSERT INTO gc.db.idst VALUES (NULL, 'd'), (NULL, 'e')")
    val ids = spark.sql("SELECT id FROM gc.db.idst ORDER BY id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.distinct.size == 5,
      s"deep clone re-issued surrogate keys already present in copied rows: $ids")
    assert(ids.take(3) == Seq(1L, 2L, 3L) && ids.drop(3).forall(_ > 3L),
      s"clone's new keys must extend the source's mark: $ids")
  }

  test("deep clone migrates a keyedlog table with stats; zero-copy refuses") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.ksrc (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.range(5).selectExpr("'lo' AS key", "id AS seq", "id AS metric")
      .coalesce(1).writeTo("gc.db.ksrc").append()
    spark.range(5).selectExpr("'hi' AS key", "id + 5 AS seq", "id + 1000 AS metric")
      .coalesce(1).writeTo("gc.db.ksrc").append()
    // a row-level rewrite before the clone: the clone must take the LIVE
    // set (post-swap files), not resurrect replaced pre-images
    spark.sql("UPDATE gc.db.ksrc SET metric = metric + 10 WHERE key = 'lo'")
    spark.sql("CALL gc.system.clone('db.ksrc', 'db.kdst', deep => true)")
    def rows(t: String) = spark.sql(
      s"SELECT key, seq, metric FROM $t ORDER BY seq")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows("gc.db.kdst") === rows("gc.db.ksrc"),
      "keyedlog deep clone must be row-for-row identical")
    // journal-carried stats migrate with the bytes: band pruning works
    // on the clone without any backfill
    val planned = spark.table("gc.db.kdst")
      .filter(org.apache.spark.sql.functions.col("metric") >= 1000L)
      .rdd.getNumPartitions
    assert(planned == 1, s"clone must keep skipping bounds, planned=$planned")
    // full independence: drop the source and remove its dir outright
    val expected = rows("gc.db.kdst")
    spark.sql("DROP TABLE gc.db.ksrc")
    assert(rows("gc.db.kdst") === expected,
      "deep clone must survive the source's removal")
    // the zero-copy pin machinery is a manifest branch-log concept
    spark.sql("CREATE TABLE gc.db.ksrc2 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    val e = intercept[Exception] {
      spark.sql("CALL gc.system.clone('db.ksrc2', 'db.kz')")
    }
    assert(e.getMessage.contains("deep => true"), e.getMessage)
  }

  test("clones carry generated-column expressions (zero-copy and deep)") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.gsrc (v BIGINT, dbl BIGINT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest")
    spark.sql("INSERT INTO gc.db.gsrc (v) VALUES (1), (2)")
    spark.sql("CALL gc.system.clone('db.gsrc', 'db.gz')")              // zero-copy
    spark.sql("CALL gc.system.clone('db.gsrc', 'db.gd', deep => true)") // deep
    Seq("gc.db.gz", "gc.db.gd").foreach { t =>
      // the expression rides the descriptor's schema metadata: the
      // clone computes omitted values and rejects divergent ones
      spark.sql(s"INSERT INTO $t (v) VALUES (10)")
      val e = intercept[Exception] {
        spark.sql(s"INSERT INTO $t VALUES (5, 11)")
      }
      assert(
        Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null).take(10)
          .exists(c => Option(c.getMessage).exists(_.contains("generated column"))),
        s"$t must keep validating: ${e.getMessage}")
      val got = spark.sql(s"SELECT v, dbl FROM $t ORDER BY v")
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got == Seq((1L, 2L), (2L, 4L), (10L, 20L)), s"$t: $got")
    }
  }

  test("deep clone copies distributed (Spark-job path) bit-exactly") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.xsrc (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gc.db.xsrc SELECT id, CAST(id * 7 AS STRING) FROM range(50)")
    spark.sql("INSERT INTO gc.db.xsrc SELECT id + 50, 'x' FROM range(10)")
    // threshold 0 forces every file through the distcp-shaped Spark job
    spark.conf.set("spark.graft.clone.distributedThresholdBytes", "0")
    try spark.sql("CALL gc.system.clone('db.xsrc', 'db.xdst', deep => true)")
    finally spark.conf.unset("spark.graft.clone.distributedThresholdBytes")
    val src = spark.sql("SELECT * FROM gc.db.xsrc")
    val dst = spark.sql("SELECT * FROM gc.db.xdst")
    assert(src.exceptAll(dst).isEmpty && dst.exceptAll(src).isEmpty,
      "distributed deep clone must be row-for-row identical")
  }

  test("deep clone onto an existing table refuses and leaves it untouched") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.esrc (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.esrc SELECT id FROM range(3)")
    spark.sql("CREATE TABLE gc.db.edst (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.edst SELECT id + 100 FROM range(2)")
    intercept[Exception] {
      spark.sql("CALL gc.system.clone('db.esrc', 'db.edst', deep => true)")
    }
    // the failed clone's cleanup must respect ownership: the existing
    // table (MetaFile present) survives with its data intact
    assert(nums("gc.db.edst") === Seq(100L, 101L),
      "a refused deep clone must never touch the existing table")
  }

  test("deep clone retries over a crashed attempt's partial leftovers") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.rsrc (id BIGINT) USING manifest")
    spark.sql("INSERT INTO gc.db.rsrc SELECT id FROM range(12)")
    // simulate a crashed prior clone: a TORN partial copy sits at one of
    // the pool paths the retry must write (no MetaFile — the crash died
    // before publish, so nothing references the tree)
    val rel = ManifestTable.state(dataDir("rsrc"),
      ManifestTable.currentVersion(dataDir("rsrc")).get).files.head
    val leftover = java.nio.file.Paths.get(
      s"${dataDir("rdst")}/$rel".stripPrefix("file://"))
    java.nio.file.Files.createDirectories(leftover.getParent)
    java.nio.file.Files.write(leftover, "torn partial copy".getBytes("UTF-8"))
    spark.sql("CALL gc.system.clone('db.rsrc', 'db.rdst', deep => true)")
    assert(nums("gc.db.rdst") === (0L until 12L),
      "retry must overwrite the torn leftover and verify the FINAL bytes")
  }

  test("deep clone at a past version copies that snapshot") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.vsrc (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gc.db.vsrc SELECT id, 'a' FROM range(5)")     // v1
    spark.sql("INSERT INTO gc.db.vsrc SELECT id + 5, 'b' FROM range(5)") // v2
    spark.sql("CALL gc.system.clone('db.vsrc', 'db.vdst', version => 1, deep => true)")
    assert(spark.table("gc.db.vdst").count() == 5)
    assert(spark.table("gc.db.vsrc").count() == 10, "source untouched")
  }

  test("deep clone preserves bucketing and column-mapping renames") {
    ensureDb()
    spark.sql("CREATE TABLE gc.db.bsrc (id BIGINT, val BIGINT) USING manifest " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO gc.db.bsrc SELECT id, id * 10 FROM range(20)")
    // a metadata-only rename (column mapping): files keep the OLD physical
    // name and resolve by field id — the deep copy must carry the files
    // verbatim AND the renamed descriptor, so reads still resolve
    spark.sql("ALTER TABLE gc.db.bsrc RENAME COLUMN val TO amount")
    spark.sql("CALL gc.system.clone('db.bsrc', 'db.bdst', deep => true)")
    // renamed column serves under its NEW name from the OLD physical files
    val got = spark.sql("SELECT sum(amount) FROM gc.db.bdst").head().getLong(0)
    assert(got == (0L until 20L).map(_ * 10).sum)
    // bucketing metadata survives: the migrated table keeps declaring the
    // bucket transform (and its files keep their bucketed pool names)
    val parts = spark.sql("DESCRIBE TABLE EXTENDED gc.db.bdst").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(parts.exists { case (k, v) =>
      k.startsWith("Part 0") && v.contains("bucket") }, parts.mkString("; "))
    // and the copied pools are physically bucketed ones
    val dir = spark.sql("SHOW TBLPROPERTIES gc.db.bdst").collect()
      .find(_.getString(0) == "graft.location").map(_.getString(1))
      .getOrElse(dataDir("bdst"))
    val files = ManifestTable.manifest(dir, ManifestTable.currentVersion(dir).get)
    assert(files.nonEmpty && files.forall(_.contains("bucketed")),
      s"bucket layout lost in migration: $files")
  }
}
