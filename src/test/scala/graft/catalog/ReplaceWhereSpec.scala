package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ManifestTable

/** REPLACE WHERE (qc51): `df.writeTo(t).overwrite(cond)` swaps the
  * predicate's rows for the incoming batch in ONE atomic manifest version.
  * Structural invariants: untouched files are re-listed never rewritten,
  * partially-matching files keep their survivor rows, out-of-region rows
  * are rejected before any commit, a no-match replace degrades to append,
  * AlwaysTrue routes to the truncate (snapshot) path, and a bucketed
  * table's rewrite stays bucketed. */
class ReplaceWhereSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "rw", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_replace_where_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS rw.db")

  private def tableDir(t: String): String = s"$root/db/$t"

  private def currentFiles(t: String): Set[String] = {
    val dir = tableDir(t)
    ManifestTable.manifest(dir, ManifestTable.currentVersion(dir).get).toSet
  }

  private def versionCount(t: String): Int =
    ManifestTable.allVersions(tableDir(t)).size

  test("replace-where swaps only matching files; untouched pools re-listed") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t1 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t1 SELECT id, concat('a', id) FROM range(0, 10)")
    spark.sql("INSERT INTO rw.db.t1 SELECT id, concat('b', id) FROM range(10, 20)")
    val before = currentFiles("t1")
    val vBefore = versionCount("t1")
    // whole second pool matches; first pool's stats prove it can't
    spark.range(100, 103)
      .select(col("id"), concat(lit("n"), col("id")).as("v"))
      .writeTo("rw.db.t1").overwrite(col("id") >= 10)
    val after = currentFiles("t1")
    assert(versionCount("t1") == vBefore + 1, "replace = ONE atomic version")
    // the a-pool files survive by name (re-listed, not rewritten)
    val aPool = before.filter(after.contains)
    assert(aPool.nonEmpty, "non-matching pool must be re-listed untouched")
    val rows = spark.table("rw.db.t1").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(rows.toSeq ==
      (0L until 10L).map(i => (i, s"a$i")) ++
        Seq((100L, "n100"), (101L, "n101"), (102L, "n102")))
  }

  test("partially-matching file keeps its survivor rows exactly once") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t2 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t2 SELECT id, concat('x', id) FROM range(0, 10)")
    spark.range(200, 202)
      .select(col("id"), lit("new").as("v"))
      .writeTo("rw.db.t2").overwrite(col("id") >= 5)
    val got = spark.table("rw.db.t2").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == (0L until 5L).map(i => (i, s"x$i")) ++
      Seq((200L, "new"), (201L, "new")))
  }

  test("out-of-region batch rejected before any version commits") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t3 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t3 SELECT id, 'k' FROM range(0, 5)")
    val vBefore = versionCount("t3")
    val filesBefore = currentFiles("t3")
    val e = intercept[Exception] {
      spark.range(50, 52).select(col("id"), lit("bad").as("v"))
        .writeTo("rw.db.t3").overwrite(col("id") < 3) // 50,51 violate id<3
    }
    assert(Constraints.violationIn(e, Constraints.ReplaceWhereName),
      s"expected the replace-where constraint in: ${e.getMessage}")
    assert(versionCount("t3") == vBefore, "no version may land")
    assert(currentFiles("t3") == filesBefore, "snapshot untouched")
  }

  test("no-match replace degrades to a plain append") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t4 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t4 SELECT id, 'k' FROM range(0, 5)")
    val before = currentFiles("t4")
    spark.range(900, 902).select(col("id"), lit("n").as("v"))
      .writeTo("rw.db.t4").overwrite(col("id") >= 900)
    val after = currentFiles("t4")
    assert(before.subsetOf(after), "existing files all survive")
    assert(spark.table("rw.db.t4").count() == 7)
  }

  test("AlwaysTrue overwrite = snapshot replace (truncate path)") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t5 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t5 SELECT id, 'old' FROM range(0, 5)")
    spark.range(0, 2).select(col("id"), lit("new").as("v"))
      .writeTo("rw.db.t5").overwrite(lit(true))
    val got = spark.table("rw.db.t5").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((0L, "new"), (1L, "new")))
  }

  test("predicate values with quotes/backslashes survive both parser escape modes") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t8 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t8 VALUES (1, \"O'Brien\"), (2, 'plain')")
    Seq("false", "true").foreach { mode =>
      val prev = spark.conf.get("spark.sql.parser.escapedStringLiterals")
      try {
        spark.conf.set("spark.sql.parser.escapedStringLiterals", mode)
        // in-region batch must pass the rendered replace_where constraint
        // regardless of how the session parser treats backslashes
        spark.range(10, 11).select(col("id"), lit("O'Brien").as("v"))
          .writeTo("rw.db.t8").overwrite(col("v") === "O'Brien")
        assert(spark.table("rw.db.t8").where("v = \"O'Brien\"")
          .collect().map(_.getLong(0)).toSeq == Seq(10L))
        // and an out-of-region batch still rejects FOR the constraint
        val e = intercept[Exception] {
          spark.range(20, 21).select(col("id"), lit("plain").as("v"))
            .writeTo("rw.db.t8").overwrite(col("v") === "O'Brien")
        }
        assert(Constraints.violationIn(e, Constraints.ReplaceWhereName),
          s"mode=$mode: ${e.getMessage}")
      } finally spark.conf.set("spark.sql.parser.escapedStringLiterals", prev)
    }
  }

  test("SQL front door: INSERT OVERWRITE with a static PARTITION spec routes to replace-where") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t7 (id BIGINT, lang STRING) USING manifest " +
      "PARTITIONED BY (lang)")
    spark.sql("INSERT INTO rw.db.t7 VALUES (1, 'en'), (2, 'de'), (3, 'en')")
    val before = currentFiles("t7")
    spark.sql("INSERT OVERWRITE rw.db.t7 PARTITION (lang = 'en') VALUES (10)")
    val got = spark.table("rw.db.t7").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((2L, "de"), (10L, "en")),
      s"static-partition overwrite must replace only lang='en': $got")
    assert(currentFiles("t7") != before)
  }

  test("merge-on-read table: pending deletion vectors never resurrect through the survivor rewrite") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t9 (id BIGINT, v STRING) USING manifest " +
      "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    // ONE file holds ids 0-9 (explicit coalesce — the overlap this test
    // exists to exercise must not depend on default parallelism's split)
    spark.range(0, 10).coalesce(1)
      .select(col("id"), lit("k").as("v")).writeTo("rw.db.t9").append()
    assert(currentFiles("t9").size == 1,
      "fixture precondition: vectored rows and replaced rows share a file")
    // conditioned DELETE on a MoR table writes deletion vectors —
    // rows 2,3 are dead but still physically present in the data file
    spark.sql("DELETE FROM rw.db.t9 WHERE id IN (2, 3)")
    assert(spark.table("rw.db.t9").count() == 8)
    // replace id>=4: the predicate OVERLAPS the single file holding the
    // vectored rows, forcing that file through the survivor rewrite — if
    // the rewrite didn't apply the pending vectors, 2,3 would come back
    // from the dead
    spark.range(100, 102).select(col("id"), lit("n").as("v"))
      .writeTo("rw.db.t9").overwrite(col("id") >= 4)
    val got = spark.table("rw.db.t9").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 100L, 101L),
      s"deletion-vector rows resurrected or survivors lost: $got")
  }

  test("WAP branch: replace-where commits to the branch log; main untouched until publish") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t10 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t10 SELECT id, 'old' FROM range(0, 10)")
    spark.sql("CALL rw.system.branch('db.t10', 'stage')")
    spark.conf.set(GraftCatalog.WapBranchConf, "stage")
    try {
      spark.range(0, 2).select(col("id"), lit("new").as("v"))
        .writeTo("rw.db.t10").overwrite(col("id") < 5)
      assert(spark.table("rw.db.t10").count() == 7,
        "branch view must see 5 survivors + 2 replacements")
    } finally spark.conf.unset(GraftCatalog.WapBranchConf)
    assert(spark.table("rw.db.t10").count() == 10, "main must be untouched")
    spark.sql("CALL rw.system.fast_forward('db.t10', 'stage')")
    assert(spark.table("rw.db.t10").count() == 7, "publish carries the replace")
  }

  test("incremental read after a whole-pool replace serves only the new batch") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t11 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t11 SELECT id, 'a' FROM range(0, 10)")
    spark.sql("INSERT INTO rw.db.t11 SELECT id, 'b' FROM range(10, 20)")
    spark.range(100, 103).select(col("id"), lit("n").as("v"))
      .writeTo("rw.db.t11").overwrite(col("id") >= 10)
    // the whole b-pool matched (no survivor files), so the incremental
    // window since v2 is exactly the replacement batch
    val delta = spark.read.option("start_version", "2").table("rw.db.t11")
      .orderBy("id").collect().map(_.getLong(0)).toSeq
    assert(delta == Seq(100L, 101L, 102L), s"incremental window: $delta")
  }

  test("conflict guard: concurrent may-matching append aborts; disjoint append carries over") {
    import org.apache.spark.sql.{sources, types => T}
    import graft.core.FileStats
    val dir = "file://" + Files.createTempDirectory("graft_rw_guard_").toString
    val schema = T.StructType(Seq(
      T.StructField("id", T.LongType), T.StructField("v", T.StringType)))
    def pool(lo: Long, hi: Long) = ManifestTable.stagePool(
      spark.range(lo, hi).select(col("id"), lit("k").as("v")).coalesce(1), dir)
    ManifestTable.commitStagedAppend(dir, pool(0, 5)) // v1
    // the replace's discovery snapshot = v1's files; predicate id >= 3
    val snap = ManifestTable.manifest(dir, 1L).toSet
    val filters = Array[sources.Filter](sources.GreaterThanOrEqual("id", 3L))
    def guard = Some((snap,
      (_: String, st: Option[FileStats.Stats]) =>
        st.forall(s => filters.forall(FileStats.mayMatchFilter(_, s, schema)))))
    // a writer lands ids 3-9 AFTER discovery, BEFORE the replace commits:
    // its stats may-match id >= 3, so the rebase must ABORT — an implicit
    // carry-over would keep predicate-matching rows the replace never saw
    ManifestTable.commitStagedAppend(dir, pool(3, 10)) // v2, the racer
    val e = intercept[java.util.ConcurrentModificationException] {
      ManifestTable.commitRewrite(dir, removed = snap.toSeq.sorted,
        added = pool(100, 102), conflictGuard = guard)
    }
    assert(e.getMessage.contains("REPLACE WHERE"), e.getMessage)
    assert(ManifestTable.currentVersion(dir) === Some(2L), "no version lands")
    // same race with a PROVABLY-DISJOINT concurrent file (ids 0-2, all
    // below the id >= 3 predicate): its min/max stats prove no row can
    // match, so the rewrite rebases over it like any DML carry-over
    val dir2 = "file://" + Files.createTempDirectory("graft_rw_guard2_").toString
    def pool2(lo: Long, hi: Long) = ManifestTable.stagePool(
      spark.range(lo, hi).select(col("id"), lit("k").as("v")).coalesce(1), dir2)
    ManifestTable.commitStagedAppend(dir2, pool2(3, 8)) // v1: all match id>=3
    val snap2 = ManifestTable.manifest(dir2, 1L).toSet
    val disjoint = pool2(0, 3) // ids 0-2: stats-disjoint from id >= 3
    ManifestTable.commitStagedAppend(dir2, disjoint)    // v2, the racer
    val guard2 = Some((snap2,
      (_: String, st: Option[FileStats.Stats]) =>
        st.forall(s => filters.forall(FileStats.mayMatchFilter(_, s, schema)))))
    val v = ManifestTable.commitRewrite(dir2, removed = snap2.toSeq.sorted,
      added = pool2(100, 102), conflictGuard = guard2)
    assert(v === 3L)
    val live = ManifestTable.read(spark, dir2).select("id")
      .collect().map(_.getLong(0)).toSeq.sorted
    assert(live == Seq(0L, 1L, 2L, 100L, 101L), s"carry-over broken: $live")
  }

  test("a top-level column named with a dot refuses replace-where loudly (no mangled constraint)") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t13 (`a.b` BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO rw.db.t13 SELECT id, 'k' FROM range(0, 5)")
    val vBefore = versionCount("t13")
    // FieldReference quotes the dotted name, so the v1 Filter attribute
    // arrives backticked; filterToSql must refuse (None) rather than
    // split-and-requote it into a different identifier — canOverwrite
    // then rejects the predicate before any write
    val e = intercept[Exception] {
      spark.range(10, 12).select(col("id").as("a.b"), lit("n").as("v"))
        .writeTo("rw.db.t13").overwrite(col("`a.b`") >= 0)
    }
    assert(!Constraints.violationIn(e, Constraints.ReplaceWhereName),
      s"must refuse the predicate, not misenforce it: ${e.getMessage}")
    assert(versionCount("t13") == vBefore, "no version may land")
    assert(spark.table("rw.db.t13").count() == 5)
  }

  test("user CHECK constraints may not claim the reserved replace-where name") {
    ensureDb()
    val e1 = intercept[Exception] {
      spark.sql("CREATE TABLE rw.db.t14 (id BIGINT) USING manifest " +
        s"TBLPROPERTIES ('${Constraints.Prefix}${Constraints.ReplaceWhereName}' = 'id > 0')")
    }
    assert(e1.getMessage.contains("reserved"), e1.getMessage)
    spark.sql("CREATE TABLE rw.db.t15 (id BIGINT) USING manifest")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE rw.db.t15 SET TBLPROPERTIES " +
        s"('${Constraints.Prefix}${Constraints.ReplaceWhereName}' = 'id > 0')")
    }
    assert(e2.getMessage.contains("reserved"), e2.getMessage)
  }

  test("bucketed table: survivors and the new batch stay bucketed") {
    ensureDb()
    spark.sql("CREATE TABLE rw.db.t6 (id BIGINT, v STRING) USING manifest " +
      "PARTITIONED BY (bucket(4, id))")
    spark.sql("INSERT INTO rw.db.t6 SELECT id, concat('o', id) FROM range(0, 20)")
    spark.range(1000, 1004).select(col("id"), lit("n").as("v"))
      .writeTo("rw.db.t6").overwrite(col("id") >= 10)
    assert(currentFiles("t6").forall(_.contains("bucketed")),
      "rewrite must not demote the table out of bucketed pools")
    val got = spark.table("rw.db.t6").orderBy("id")
      .collect().map(_.getLong(0)).toSeq
    assert(got == (0L until 10L) ++ (1000L until 1004L))
  }
}
