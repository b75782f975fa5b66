package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{DeletionVectors, LakeStorage, ManifestTable}

/** Merge-on-read row-level DML via deletion vectors
  * (`TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')`):
  * a DELETE writes a position sidecar instead of rewriting files, scans
  * subtract the positions, UPDATE/MERGE re-insert changed rows next to
  * the vectors, and purge/compact materialize the debt away. */
class DeletionVectorSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gv", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_catalog_dv_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gv.db")

  private def dir(t: String): String = s"$root/db/$t"

  private def state(t: String): ManifestTable.TableState =
    ManifestTable.state(dir(t), ManifestTable.currentVersion(dir(t)).get)

  private def morTable(t: String, rows: Int = 30): Unit = {
    ensureDb()
    spark.sql(s"DROP TABLE IF EXISTS gv.db.$t")
    spark.sql(s"CREATE TABLE gv.db.$t (id BIGINT, v STRING) USING manifest " +
      "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    spark.sql(s"INSERT INTO gv.db.$t SELECT id, concat('a', id) FROM range(0, ${rows / 3})")
    spark.sql(s"INSERT INTO gv.db.$t SELECT id, concat('b', id) FROM range(${rows / 3}, ${2 * rows / 3})")
    spark.sql(s"INSERT INTO gv.db.$t SELECT id, concat('c', id) FROM range(${2 * rows / 3}, $rows)")
  }

  test("DELETE writes a vector — no data file is rewritten") {
    morTable("dv_del")
    val before = state("dv_del")
    assert(before.dvs.isEmpty)
    spark.sql("DELETE FROM gv.db.dv_del WHERE id IN (3, 7, 15)")
    val after = state("dv_del")
    assert(after.files.toSet === before.files.toSet,
      "merge-on-read DELETE must not add/remove/rewrite data files")
    assert(after.dvs.nonEmpty, "the DELETE must attach deletion vectors")
    assert(after.deletedRows === 3L)
    // reads subtract the vectored rows
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_del").head().getLong(0) === 27L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_del WHERE id IN (3,7,15)")
      .head().getLong(0) === 0L)
    // a second DELETE on an already-vectored file REPLACES its vector
    spark.sql("DELETE FROM gv.db.dv_del WHERE id = 4")
    val again = state("dv_del")
    assert(again.deletedRows === 4L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_del").head().getLong(0) === 26L)
    assert(again.files.toSet === before.files.toSet)
  }

  test("filters and aggregates stay correct on vectored tables") {
    morTable("dv_scan")
    spark.sql("DELETE FROM gv.db.dv_scan WHERE id % 2 = 0")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_scan").head().getLong(0) === 15L)
    assert(spark.sql("SELECT sum(id) FROM gv.db.dv_scan").head().getLong(0) ===
      (1 to 29 by 2).sum.toLong)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_scan WHERE id > 10")
      .head().getLong(0) === (11 to 29).count(_ % 2 == 1).toLong)
    // _pos / _file metadata columns remain selectable
    val withPos = spark.sql("SELECT id, _pos, _file FROM gv.db.dv_scan WHERE id = 1").head()
    assert(withPos.getLong(0) === 1L)
    assert(withPos.getLong(1) === 1L, "_pos is the file-absolute row index")
    assert(withPos.getString(2).startsWith("d-"))
  }

  test("UPDATE = vector the old row + insert the new one") {
    morTable("dv_upd")
    val before = state("dv_upd")
    spark.sql("UPDATE gv.db.dv_upd SET v = 'updated' WHERE id = 12")
    val after = state("dv_upd")
    assert(before.files.toSet.subsetOf(after.files.toSet),
      "UPDATE must keep every original data file (vector, not rewrite)")
    assert((after.files.toSet -- before.files.toSet).nonEmpty,
      "UPDATE must add an insert file for the new row image")
    assert(after.deletedRows === 1L)
    assert(spark.sql("SELECT v FROM gv.db.dv_upd WHERE id = 12").head().getString(0)
      === "updated")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_upd").head().getLong(0) === 30L)
  }

  test("MERGE INTO matched-update / not-matched-insert over vectors") {
    morTable("dv_merge")
    spark.sql(
      """MERGE INTO gv.db.dv_merge t
        |USING (SELECT id, concat('m', id) AS v FROM range(25, 35)) s
        |ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET v = s.v
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_merge").head().getLong(0) === 35L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_merge WHERE v LIKE 'm%'")
      .head().getLong(0) === 10L)
    assert(state("dv_merge").deletedRows === 5L, "5 matched rows vectored")
  }

  test("purge_deletes materializes vectors; only vectored files rewrite") {
    morTable("dv_purge")
    spark.sql("DELETE FROM gv.db.dv_purge WHERE id = 2") // one file touched
    val vectored = state("dv_purge")
    assert(vectored.dvs.size === 1)
    val untouched = vectored.files.toSet -- vectored.dvs.keySet
    val (rewritten, purged) = ManifestTable.purgeDeletes(spark, dir("dv_purge"))
    assert((rewritten, purged) === (1L, 1L))
    val clean = state("dv_purge")
    assert(clean.dvs.isEmpty)
    assert(untouched.subsetOf(clean.files.toSet),
      "files without vectors must survive the purge untouched")
    assert(!clean.files.contains(vectored.dvs.keySet.head))
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_purge").head().getLong(0) === 29L)
  }

  test("compact applies pending vectors (deleted rows stay dead)") {
    morTable("dv_compact")
    spark.sql("DELETE FROM gv.db.dv_compact WHERE id < 5")
    ManifestTable.compact(spark, dir("dv_compact"))
    val st = state("dv_compact")
    assert(st.dvs.isEmpty, "compaction materializes vectors")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_compact").head().getLong(0) === 25L)
    assert(spark.sql("SELECT min(id) FROM gv.db.dv_compact").head().getLong(0) === 5L)
  }

  test("time travel: the pre-delete version still serves every row") {
    morTable("dv_tt")
    val v = ManifestTable.currentVersion(dir("dv_tt")).get
    spark.sql("DELETE FROM gv.db.dv_tt WHERE id >= 20")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_tt").head().getLong(0) === 20L)
    assert(spark.sql(s"SELECT count(*) FROM gv.db.dv_tt VERSION AS OF $v")
      .head().getLong(0) === 30L)
  }

  test("vacuum never deletes a referenced vector; core read applies vectors") {
    morTable("dv_vac")
    spark.sql("DELETE FROM gv.db.dv_vac WHERE id = 9")
    (1 to 3).foreach(i =>
      spark.sql(s"INSERT INTO gv.db.dv_vac VALUES (${100 + i}, 'x')"))
    ManifestTable.vacuum(dir("dv_vac"), keep = 2, orphanRetainMs = 0L)
    // vector file still present and applied
    val st = state("dv_vac")
    assert(st.dvs.size === 1)
    val fs = LakeStorage.openFor(dir("dv_vac"))
    val dvPath = st.dvs.values.head.path
    assert(fs.exists(new org.apache.hadoop.fs.Path(dir("dv_vac"), dvPath)))
    assert(DeletionVectors.read(fs, dir("dv_vac"), dvPath).length === 1)
    assert(ManifestTable.read(spark, dir("dv_vac")).count() === 32L)
  }

  test("rollback to a vectored version carries its vectors") {
    morTable("dv_rb")
    spark.sql("DELETE FROM gv.db.dv_rb WHERE id = 1")
    val vectored = ManifestTable.currentVersion(dir("dv_rb")).get
    spark.sql("INSERT INTO gv.db.dv_rb VALUES (999, 'z')")
    ManifestTable.rollback(dir("dv_rb"), vectored)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_rb").head().getLong(0) === 29L)
    assert(state("dv_rb").deletedRows === 1L)
  }

  test("merge-on-read rejects bucketed tables; bad mode values reject") {
    ensureDb()
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gv.db.dv_bad (id BIGINT, v STRING) USING manifest " +
        "PARTITIONED BY (bucket(4, id)) " +
        "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    }
    assert(e.getMessage.contains("merge-on-read"))
    val e2 = intercept[Exception] {
      spark.sql("CREATE TABLE gv.db.dv_bad2 (id BIGINT) USING manifest " +
        "TBLPROPERTIES ('graft.dml.mode' = 'banana')")
    }
    assert(e2.getMessage.contains("copy-on-write | merge-on-read"))
  }

  test("concurrent append rebases under a vector commit; conflicting vector aborts") {
    morTable("dv_race")
    val d = dir("dv_race")
    val base = ManifestTable.state(d, ManifestTable.currentVersion(d).get)
    // a DELETE's scan pinned `base`; a concurrent vector lands first
    val victim = base.files.head
    val fs = LakeStorage.openFor(d)
    val dvA = s"${DeletionVectors.PoolPrefix}race-a/v.dv"
    DeletionVectors.write(fs, d, dvA, Array(0L))
    ManifestTable.commitDeleteVectors(d, Map(victim -> DeletionVectors.DvRef(dvA, 1L)),
      Seq.empty, Map(victim -> None))
    // the stale committer (still expecting no vector on `victim`) aborts
    val dvB = s"${DeletionVectors.PoolPrefix}race-b/v.dv"
    DeletionVectors.write(fs, d, dvB, Array(1L))
    intercept[java.util.ConcurrentModificationException] {
      ManifestTable.commitDeleteVectors(d, Map(victim -> DeletionVectors.DvRef(dvB, 1L)),
        Seq.empty, Map(victim -> None))
    }
    // a vector commit expecting the CURRENT vector rebases fine
    val merged = DeletionVectors.merge(Array(0L), Array(1L))
    val dvC = s"${DeletionVectors.PoolPrefix}race-c/v.dv"
    DeletionVectors.write(fs, d, dvC, merged)
    ManifestTable.commitDeleteVectors(d,
      Map(victim -> DeletionVectors.DvRef(dvC, merged.length.toLong)),
      Seq.empty, Map(victim -> Some(dvA)))
    assert(ManifestTable.state(d, ManifestTable.currentVersion(d).get)
      .dvs(victim).path === dvC)
  }

  test("CALL purge_deletes; t.files / t.detail report the vector debt") {
    morTable("dv_ops")
    spark.sql("DELETE FROM gv.db.dv_ops WHERE id IN (1, 11)") // two files
    val files = spark.sql(
      "SELECT file, dv_file, deleted_rows FROM gv.db.dv_ops.files").collect()
    assert(files.count(_.getString(1) != null) === 2)
    assert(files.map(_.getLong(2)).sum === 2L)
    assert(spark.sql("SELECT deleted_rows FROM gv.db.dv_ops.detail")
      .head().getLong(0) === 2L)
    val purged = spark.sql("CALL gv.system.purge_deletes('db.dv_ops')").head()
    assert(purged.getLong(0) === 2L, "two vectored files rewritten")
    assert(purged.getLong(1) === 2L, "two positions purged")
    assert(spark.sql("SELECT deleted_rows FROM gv.db.dv_ops.detail")
      .head().getLong(0) === 0L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_ops").head().getLong(0) === 28L)
  }

  test("t.changes emits delete pre-images for vector commits") {
    morTable("dv_cdc")
    val v0 = ManifestTable.currentVersion(dir("dv_cdc")).get
    spark.sql("DELETE FROM gv.db.dv_cdc WHERE id IN (2, 17)")
    val changes = spark.read.option("start_version", v0)
      .table("gv.db.dv_cdc.changes").collect()
    assert(changes.length === 2)
    assert(changes.forall(r => r.getString(2) === "delete"))
    assert(changes.map(_.getLong(0)).toSet === Set(2L, 17L))
    // a second delete window emits ONLY the newly-killed rows
    val v1 = ManifestTable.currentVersion(dir("dv_cdc")).get
    spark.sql("DELETE FROM gv.db.dv_cdc WHERE id = 3") // same file as id=2
    val w2 = spark.read.option("start_version", v1)
      .table("gv.db.dv_cdc.changes").collect()
    assert(w2.map(r => (r.getLong(0), r.getString(2))).toSeq === Seq((3L, "delete")))
    // the full window nets to all three deletes
    val full = spark.read.option("start_version", v0)
      .table("gv.db.dv_cdc.changes").collect()
    assert(full.map(_.getLong(0)).toSet === Set(2L, 3L, 17L))
    // an UPDATE window pairs the delete pre-image with the insert post-image
    val v2 = ManifestTable.currentVersion(dir("dv_cdc")).get
    spark.sql("UPDATE gv.db.dv_cdc SET v = 'u' WHERE id = 20")
    val w3 = spark.read.option("start_version", v2)
      .table("gv.db.dv_cdc.changes").collect()
    assert(w3.map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet ===
      Set((20L, "c20", "delete"), (20L, "u", "insert")))
  }

  test("schema evolution composes with vectors (rename, add, DML, compact)") {
    morTable("dv_evo")
    // rename via column mapping, then DELETE through the NEW name — the
    // delta scan resolves by field id, positions stay file-absolute
    spark.sql("ALTER TABLE gv.db.dv_evo RENAME COLUMN v TO label")
    spark.sql("DELETE FROM gv.db.dv_evo WHERE label = 'a3'")
    assert(state("dv_evo").deletedRows === 1L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_evo").head().getLong(0) === 29L)
    // add a column: old files null-fill it; the row-index column stays
    // last in the read schema, so vector application is unaffected
    spark.sql("ALTER TABLE gv.db.dv_evo ADD COLUMNS (score BIGINT)")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_evo WHERE score IS NULL")
      .head().getLong(0) === 29L)
    spark.sql("UPDATE gv.db.dv_evo SET score = 7 WHERE id = 10")
    assert(spark.sql("SELECT score FROM gv.db.dv_evo WHERE id = 10")
      .head().getLong(0) === 7L)
    // compact under the declared (id-mapped) schema materializes vectors
    spark.sql("CALL gv.system.compact('db.dv_evo')")
    assert(state("dv_evo").dvs.isEmpty)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_evo").head().getLong(0) === 29L)
    assert(spark.sql("SELECT label FROM gv.db.dv_evo WHERE id = 4").head().getString(0)
      === "a4")
  }

  test("INSERT OVERWRITE and truncate clear pending vectors") {
    morTable("dv_ow")
    spark.sql("DELETE FROM gv.db.dv_ow WHERE id = 0")
    assert(state("dv_ow").deletedRows === 1L)
    spark.sql("INSERT OVERWRITE gv.db.dv_ow SELECT id, 'w' FROM range(5)")
    assert(state("dv_ow").dvs.isEmpty, "a snapshot replace drops all vectors")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_ow").head().getLong(0) === 5L)
    spark.sql("DELETE FROM gv.db.dv_ow WHERE id = 1")
    spark.sql("DELETE FROM gv.db.dv_ow") // no condition: truncate fast path
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_ow").head().getLong(0) === 0L)
    assert(state("dv_ow").dvs.isEmpty)
  }

  test("vectors apply to adopted root-level files (depth-1 rel names)") {
    // adopted legacy files sit DIRECTLY under the table root — their
    // manifest key is one segment, not the pool-dir/part-file two the
    // pool layout produces. The vectored scan must resolve the planned
    // path to that key exactly (a depth guess would silently skip the
    // vector and resurrect deleted rows).
    ensureDb()
    val loc = "file://" + Files.createTempDirectory("graft_dv_adopt_").toString
    spark.sql(s"CREATE TABLE gv.db.dv_adopt (id BIGINT, v STRING) USING manifest " +
      s"LOCATION '$loc' TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')")
    spark.sql("INSERT INTO gv.db.dv_adopt SELECT id, concat('p', id) FROM range(10)")
    // drop a legacy file at the root itself and adopt it
    val tmp = Files.createTempDirectory("graft_dv_legacy_").toString + "/out"
    spark.range(100, 110).selectExpr("id", "concat('L', id) AS v")
      .coalesce(1).write.parquet(s"file://$tmp")
    val src = new java.io.File(tmp).listFiles()
      .filter(_.getName.endsWith(".parquet")).head.toPath
    java.nio.file.Files.copy(src,
      new java.io.File(new java.net.URI(s"$loc/legacy-a.parquet")).toPath)
    assert(spark.sql("CALL gv.system.register_files('db.dv_adopt')")
      .head().getLong(1) === 1L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_adopt").head().getLong(0) === 20L)
    // DELETE rows living in the ADOPTED file -> vector keyed by the
    // one-segment name; the read must subtract them
    spark.sql("DELETE FROM gv.db.dv_adopt WHERE id IN (103, 107)")
    val st = ManifestTable.state(loc, ManifestTable.currentVersion(loc).get)
    assert(st.dvs.keySet === Set("legacy-a.parquet"), s"dv keys: ${st.dvs.keySet}")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_adopt").head().getLong(0) === 18L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_adopt WHERE id = 103")
      .head().getLong(0) === 0L, "deleted row resurrected — vector not applied")
  }

  test("merge-on-read DML on a WAP branch: vectors commit to the branch log") {
    morTable("dv_wap")
    // a main vector lands BEFORE the fork: the branch must inherit it
    spark.sql("DELETE FROM gv.db.dv_wap WHERE id = 1")
    assert(spark.sql("CALL gv.system.branch('db.dv_wap', 'stage')").head()
      .getLong(1) === 4L) // 3 inserts + 1 vector commit
    spark.conf.set(GraftCatalog.WapBranchConf, "stage")
    try {
      assert(spark.sql("SELECT count(*) FROM gv.db.dv_wap").head().getLong(0) === 29L,
        "branch must inherit the pre-fork vector")
      // branch-side merge-on-read DELETE: vector written under the shared
      // data root, marker in the BRANCH log only
      spark.sql("DELETE FROM gv.db.dv_wap WHERE id IN (5, 7)")
      assert(spark.sql("SELECT count(*) FROM gv.db.dv_wap").head().getLong(0) === 27L)
      val brSt = ManifestTable.branchState(dir("dv_wap"), "stage")
      assert(brSt.deletedRows === 3L, s"branch debt: ${brSt.deletedRows}")
    } finally spark.conf.unset(GraftCatalog.WapBranchConf)
    // main: only the pre-fork vector
    assert(state("dv_wap").deletedRows === 1L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_wap").head().getLong(0) === 29L)
    // publish carries the branch's vector changes onto main
    spark.sql("CALL gv.system.fast_forward('db.dv_wap', 'stage')")
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_wap").head().getLong(0) === 27L)
    assert(spark.sql("SELECT count(*) FROM gv.db.dv_wap WHERE id IN (1, 5, 7)")
      .head().getLong(0) === 0L, "published vectors must keep all deletes dead")
    assert(state("dv_wap").deletedRows === 3L)
  }

  test("vector binary round-trip and merge") {
    val fs = LakeStorage.openFor(root)
    DeletionVectors.write(fs, root, "t.dv", Array(1L, 5L, 9L))
    assert(DeletionVectors.read(fs, root, "t.dv").toSeq === Seq(1L, 5L, 9L))
    assert(DeletionVectors.merge(Array(1L, 3L), Array(2L, 3L, 8L)).toSeq ===
      Seq(1L, 2L, 3L, 8L))
    intercept[IllegalArgumentException] {
      DeletionVectors.write(fs, root, "bad.dv", Array(3L, 2L))
    }
  }
}
