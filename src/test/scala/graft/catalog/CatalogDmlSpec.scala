package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.core.ManifestTable

/** SQL row-level DML on manifest tables: DELETE FROM (both the
  * filter-translated fast path and the group-based plan), UPDATE, and
  * MERGE INTO — plus the scale property that makes copy-on-write viable:
  * only files holding affected rows are rewritten, everything else is
  * re-listed in the new manifest untouched. */
class CatalogDmlSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gd", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_catalog_dml_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gd.db")

  private def tableDir(t: String): String = s"$root/db/$t"

  private def currentFiles(t: String): Set[String] = {
    val dir = tableDir(t)
    ManifestTable.manifest(dir, ManifestTable.currentVersion(dir).get).toSet
  }

  /** Three separate INSERTs → three pools with disjoint id ranges. */
  private def threePoolTable(t: String): (Set[String], Set[String]) = {
    ensureDb()
    spark.sql(s"CREATE TABLE gd.db.$t (id BIGINT, v STRING) USING manifest")
    spark.sql(s"INSERT INTO gd.db.$t SELECT id, concat('a', id) FROM range(0, 10)")
    val afterFirst = currentFiles(t)
    spark.sql(s"INSERT INTO gd.db.$t SELECT id, concat('b', id) FROM range(10, 20)")
    spark.sql(s"INSERT INTO gd.db.$t SELECT id, concat('c', id) FROM range(20, 30)")
    (afterFirst, currentFiles(t))
  }

  test("translatable DELETE takes the fast path, rewrites only matching files") {
    val (pool1, before) = threePoolTable("del_gran")
    val laterPools = before -- pool1 // files of inserts 2 and 3
    val sql = "DELETE FROM gd.db.del_gran WHERE id <= 8 AND v LIKE 'a%'"
    val explained = spark.sql(s"EXPLAIN $sql").head().getString(0)
    assert(explained.contains("DeleteFromTable") && !explained.contains("ReplaceData"),
      s"fully-translatable DELETE should use the metadata-delete fast path:\n$explained")
    spark.sql(sql) // deletes a0..a8
    assert(spark.sql("SELECT count(*) FROM gd.db.del_gran").head().getLong(0) === 21L)
    assert(spark.sql("SELECT min(id) FROM gd.db.del_gran").head().getLong(0) === 9L)
    val after = currentFiles("del_gran")
    assert(laterPools.subsetOf(after),
      s"files without matches must survive untouched:\nbefore=$before\nafter=$after")
    assert((after -- before).nonEmpty, "the rewrite must add new files")
    assert(!pool1.subsetOf(after), "affected files must be replaced")
  }

  test("fast-path DELETE with != over a column containing NULLs keeps the NULL rows") {
    ensureDb()
    spark.sql("CREATE TABLE gd.db.del_null (id BIGINT, a BIGINT) USING manifest")
    spark.sql("INSERT INTO gd.db.del_null VALUES (1, 5), (2, 7), (3, NULL), (4, NULL)")
    // Catalyst pushes a != 5 as Not(EqualTo(a, 5)); SQL three-valued logic
    // says a IS NULL rows are NOT matched (condition is NULL, not TRUE),
    // so they must SURVIVE — on the metadata fast path exactly as on the
    // group-based plan
    val sql = "DELETE FROM gd.db.del_null WHERE a != 5"
    val explained = spark.sql(s"EXPLAIN $sql").head().getString(0)
    assert(explained.contains("DeleteFromTable") && !explained.contains("ReplaceData"),
      s"Not(EqualTo) should stay on the metadata fast path:\n$explained")
    spark.sql(sql) // deletes only id=2 (a=7); id=1 (a=5) and the NULLs stay
    val left = spark.sql("SELECT id FROM gd.db.del_null ORDER BY id")
      .collect().map(_.getLong(0))
    assert(left === Array(1L, 3L, 4L),
      "a != 5 must not delete a IS NULL rows (three-valued NOT)")
  }

  test("DELETE with a non-translatable predicate (group-based plan) is exact") {
    val (_, before) = threePoolTable("del_group")
    // length(v) is not a source filter -> group-based ReplaceData path
    val sql = "DELETE FROM gd.db.del_group WHERE length(v) = 2 AND substr(v, 1, 1) = 'a'"
    val explained = spark.sql(s"EXPLAIN $sql").head().getString(0)
    assert(explained.contains("ReplaceData"),
      s"non-translatable DELETE should take the group-based plan:\n$explained")
    spark.sql(sql)
    // deletes a0..a9 (2-char 'a'-prefixed): ids 0..9
    assert(spark.sql("SELECT count(*) FROM gd.db.del_group").head().getLong(0) === 20L)
    assert(spark.sql("SELECT min(id) FROM gd.db.del_group").head().getLong(0) === 10L)
    assert(currentFiles("del_group") != before)
  }

  test("runtime group filtering narrows the group-based rewrite to affected files") {
    val (pool1, before) = threePoolTable("upd_gran")
    val laterPools = before -- pool1
    // id = 25 lives in the third pool only; the condition is kept out of
    // the source-filter path by the expression on v
    spark.sql("UPDATE gd.db.upd_gran SET v = upper(v) WHERE id = 25 AND length(v) > 0")
    val rows = spark.sql("SELECT v FROM gd.db.upd_gran WHERE id IN (5, 25) ORDER BY id")
      .collect().map(_.getString(0))
    assert(rows === Array("a5", "C25"))
    val after = currentFiles("upd_gran")
    assert(pool1.subsetOf(after),
      s"pool 1 holds no matching rows and must survive the UPDATE:\nafter=$after")
    assert((laterPools -- after).nonEmpty, "the affected file must be replaced")
  }

  test("UPDATE with no WHERE rewrites every row") {
    ensureDb()
    spark.sql("CREATE TABLE gd.db.upd_all (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gd.db.upd_all VALUES (1, 'x'), (2, 'y')")
    spark.sql("UPDATE gd.db.upd_all SET v = concat(v, '!')")
    assert(spark.sql("SELECT v FROM gd.db.upd_all ORDER BY id").collect()
      .map(_.getString(0)).toSeq === Seq("x!", "y!"))
  }

  test("MERGE INTO: matched update, matched delete, not-matched insert") {
    ensureDb()
    spark.sql("CREATE TABLE gd.db.m (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gd.db.m VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    spark.sql(
      """MERGE INTO gd.db.m t
        |USING (SELECT * FROM VALUES (2L, 'B'), (3L, CAST(NULL AS STRING)), (4L, 'D') AS s(id, nv)) s
        |ON t.id = s.id
        |WHEN MATCHED AND s.nv IS NULL THEN DELETE
        |WHEN MATCHED THEN UPDATE SET v = s.nv
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin)
    assert(spark.sql("SELECT id, v FROM gd.db.m ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (4L, "D")))
  }

  test("insert-only MERGE appends without touching existing files") {
    ensureDb()
    spark.sql("CREATE TABLE gd.db.mi (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gd.db.mi VALUES (1, 'a')")
    val before = currentFiles("mi")
    spark.sql(
      """MERGE INTO gd.db.mi t
        |USING (SELECT * FROM VALUES (1L, 'dup'), (9L, 'new') AS s(id, nv)) s
        |ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.nv)""".stripMargin)
    assert(spark.sql("SELECT id, v FROM gd.db.mi ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (9L, "new")))
    assert(before.subsetOf(currentFiles("mi")),
      "insert-only merge must append, not rewrite")
  }

  test("DELETE FROM without WHERE empties the table, keeps it writable") {
    ensureDb()
    spark.sql("CREATE TABLE gd.db.trunc (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gd.db.trunc VALUES (1, 'x')")
    spark.sql("DELETE FROM gd.db.trunc")
    assert(spark.sql("SELECT count(*) FROM gd.db.trunc").head().getLong(0) === 0L)
    assert(spark.table("gd.db.trunc").schema.map(_.name) === Seq("id", "v"))
    spark.sql("INSERT INTO gd.db.trunc VALUES (2, 'y')")
    assert(spark.sql("SELECT count(*) FROM gd.db.trunc").head().getLong(0) === 1L)
  }

  test("commitRewrite rebases over concurrent appends and aborts when stale") {
    import spark.implicits._
    val dir = "file://" + Files.createTempDirectory("graft_rewrite_").toString
    ManifestTable.write(Seq((1L, "a")).toDF("id", "v"), dir)
    val v1Files = ManifestTable.manifest(dir, ManifestTable.currentVersion(dir).get)
    // concurrent append lands between the rewrite's read and its commit
    ManifestTable.append(Seq((2L, "b")).toDF("id", "v"), dir)
    val appended =
      ManifestTable.manifest(dir, ManifestTable.currentVersion(dir).get)
        .filterNot(v1Files.contains)
    val pool = ManifestTable.stagePool(Seq((1L, "A")).toDF("id", "v"), dir)
    ManifestTable.commitRewrite(dir, removed = v1Files, added = pool)
    val now = ManifestTable.manifest(dir, ManifestTable.currentVersion(dir).get)
    assert(appended.forall(now.contains), "concurrent append must be carried over")
    assert(v1Files.forall(f => !now.contains(f)), "rewritten files must drop out")
    // a second rewrite of the SAME (now vanished) files read stale data
    intercept[java.util.ConcurrentModificationException](
      ManifestTable.commitRewrite(dir, removed = v1Files, added = Seq.empty))
  }
}
