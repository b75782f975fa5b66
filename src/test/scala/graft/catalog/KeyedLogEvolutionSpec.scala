package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Keyedlog `ALTER TABLE ... ADD COLUMNS` (schema drift on the keyed
  * document store): null-fill of pre-drift lines, the extra-value line
  * codec (tabs, empty strings, nulls), rewrite paths carrying extras,
  * change-feed width, and the DDL guards that mirror the manifest rules. */
class KeyedLogEvolutionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gkev", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_klev_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gkev.db")

  private def messageChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")

  test("pre-drift lines read NULL for added columns; new writes carry them") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t1 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gkev.db.t1 VALUES ('a', 1, 10), ('b', 2, 20)")
    spark.sql("ALTER TABLE gkev.db.t1 ADD COLUMNS (tag STRING, n BIGINT)")
    spark.sql("INSERT INTO gkev.db.t1 VALUES ('c', 3, 30, 'x', 7)")
    val rows = spark.sql(
      "SELECT key, tag, n FROM gkev.db.t1 ORDER BY key").collect()
    assert(rows.map(r => (r.getString(0), r.isNullAt(1), r.isNullAt(2))).toSeq ==
      Seq(("a", true, true), ("b", true, true), ("c", false, false)))
    assert(rows.last.getString(1) == "x" && rows.last.getLong(2) == 7L)
  }

  test("the extra codec round-trips tabs, newlines, empty strings, and nulls") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t2 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("ALTER TABLE gkev.db.t2 ADD COLUMNS (tag STRING)")
    spark.sql("INSERT INTO gkev.db.t2 VALUES " +
      "('a', 1, 1, concat('x', chr(9), 'y')), " +  // embedded tab
      "('b', 2, 2, concat('p', chr(10), 'q')), " + // embedded newline
      "('c', 3, 3, ''), " +                        // empty string stays empty
      "('d', 4, 4, NULL), " +                      // real null
      "('e', 5, 5, '\\\\N')")                      // a literal backslash-N STRING
    val got = spark.sql("SELECT key, tag FROM gkev.db.t2 ORDER BY key")
      .collect().map(r => (r.getString(0), if (r.isNullAt(1)) null else r.getString(1)))
    assert(got.toSeq == Seq(("a", "x\ty"), ("b", "p\nq"), ("c", ""),
      ("d", null), ("e", "\\N")))
  }

  test("UPDATE and compaction rewrite the full declared width") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t3 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gkev.db.t3 VALUES ('a', 1, 10)")
    spark.sql("ALTER TABLE gkev.db.t3 ADD COLUMNS (tag STRING)")
    spark.sql("INSERT INTO gkev.db.t3 VALUES ('a', 2, 20, 'keep')")
    spark.sql("UPDATE gkev.db.t3 SET metric = metric + 100 WHERE seq = 2")
    spark.sql("CALL gkev.system.compact('db.t3')")
    val got = spark.sql("SELECT seq, metric, tag FROM gkev.db.t3 ORDER BY seq")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(2)) null else r.getString(2)))
    assert(got.toSeq == Seq((1L, 10L, null), (2L, 120L, "keep")),
      s"extras must survive both rewrite paths: ${got.toSeq}")
  }

  test("the change feed serves the drifted width") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t4 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("INSERT INTO gkev.db.t4 VALUES ('a', 1, 10)")       // v0
    spark.sql("ALTER TABLE gkev.db.t4 ADD COLUMNS (tag STRING)")
    spark.sql("INSERT INTO gkev.db.t4 VALUES ('b', 2, 20, 'x')")  // v1
    val got = spark.read.option("start_version", "-1")
      .table("gkev.db.t4.changes")
      .selectExpr("key", "tag", "_change_type")
      .collect().map(r => (r.getString(0),
        if (r.isNullAt(1)) null else r.getString(1), r.getString(2))).toSet
    assert(got == Set(("a", null, "insert"), ("b", "x", "insert")))
  }

  test("DDL guards: non-nullable, defaults, bad types, drops, renames") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t5 (key STRING, seq BIGINT, metric BIGINT) " +
      "USING keyedlog")
    spark.sql("ALTER TABLE gkev.db.t5 ADD COLUMNS (tag STRING)")
    def rejects(ddl: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(messageChain(e).toLowerCase.contains(needle.toLowerCase),
        s"expected '$needle' in: ${messageChain(e)}")
    }
    rejects("ALTER TABLE gkev.db.t5 ADD COLUMNS (bad BIGINT NOT NULL)", "nullable")
    rejects("ALTER TABLE gkev.db.t5 ADD COLUMNS (bad BIGINT DEFAULT 7)", "DEFAULT")
    rejects("ALTER TABLE gkev.db.t5 ADD COLUMNS (bad DOUBLE)", "STRING or BIGINT")
    rejects("ALTER TABLE gkev.db.t5 DROP COLUMN tag", "ADD COLUMNS only")
    rejects("ALTER TABLE gkev.db.t5 RENAME COLUMN tag TO tag2", "ADD COLUMNS only")
    rejects("ALTER TABLE gkev.db.t5 ADD COLUMNS (tag STRING)", "already exists")
    // underscore names are the reserved metadata namespace — an extra
    // named _klfile would shadow the row-level group column
    rejects("ALTER TABLE gkev.db.t5 ADD COLUMNS (_klfile STRING)", "reserved")
  }

  test("the core prefix is stored canonically nullable (a NOT NULL lie " +
      "would let the optimizer fold wrong answers)") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t8 (key STRING NOT NULL, seq BIGINT, " +
      "metric BIGINT, tag STRING) USING keyedlog")
    assert(spark.table("gkev.db.t8").schema.fields.forall(_.nullable),
      spark.table("gkev.db.t8").schema.treeString)
    // the format really does write null keys — the declared schema must
    // admit what reads can produce
    spark.sql("INSERT INTO gkev.db.t8 VALUES (NULL, 1, 1, 'x')")
    assert(spark.sql("SELECT count(*) FROM gkev.db.t8 WHERE key IS NULL")
      .head().getLong(0) == 1L)
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gkev.db.t9 (key STRING, seq BIGINT, " +
        "metric BIGINT, _change_type STRING) USING keyedlog")
    }
    assert(messageChain(e).contains("reserved"), messageChain(e))
  }

  test("CREATE TABLE with extras up front; core prefix enforced") {
    ensureDb()
    spark.sql("CREATE TABLE gkev.db.t6 (key STRING, seq BIGINT, metric BIGINT, " +
      "tag STRING, n BIGINT) USING keyedlog")
    spark.sql("INSERT INTO gkev.db.t6 VALUES ('a', 1, 1, 'x', 5)")
    assert(spark.sql("SELECT tag FROM gkev.db.t6").head().getString(0) == "x")
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gkev.db.t7 (wrong STRING, seq BIGINT) USING keyedlog")
    }
    assert(messageChain(e).contains("fixed core"), messageChain(e))
  }
}
