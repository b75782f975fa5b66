package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** `GENERATED ALWAYS AS (expr)` on manifest tables: compute-on-insert,
  * explicit-value validation, the row-level DML invariant, streaming
  * validation, DDL-time expression rejection, and the source-column
  * drop/rename guards. */
class GeneratedColumnSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gg", root)
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_generated_").toString

  private def ensureDb(): Unit =
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gg.db")

  private def messageChain(e: Throwable): String =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(10)
      .flatMap(t => Option(t.getMessage)).mkString(" | ")

  test("omitted/NULL values are computed; matching explicit values pass") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.t1 (v BIGINT, dbl BIGINT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest")
    spark.sql("INSERT INTO gg.db.t1 (v) VALUES (1), (2)")       // omitted
    spark.sql("INSERT INTO gg.db.t1 VALUES (3, NULL)")          // NULL
    spark.sql("INSERT INTO gg.db.t1 VALUES (4, 8)")             // explicit, correct
    val got = spark.sql("SELECT v, dbl FROM gg.db.t1 ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L), (3L, 6L), (4L, 8L)))
  }

  test("divergent explicit values fail the write before any commit") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.t2 (v BIGINT, dbl BIGINT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest")
    spark.sql("INSERT INTO gg.db.t2 VALUES (1, 2)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gg.db.t2 VALUES (5, 11)")
    }
    assert(messageChain(e).contains("generated column"), messageChain(e))
    assert(spark.table("gg.db.t2").count() == 1, "failed write must not commit")
  }

  test("UPDATE breaking the invariant fails; consistent UPDATE and DELETE work") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.t3 (v BIGINT, dbl BIGINT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest")
    spark.sql("INSERT INTO gg.db.t3 (v) VALUES (1), (2), (3)")
    // changing a source column without re-supplying the generated value
    // leaves a stale pair — the implicit check fails the rewrite
    val e = intercept[Exception] {
      spark.sql("UPDATE gg.db.t3 SET v = 10 WHERE v = 1")
    }
    assert(messageChain(e).contains(GeneratedColumns.CheckPrefix), messageChain(e))
    // the consistent update (both columns) passes
    spark.sql("UPDATE gg.db.t3 SET v = 10, dbl = 20 WHERE v = 1")
    // DELETE never writes new values
    spark.sql("DELETE FROM gg.db.t3 WHERE v = 2")
    val got = spark.sql("SELECT v, dbl FROM gg.db.t3 ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((3L, 6L), (10L, 20L)))
  }

  test("DDL rejects self/generated/identity references, wrong types, and " +
      "non-deterministic expressions") {
    ensureDb()
    def rejects(ddl: String, needle: String): Unit = {
      val e = intercept[Exception] { spark.sql(ddl) }
      assert(messageChain(e).toLowerCase.contains(needle.toLowerCase),
        s"expected '$needle' in: ${messageChain(e)}")
    }
    rejects("CREATE TABLE gg.db.bad1 (v BIGINT, g BIGINT GENERATED ALWAYS " +
      "AS (g + 1)) USING manifest", "cannot reference itself")
    rejects("CREATE TABLE gg.db.bad2 (v BIGINT, g1 BIGINT GENERATED ALWAYS " +
      "AS (v * 2), g2 BIGINT GENERATED ALWAYS AS (g1 + 1)) USING manifest",
      "another generated column")
    rejects("CREATE TABLE gg.db.bad3 (sk BIGINT GENERATED ALWAYS AS IDENTITY, " +
      "g BIGINT GENERATED ALWAYS AS (sk * 2)) USING manifest",
      "identity column")
    // type mismatch: Spark's own analyzer-side validation (armed by the
    // capability) rejects before the catalog's validate() even runs
    rejects("CREATE TABLE gg.db.bad4 (v BIGINT, g INT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest", "incompatible with column data type")
    rejects("CREATE TABLE gg.db.bad5 (v BIGINT, g DOUBLE GENERATED ALWAYS " +
      "AS (rand())) USING manifest", "deterministic")
  }

  test("source columns of a generation expression cannot be dropped or renamed") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.t4 (v BIGINT, w BIGINT, dbl BIGINT " +
      "GENERATED ALWAYS AS (v * 2)) USING manifest")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gg.db.t4 DROP COLUMN v")
    }
    assert(messageChain(e1).contains("generated column"), messageChain(e1))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gg.db.t4 RENAME COLUMN v TO vv")
    }
    assert(messageChain(e2).contains("generated column"), messageChain(e2))
    // non-source columns stay alterable
    spark.sql("ALTER TABLE gg.db.t4 RENAME COLUMN w TO ww")
    // and the generated column itself can be dropped (removes the contract)
    spark.sql("ALTER TABLE gg.db.t4 DROP COLUMN dbl")
    spark.sql("INSERT INTO gg.db.t4 VALUES (1, 1)")
    assert(spark.table("gg.db.t4").count() == 1)
  }

  test("user CHECK constraints cannot claim the reserved generated prefix") {
    ensureDb()
    val e = intercept[Exception] {
      spark.sql("CREATE TABLE gg.db.t5 (v BIGINT) USING manifest " +
        s"TBLPROPERTIES ('${Constraints.Prefix}${GeneratedColumns.CheckPrefix}x__'='v > 0')")
    }
    assert(messageChain(e).contains("reserved"), messageChain(e))
  }

  test("the expression survives the descriptor round-trip and validates " +
      "explicit MERGE inserts") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.t6 (k BIGINT, band STRING GENERATED ALWAYS " +
      "AS (CASE WHEN k >= 10 THEN 'big' ELSE 'small' END)) USING manifest")
    spark.sql("INSERT INTO gg.db.t6 (k) VALUES (1), (20)")
    spark.range(2).selectExpr("id + 20 AS k").createOrReplaceTempView("t6_src")
    // MERGE INSERT arm must supply the matching generated value explicitly
    spark.sql("""MERGE INTO gg.db.t6 t USING t6_src s ON t.k = s.k
      WHEN NOT MATCHED THEN INSERT (k, band) VALUES (s.k, 'big')""")
    val got = spark.sql("SELECT k, band FROM gg.db.t6 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((1L, "small"), (20L, "big"), (21L, "big")))
    // and a divergent MERGE insert fails loudly
    spark.range(1).selectExpr("id + 100 AS k").createOrReplaceTempView("t6_bad")
    val e = intercept[Exception] {
      spark.sql("""MERGE INTO gg.db.t6 t USING t6_bad s ON t.k = s.k
        WHEN NOT MATCHED THEN INSERT (k, band) VALUES (s.k, 'small')""")
    }
    // the copy-on-write MERGE writes its replacement batch through the
    // table's batch write (fill's message); merge-on-read arms go through
    // the delta writers (the implicit __generated_ check) — both loud
    assert(messageChain(e).contains("generated column") ||
      messageChain(e).contains(GeneratedColumns.CheckPrefix), messageChain(e))
  }

  test("SET TBLPROPERTIES adopts an expression onto a matching column; " +
      "future writes inherit the contract") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.a1 (v BIGINT, dbl BIGINT) USING manifest")
    spark.sql("INSERT INTO gg.db.a1 VALUES (1, 2), (2, 4)")
    spark.sql("ALTER TABLE gg.db.a1 SET TBLPROPERTIES " +
      "('graft.generated.dbl' = 'v * 2')")
    spark.sql("INSERT INTO gg.db.a1 (v) VALUES (3)") // computed now
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gg.db.a1 VALUES (5, 11)") // divergent: rejected
    }
    assert(messageChain(e).contains("generated column"), messageChain(e))
    val got = spark.sql("SELECT v, dbl FROM gg.db.a1 ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L), (3L, 6L)))
  }

  test("SET adoption is refused when rows diverge, on identity columns, " +
      "and on missing columns; UNSET demotes to plain") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.a2 (v BIGINT, w BIGINT, " +
      "sk BIGINT GENERATED ALWAYS AS IDENTITY) USING manifest")
    spark.sql("INSERT INTO gg.db.a2 VALUES (1, 2, NULL), (2, 5, NULL)")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE gg.db.a2 SET TBLPROPERTIES " +
        "('graft.generated.w' = 'v * 2')") // (2, 5) diverges
    }
    assert(messageChain(e1).contains("existing rows diverge"), messageChain(e1))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE gg.db.a2 SET TBLPROPERTIES " +
        "('graft.generated.sk' = 'v')")
    }
    assert(messageChain(e2).contains("identity"), messageChain(e2))
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE gg.db.a2 SET TBLPROPERTIES " +
        "('graft.generated.nope' = 'v')")
    }
    assert(messageChain(e3).contains("no such column"), messageChain(e3))
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE gg.db.a2 UNSET TBLPROPERTIES " +
        "('graft.generated.w')") // not generated
    }
    assert(messageChain(e4).contains("not a generated column"), messageChain(e4))
    // a real adopt-then-unset round trip
    spark.sql("CREATE TABLE gg.db.a3 (v BIGINT, dbl BIGINT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest")
    spark.sql("INSERT INTO gg.db.a3 (v) VALUES (1)")
    spark.sql("ALTER TABLE gg.db.a3 UNSET TBLPROPERTIES ('graft.generated.dbl')")
    spark.sql("INSERT INTO gg.db.a3 VALUES (5, 11)") // plain now: accepted
    assert(spark.table("gg.db.a3").count() == 2)
  }

  test("add_generated_column materializes over existing rows in one " +
      "rewrite; a re-CALL with the same expression is a no-op") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.a4 (v BIGINT) USING manifest")
    spark.sql("INSERT INTO gg.db.a4 SELECT id FROM range(100)")
    val r1 = spark.sql("CALL gg.system.add_generated_column(" +
      "'db.a4', 'trip', 'BIGINT', 'v * 3')").head()
    assert(r1.getBoolean(1), "first call must materialize")
    assert(spark.sql("SELECT count(*) FROM gg.db.a4 WHERE trip = v * 3")
      .head().getLong(0) == 100L)
    spark.sql("INSERT INTO gg.db.a4 (v) VALUES (1000)") // computed from now on
    assert(spark.sql("SELECT trip FROM gg.db.a4 WHERE v = 1000")
      .head().getLong(0) == 3000L)
    val r2 = spark.sql("CALL gg.system.add_generated_column(" +
      "'db.a4', 'trip', 'BIGINT', 'v * 3')").head()
    assert(!r2.getBoolean(1), "re-CALL with the same expression is a no-op")
    val e = intercept[Exception] {
      spark.sql("CALL gg.system.add_generated_column(" +
        "'db.a4', 'trip', 'BIGINT', 'v * 4')")
    }
    assert(messageChain(e).contains("already GENERATED"), messageChain(e))
  }

  test("renaming the generated column itself carries the expression and " +
      "the invariant to the new name") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.a7 (v BIGINT, dbl BIGINT GENERATED ALWAYS " +
      "AS (v * 2)) USING manifest")
    spark.sql("INSERT INTO gg.db.a7 (v) VALUES (1)")
    spark.sql("ALTER TABLE gg.db.a7 RENAME COLUMN dbl TO twice")
    spark.sql("INSERT INTO gg.db.a7 (v) VALUES (2)") // still computed
    val e = intercept[Exception] {
      spark.sql("INSERT INTO gg.db.a7 VALUES (5, 11)") // still validated
    }
    assert(messageChain(e).contains("generated column"), messageChain(e))
    val got = spark.sql("SELECT v, twice FROM gg.db.a7 ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L)))
  }

  test("add_generated_column refuses a pre-existing column with divergent " +
      "values but resumes over an all-NULL one") {
    ensureDb()
    spark.sql("CREATE TABLE gg.db.a5 (v BIGINT, d BIGINT) USING manifest")
    spark.sql("INSERT INTO gg.db.a5 VALUES (1, 99)")
    val e = intercept[Exception] {
      spark.sql("CALL gg.system.add_generated_column(" +
        "'db.a5', 'd', 'BIGINT', 'v * 2')")
    }
    assert(messageChain(e).contains("diverge"), messageChain(e))
    assert(spark.sql("SELECT d FROM gg.db.a5").head().getLong(0) == 99L,
      "a refused call must not overwrite user data")
    // the resume shape: column exists, values all NULL (a crash between
    // the ADD and the UPDATE steps leaves exactly this)
    spark.sql("CREATE TABLE gg.db.a6 (v BIGINT, d BIGINT) USING manifest")
    spark.sql("INSERT INTO gg.db.a6 VALUES (1, NULL), (2, NULL)")
    spark.sql("CALL gg.system.add_generated_column(" +
      "'db.a6', 'd', 'BIGINT', 'v * 2')")
    val got = spark.sql("SELECT v, d FROM gg.db.a6 ORDER BY v")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 2L), (2L, 4L)))
  }
}
