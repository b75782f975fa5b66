package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Table CHECK constraints ([[Constraints]]): declaration-time validation,
  * enforcement on every write path (batch, CTAS, streaming epochs, CoW and
  * merge-on-read DML), NULL-passes semantics, atomic rejection, and the
  * schema-evolution guards. The happy-path lifecycle (create → insert →
  * ALTER add/validate → UPDATE → UNSET) is oracle-gated in qc45. */
class ConstraintSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gck", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gck.db")
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_check_").toString

  private def pfx = Constraints.Prefix

  test("declaration rejects unresolvable / non-boolean / non-deterministic / aggregate / subquery expressions") {
    def create(n: Int, sql: String): Throwable =
      intercept[Exception](spark.sql(
        s"CREATE TABLE gck.db.bad$n (id BIGINT, v STRING) USING manifest " +
          s"TBLPROPERTIES ('${pfx}c'='$sql')"))
    assert(create(1, "no_such_col > 0").getMessage.contains("does not resolve"))
    assert(create(2, "id + 1").getMessage.contains("must be BOOLEAN"))
    assert(create(3, "rand() > 0.5").getMessage.contains("deterministic"))
    assert(create(4, "max(id) > 0").getMessage != null) // aggregate: not row-level
    // window functions interpose a Window node whose synthesized attribute
    // would bind past the write schema — rejected at declaration, loudly
    assert(create(5, "row_number() over (order by id) > 0")
      .getMessage.contains("row-level"))
    // none of the failed CREATEs may leave a table behind
    assert(spark.sql("SHOW TABLES IN gck.db").where(col("tableName").startsWith("bad")).count() == 0)
  }

  test("violating batch insert aborts atomically; NULL passes; valid rows land") {
    spark.sql("CREATE TABLE gck.db.a1 (id BIGINT, n BIGINT) USING manifest " +
      s"TBLPROPERTIES ('${pfx}pos'='n > 0')")
    spark.sql("INSERT INTO gck.db.a1 VALUES (1, 10), (2, 20)")
    val e = intercept[Exception](spark.sql(
      "INSERT INTO gck.db.a1 SELECT id, id - 100 FROM range(5)"))
    assert(e.getMessage.contains("pos") || e.getCause != null)
    // nothing from the failed insert landed — not even its positive rows
    assert(spark.table("gck.db.a1").count() == 2)
    spark.sql("INSERT INTO gck.db.a1 VALUES (3, NULL)") // NULL passes
    assert(spark.table("gck.db.a1").count() == 3)
  }

  test("CTAS enforces constraints on the staged output") {
    val e = intercept[Exception](spark.sql(
      "CREATE TABLE gck.db.ctas1 USING manifest " +
        s"TBLPROPERTIES ('${pfx}pos'='n > 0') " +
        "AS SELECT id, id - 2 AS n FROM range(4)"))
    assert(e.getMessage != null)
    assert(spark.sql("SHOW TABLES IN gck.db").where(col("tableName") === "ctas1").count() == 0)
    spark.sql("CREATE TABLE gck.db.ctas2 USING manifest " +
      s"TBLPROPERTIES ('${pfx}pos'='n > 0') " +
      "AS SELECT id, id + 1 AS n FROM range(4)")
    assert(spark.table("gck.db.ctas2").count() == 4)
  }

  test("ALTER-time add validates existing rows and reports the violation") {
    spark.sql("CREATE TABLE gck.db.a2 (id BIGINT, n BIGINT) USING manifest")
    spark.sql("INSERT INTO gck.db.a2 VALUES (1, 5), (2, -1)")
    val e = intercept[Exception](spark.sql(
      s"ALTER TABLE gck.db.a2 SET TBLPROPERTIES ('${pfx}pos'='n > 0')"))
    assert(e.getMessage.contains("existing rows violate"))
    // the rejected constraint is NOT live: the violating shape still lands
    spark.sql("INSERT INTO gck.db.a2 VALUES (3, -7)")
    assert(spark.table("gck.db.a2").count() == 3)
    val eDrop = intercept[Exception](spark.sql(
      s"ALTER TABLE gck.db.a2 UNSET TBLPROPERTIES ('${pfx}pos')"))
    assert(eDrop.getMessage.contains("no CHECK constraint"))
  }

  test("merge-on-read DML validates inserted and updated rows") {
    spark.sql("CREATE TABLE gck.db.mor (id BIGINT, n BIGINT) USING manifest " +
      s"TBLPROPERTIES ('graft.dml.mode'='merge-on-read', '${pfx}pos'='n > 0')")
    spark.sql("INSERT INTO gck.db.mor VALUES (1, 5), (2, 6)")
    // vectored DELETE writes no rows: unconstrained by pos
    spark.sql("DELETE FROM gck.db.mor WHERE id = 2")
    assert(spark.table("gck.db.mor").count() == 1)
    // merge-on-read UPDATE = vector + re-insert: the re-insert validates
    val e = intercept[Exception](spark.sql(
      "UPDATE gck.db.mor SET n = -n WHERE id = 1"))
    assert(e.getMessage != null)
    assert(spark.table("gck.db.mor").select(sum("n")).head.getLong(0) == 5)
    // MERGE inserts validate too
    spark.range(3).selectExpr("id + 10 AS id", "id - 5 AS n")
      .createOrReplaceTempView("mor_src")
    val e2 = intercept[Exception](spark.sql(
      """MERGE INTO gck.db.mor t USING mor_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    assert(e2.getMessage != null)
    assert(spark.table("gck.db.mor").count() == 1)
  }

  test("streaming epochs validate rows before the epoch commits") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    spark.sql("CREATE TABLE gck.db.st (id BIGINT, n BIGINT) USING manifest " +
      s"TBLPROPERTIES ('${pfx}pos'='n > 0')")
    val mem = MemoryStream[(Long, Long)]
    val ckpt = Files.createTempDirectory("graft_check_st_").toString
    def run(): Unit = {
      val q = mem.toDF().toDF("id", "n").writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .toTable("gck.db.st")
      q.awaitTermination()
    }
    mem.addData((1L, 10L), (2L, 20L))
    run()
    assert(spark.table("gck.db.st").count() == 2)
    mem.addData((3L, -1L))
    val e = intercept[Exception](run())
    assert(e.getMessage != null)
    // the violating epoch never committed a version
    assert(spark.table("gck.db.st").count() == 2)
  }

  test("DROP/RENAME COLUMN refuse while a constraint references the column") {
    spark.sql("CREATE TABLE gck.db.rf (id BIGINT, n BIGINT, v STRING) USING manifest " +
      s"TBLPROPERTIES ('${pfx}pos'='n > 0')")
    val eDrop = intercept[Exception](spark.sql("ALTER TABLE gck.db.rf DROP COLUMN n"))
    assert(eDrop.getMessage.contains("CHECK constraint"))
    val eRen = intercept[Exception](spark.sql("ALTER TABLE gck.db.rf RENAME COLUMN n TO m"))
    assert(eRen.getMessage.contains("CHECK constraint"))
    // unreferenced columns still evolve freely
    spark.sql("ALTER TABLE gck.db.rf DROP COLUMN v")
    spark.sql("ALTER TABLE gck.db.rf RENAME COLUMN id TO id2")
    // and after dropping the constraint, the column is released
    spark.sql(s"ALTER TABLE gck.db.rf UNSET TBLPROPERTIES ('${pfx}pos')")
    spark.sql("ALTER TABLE gck.db.rf DROP COLUMN n")
    assert(spark.table("gck.db.rf").columns.toSeq == Seq("id2"))
  }

  test("constraints survive the descriptor round-trip and surface in properties") {
    spark.sql("CREATE TABLE gck.db.rt (id BIGINT) USING manifest " +
      s"TBLPROPERTIES ('${pfx}b'='id < 100', '${pfx}a'='id >= 0')")
    val props = spark.sql("SHOW TBLPROPERTIES gck.db.rt")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(props(s"${pfx}a") == "id >= 0")
    assert(props(s"${pfx}b") == "id < 100")
    // both enforce (name-sorted order, first failing one reports)
    val e = intercept[Exception](spark.sql("INSERT INTO gck.db.rt VALUES (-1)"))
    assert(e.getMessage != null)
    assert(spark.table("gck.db.rt").count() == 0)
  }

  test("register_files validates adopted rows against declared CHECK constraints") {
    // adoption is a write path like any other: foreign parquet that
    // violates a declared invariant must refuse BEFORE the commit, the
    // same contract INSERT/DML/streaming enforce (and ALTER-time ADD
    // validated for existing rows)
    val dir = "file://" + Files.createTempDirectory("graft_adopt_ck_").toString
    spark.sql(s"CREATE TABLE gck.db.ck_adopt (id BIGINT, n BIGINT) USING manifest " +
      s"LOCATION '$dir' TBLPROPERTIES ('${pfx}pos'='n > 0')")
    spark.sql("INSERT INTO gck.db.ck_adopt VALUES (1, 10)")
    // a violating external import (one negative row among valid ones)
    spark.range(5).selectExpr("id + 100 AS id", "id - 2 AS n")
      .coalesce(1).write.parquet(s"$dir/import_bad")
    val e2 = intercept[Exception](
      spark.sql("CALL gck.system.register_files('db.ck_adopt')").collect())
    assert(e2.getMessage.contains("pos"), s"wrong error: ${e2.getMessage}")
    assert(spark.table("gck.db.ck_adopt").count() == 1,
      "violating adoption must commit nothing")
    // clear the bad import; a clean one adopts
    val bad = new java.io.File(new java.net.URI(s"$dir/import_bad"))
    bad.listFiles().foreach(_.delete()); bad.delete()
    spark.range(5).selectExpr("id + 100 AS id", "id + 1 AS n")
      .coalesce(1).write.parquet(s"$dir/import_ok")
    val reg = spark.sql("CALL gck.system.register_files('db.ck_adopt')").head()
    assert(reg.getLong(1) === 1L, s"expected 1 adopted file, got $reg")
    assert(spark.table("gck.db.ck_adopt").count() == 6)
  }
}
