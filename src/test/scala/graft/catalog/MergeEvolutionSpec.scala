package graft.catalog

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `MERGE INTO ... WITH SCHEMA EVOLUTION` (Spark 4's analyzer computes the
  * source−target column diff as TableChange.AddColumn and routes it through
  * [[GraftCatalog.alterTable]] before planning the row-level write): the
  * target gains the source's new columns mid-MERGE, matched rows update
  * them, pre-evolution rows read NULL, and the plain MERGE (no evolution
  * clause) keeps rejecting unknown columns. */
class MergeEvolutionSpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    GraftCatalog.register(s, "gm", root)
    s.sql("CREATE NAMESPACE IF NOT EXISTS gm.db")
    s
  }
  private lazy val root =
    "file://" + Files.createTempDirectory("graft_mergevo_").toString

  test("WITH SCHEMA EVOLUTION adds the source's new column; plain MERGE refuses it") {
    spark.sql("CREATE TABLE gm.db.t1 (id BIGINT, v STRING) USING manifest")
    spark.sql("INSERT INTO gm.db.t1 VALUES (1, 'a'), (2, 'b')")
    spark.range(2).selectExpr("id + 2 AS id", "'s' AS v", "id * 10 AS extra")
      .createOrReplaceTempView("mev_src")
    // without the clause: the unknown column must NOT silently evolve
    val e = intercept[Exception](spark.sql(
      """MERGE INTO gm.db.t1 t USING mev_src s ON t.id = s.id
        |WHEN NOT MATCHED THEN INSERT (id, v, extra) VALUES (s.id, s.v, s.extra)""".stripMargin))
    assert(e.getMessage != null)
    assert(spark.table("gm.db.t1").columns.toSeq == Seq("id", "v"))
    // with the clause: target evolves, new rows carry extra, old rows NULL
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gm.db.t1 t USING mev_src s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *
        |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.table("gm.db.t1").columns.toSeq == Seq("id", "v", "extra"))
    val rows = spark.table("gm.db.t1").orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(rows == Seq((1L, "a", None), (2L, "s", Some(0L)),
      (3L, "s", Some(10L))))
  }

  test("evolution composes with UPDATE SET * on matched rows and keeps field ids") {
    spark.sql("CREATE TABLE gm.db.t2 (id BIGINT, n BIGINT) USING manifest")
    spark.sql("INSERT INTO gm.db.t2 SELECT id, id FROM range(4)")
    spark.range(4).selectExpr("id", "id + 100 AS n", "CAST(id AS STRING) AS tag")
      .createOrReplaceTempView("mev_src2")
    spark.sql(
      """MERGE WITH SCHEMA EVOLUTION INTO gm.db.t2 t USING mev_src2 s ON t.id = s.id
        |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
    // every row rewrote with the evolved schema populated
    assert(spark.table("gm.db.t2").where(col("tag").isNull).count() == 0)
    assert(spark.table("gm.db.t2").select(sum("n")).head.getLong(0) == 406)
    // the evolved column rides column mapping: RENAME works on it
    spark.sql("ALTER TABLE gm.db.t2 RENAME COLUMN tag TO label")
    assert(spark.table("gm.db.t2").where(col("label") === "3").count() == 1)
  }
}
