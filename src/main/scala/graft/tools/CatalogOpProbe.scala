package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-operation timing probe for the commit-bound catalog machinery —
  * runs qc30's op sequence (CREATE / INSERT / MoR DELETE / MoR UPDATE /
  * purge_deletes / scans) N times and prints each op's min seconds, so a
  * family-level bench regression can be attributed to a specific
  * operation instead of a whole gate. */
object CatalogOpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = sys.env.getOrElse("PROBE_ROUNDS", "3").toInt
    val spark = SparkSession.builder()
      .master(s"local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    graft.catalog.GraftCatalog.register(spark, "gp",
      graft.core.TempDirs.create("graft_probe_root_"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")
    graft.core.Tables.documents(spark, sfDir).createOrReplaceTempView("docs")
    spark.sql("SELECT count(*) FROM docs").collect() // warm the source

    val mins = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    def t(name: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      mins(name) = math.min(mins.getOrElse(name, Double.MaxValue), s)
    }
    (0 until rounds).foreach { r =>
      spark.sql("DROP TABLE IF EXISTS gp.db.mor")
      t("create")(spark.sql("CREATE TABLE gp.db.mor (doc_id BIGINT, " +
        "lang STRING, n_chars BIGINT) USING manifest " +
        "TBLPROPERTIES ('graft.dml.mode' = 'merge-on-read')"))
      t("insert1")(spark.sql("INSERT INTO gp.db.mor SELECT /*+ REPARTITION(4) */ " +
        "doc_id, lang, n_chars FROM docs WHERE doc_id < 150"))
      t("insert2")(spark.sql("INSERT INTO gp.db.mor SELECT /*+ REPARTITION(6) */ " +
        "doc_id, lang, n_chars FROM docs WHERE doc_id >= 150"))
      t("files_meta")(spark.sql("SELECT file FROM gp.db.mor.files").collect())
      t("delete_mor")(spark.sql("DELETE FROM gp.db.mor WHERE doc_id % 7 = 3"))
      t("detail_meta")(spark.sql("SELECT deleted_rows FROM gp.db.mor.detail").collect())
      t("update_mor")(spark.sql("UPDATE gp.db.mor SET n_chars = n_chars + 500 " +
        "WHERE lang = 'en'"))
      t("purge")(spark.sql("CALL gp.system.purge_deletes('db.mor')").collect())
      t("agg")(spark.sql("SELECT count(*), CAST(sum(n_chars) AS BIGINT) " +
        "FROM gp.db.mor").collect())
    }
    println("PROBE " + mins.map { case (k, v) => f"$k=$v%.3f" }.mkString(" "))
    spark.stop()
  }
}
