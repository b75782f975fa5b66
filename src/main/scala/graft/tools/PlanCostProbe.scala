package graft.tools

import org.apache.spark.sql.SparkSession

/** Where does a selective manifest query's time go at high file counts?
  * Separates log resolution, logical planning, physical planning, and
  * execution for a 1-file-matching query over an 800-file table. */
object PlanCostProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("plan-cost-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = "file://" + java.nio.file.Files.createTempDirectory("graft_plancost_").toString
    graft.catalog.GraftCatalog.register(spark, "gpc", root)
    spark.sql("CREATE NAMESPACE gpc.db")
    spark.sql("CREATE TABLE gpc.db.t (id BIGINT, v STRING) USING manifest")
    val pools = args.headOption.map(_.toInt).getOrElse(400)
    val rowsPerPool = 20000L
    (0 until pools).foreach { p =>
      spark.range(p * rowsPerPool, (p + 1) * rowsPerPool)
        .selectExpr("id", "sha1(cast(id as string)) AS v")
        .coalesce(2).createOrReplaceTempView("b")
      spark.sql("INSERT INTO gpc.db.t SELECT * FROM b")
    }
    val dir = s"$root/db/t"
    def t[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.3f s"); r
    }
    (1 to 3).foreach { i =>
      println(s"--- iteration $i ---")
      t("resolve_log") {
        graft.core.ManifestTable.manifestEntries(dir,
          graft.core.ManifestTable.currentVersion(dir).get)._1.length
      }
      val lo = (pools / 2) * rowsPerPool
      val df = t("analyze") {
        spark.sql(s"SELECT count(*) AS n FROM gpc.db.t WHERE id >= $lo AND id < ${lo + 1000}")
      }
      t("optimize") { df.queryExecution.optimizedPlan }
      val plan0 = t("physical_plan") { df.queryExecution.executedPlan }
      val plan = plan0 match {
        case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
          a.executedPlan
        case p => p
      }
      val scanFiles = plan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b.scan
      }.map {
        case ms: graft.catalog.ManifestStreamScan => ms.inner.fileIndex.inputFiles.length
        case ps: org.apache.spark.sql.execution.datasources.v2.parquet.ParquetScan =>
          ps.fileIndex.inputFiles.length
        case o => -1
      }
      println(s"PROBE planned_files=${scanFiles.mkString(",")}")
      t("execute") { df.head() }
      t("execute_again") { df.head() }
      t("full_scan_execute") {
        spark.sql("SELECT count(*) FROM gpc.db.t").head()
      }
    }
    spark.stop()
  }
}
