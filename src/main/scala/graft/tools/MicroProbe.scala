package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-op latency census with the bench session shape: what does ONE
  * trivial job cost, what does one tiny aggregate cost, where does a gate
  * like qa07 actually spend its seconds. Optimization-round diagnostics. */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.core.Tables.documents(spark, sfDir).cache()
    docs.count()

    def t(name: String)(f: => Unit): Unit = {
      (0 to 3).foreach { i =>
        val t0 = System.nanoTime()
        f
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"[micro] $name%-42s r$i ${ms}%8.1f ms")
      }
    }

    t("range(1e6).sum (job floor)") {
      spark.range(1000000L).agg(sum("id")).queryExecution.toRdd.count()
    }
    t("docs.count (cached scan)") {
      docs.groupBy().count().queryExecution.toRdd.count()
    }
    t("docs countDistinct(doc_id)") {
      docs.agg(countDistinct(col("doc_id"))).queryExecution.toRdd.count()
    }
    t("docs countDistinct(lang)") {
      docs.agg(countDistinct(col("lang"))).queryExecution.toRdd.count()
    }
    t("1x approx_cd(doc_id, 0.01)") {
      docs.agg(approx_count_distinct(col("doc_id"), 0.01))
        .queryExecution.toRdd.count()
    }
    t("1x approx_cd(doc_id, 0.05 default)") {
      docs.agg(approx_count_distinct(col("doc_id")))
        .queryExecution.toRdd.count()
    }
    t("4x approx_cd rsd=0.05") {
      docs.agg(approx_count_distinct(col("doc_id")),
        approx_count_distinct(col("lang")),
        approx_count_distinct(col("source")),
        approx_count_distinct(col("n_chars")))
        .queryExecution.toRdd.count()
    }
    t("range(5000) 1x approx_cd 0.01") {
      spark.range(5000).agg(approx_count_distinct(col("id"), 0.01))
        .queryExecution.toRdd.count()
    }
    t("docs approx profile (qa07 approx arm)") {
      graft.queries.AdvancedQueries.approxProfile(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    t("qa07 full") {
      graft.SparkEntry.queries("qa07_column_profile_approx")(spark, sfDir)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
