package graft.tools

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` of selected SparkEntry queries to files —
  * the optimization round's plan evidence (plans/r15/<name>_<tag>.txt).
  *
  * args: <sfDir> <outDir> <tag> <nameSubstring>[,<nameSubstring>...]
  *
  * Builds each query's DataFrame exactly as Bench does (same master/conf
  * shape) and writes the formatted physical plan. Queries whose builders
  * are EAGER (streams, catalog DML) run their machinery during the build;
  * their explain is that of the final result relation — still recorded,
  * but plan-shape analysis of those gates lives in their operator code.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, tag, filters) = args.take(4)
    val wanted = filters.split(",").map(_.trim).filter(_.nonEmpty)
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
    new java.io.File(outDir).mkdirs()
    val sel = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => wanted.exists(n.contains) }
    sel.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        System.err.println(s"[plandump] wrote $name")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] $name failed: ${e.getMessage}")
      }
      (spark +: graft.queries.QueryModule.trackedSessions).foreach { sess =>
        sess.streams.active.foreach { q => try q.stop() catch { case _: Throwable => () } }
      }
    }
    spark.stop()
  }
}
