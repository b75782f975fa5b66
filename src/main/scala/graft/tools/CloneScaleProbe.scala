package graft.tools

import org.apache.spark.sql.SparkSession

/** Deep-clone copy-throughput probe: demonstrates that the distributed
  * (Spark-job) copy path scales with cores while the driver pool is a
  * fixed-width funnel.
  *
  * Builds a manifest table of PROBE_FILES parquet pools (PROBE_MB each,
  * default 64 x 8 MB), then deep-clones it twice — once forced through
  * the driver pool (threshold = Long.Max) and once through the
  * distributed path (threshold = 0) — at each core count in PROBE_CORES
  * (default "4,16,32"), printing one JSON line per measurement:
  *   {"mode":"distributed","cores":32,"bytes":...,"sec":...,"mb_per_sec":...}
  *
  * Run: PROBE_CORES=4,32 sbt "runMain graft.tools.CloneScaleProbe"
  * Expected shape: distributed mb_per_sec grows with cores (until the
  * local disk saturates); driver-pool mb_per_sec is flat at its 16-thread
  * ceiling regardless of session cores — the 100 TB argument for the
  * distcp path in GraftCatalog.createDeepCloneTable.
  */
object CloneScaleProbe {
  def main(args: Array[String]): Unit = {
    val files = sys.env.getOrElse("PROBE_FILES", "64").toInt
    val mbPerFile = sys.env.getOrElse("PROBE_MB", "8").toInt
    val coreSteps = sys.env.getOrElse("PROBE_CORES", "4,16,32")
      .split(",").map(_.trim.toInt).toSeq

    for (cores <- coreSteps) {
      val spark = SparkSession.builder()
        .master(s"local[$cores]")
        .config("spark.sql.shuffle.partitions", cores)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      spark.sparkContext.setLogLevel("WARN")
      val root = "file://" + java.nio.file.Files
        .createTempDirectory("graft_clone_probe_").toString
      graft.catalog.GraftCatalog.register(spark, "gp", root)
      spark.sql("CREATE NAMESPACE IF NOT EXISTS gp.db")
      spark.sql("CREATE TABLE gp.db.src (id BIGINT, pad STRING) USING manifest")
      // ~mbPerFile MB per pool file: rows of ~1 KB pad, repartitioned so
      // each of the `files` partitions writes one pool
      val rowsPerFile = mbPerFile * 1024L
      spark.range(files * rowsPerFile)
        .selectExpr("id", "repeat(uuid(), 28) AS pad")
        .repartition(files)
        .writeTo("gp.db.src").append()

      for ((mode, threshold) <- Seq(
          ("driver-pool", Long.MaxValue.toString),
          ("distributed", "0"))) {
        spark.sql("DROP TABLE IF EXISTS gp.db.dst")
        spark.conf.set("spark.graft.clone.distributedThresholdBytes", threshold)
        val t0 = System.nanoTime()
        val row = spark.sql(
          "CALL gp.system.clone('db.src', 'db.dst', deep => true)")
          .collect().head
        val sec = (System.nanoTime() - t0) / 1e9
        spark.conf.unset("spark.graft.clone.distributedThresholdBytes")
        // detail column renders "deep(files=N, bytes=B)" — parse bytes out
        val bytes = "bytes=(\\d+)".r.findFirstMatchIn(row.getString(1))
          .map(_.group(1).toLong).getOrElse(0L)
        println(s"""{"mode":"$mode","cores":$cores,"files":$files,""" +
          s""""bytes":$bytes,"sec":${math.rint(sec * 1000) / 1000},""" +
          s""""mb_per_sec":${math.rint(bytes / 1048576.0 / sec * 10) / 10}}""")
      }
      spark.stop()
      org.apache.spark.sql.SparkSession.clearActiveSession()
      org.apache.spark.sql.SparkSession.clearDefaultSession()
    }
  }
}
