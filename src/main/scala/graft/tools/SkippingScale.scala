package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe for manifest data skipping: a selective query's
  * cost must track the MATCHING file set, not the table's file count.
  * Builds a manifest catalog table of N disjoint-range pools at two
  * scales (N and 10N files, same per-file size), then times a narrow
  * range query three ways:
  *   - stats on (normal): planning prunes to the matching files;
  *   - stats stripped from the log (legacy-marker simulation): every
  *     file is planned, parquet row-group stats still skip inside;
  *   - full scan (no filter): the unprunable baseline.
  * Expectation: the stats-on selective query is near-FLAT across the 10×
  * file-count jump, stats-off grows with the file count (it must open
  * every footer), full scan grows ~10×. Usage:
  * `sbt "runMain graft.tools.SkippingScale [nPools]"`. */
object SkippingScale {
  def main(args: Array[String]): Unit = {
    val basePools = args.headOption.map(_.toInt).getOrElse(40)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("skipping-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = "file://" + java.nio.file.Files.createTempDirectory("graft_skipscale_").toString
    graft.catalog.GraftCatalog.register(spark, "gsk", root)
    spark.sql("CREATE NAMESPACE gsk.db")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    def med(f: => Long): (Long, Double) = {
      val runs = (1 to 3).map(_ => time(f))
      (runs.head._1, runs.map(_._2).sorted.apply(1))
    }

    Seq(basePools, basePools * 10).foreach { pools =>
      val t = s"t$pools"
      spark.sql(s"CREATE TABLE gsk.db.$t (id BIGINT, grp BIGINT, v STRING) USING manifest")
      val rowsPerPool = 100000L
      (0 until pools).foreach { p =>
        spark.range(p * rowsPerPool, (p + 1) * rowsPerPool)
          .select(col("id"), (col("id") % 1000).as("grp"),
            sha1(col("id").cast("string")).as("v"))
          .coalesce(2)
          .createOrReplaceTempView("batch")
        spark.sql(s"INSERT INTO gsk.db.$t SELECT * FROM batch")
      }
      val dir = s"$root/db/$t"
      val head = graft.core.ManifestTable.currentVersion(dir).get
      val nFiles = graft.core.ManifestTable.manifest(dir, head).length
      // the narrow query: one pool's range, ~0.2 pools wide
      val lo = (pools / 2) * rowsPerPool
      val hi = lo + rowsPerPool / 5
      val q = s"SELECT count(*) AS n, sum(grp) AS s FROM gsk.db.$t " +
        s"WHERE id >= $lo AND id < $hi"
      def run(): Long = spark.sql(q).head().getLong(0)
      val (n1, statsOn) = med(run())

      // strip stats: rewrite every marker & checkpoint without "st"/tabs
      // (exactly what a legacy-format log looks like)
      val fs = graft.core.LakeStorage.openFor(dir)
      fs.listStatus(new org.apache.hadoop.fs.Path(dir)).foreach { st =>
        val name = st.getPath.getName
        def rewrite(txt: String): Unit = {
          fs.delete(st.getPath, false)
          val out = fs.create(st.getPath, true)
          try out.write(txt.getBytes("UTF-8")) finally out.close()
        }
        if (name.startsWith("_commit_")) {
          val in = fs.open(st.getPath)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          import org.json4s.jackson.JsonMethods
          JsonMethods.parse(txt) match {
            case o: org.json4s.JObject =>
              rewrite(JsonMethods.compact(JsonMethods.render(
                org.json4s.JObject(o.obj.filterNot(_._1 == "st")))))
            case _ => ()
          }
        } else if (name.startsWith("_ckpt_")) {
          val in = fs.open(st.getPath)
          val txt = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
          rewrite(txt.split("\n", -1).map(_.takeWhile(_ != '\t')).mkString("\n"))
        }
      }
      val (n2, statsOff) = med(run())
      require(n1 == n2, s"stripping stats changed the answer: $n1 vs $n2")
      val (_, full) = med(
        spark.sql(s"SELECT count(*) FROM gsk.db.$t WHERE grp >= 0").head().getLong(0))
      println(f"PROBE pools=$pools files=$nFiles rows=${pools * rowsPerPool} " +
        f"selective_stats_on=$statsOn%.2fs selective_stats_off=$statsOff%.2fs " +
        f"full_scan=$full%.2fs matched_rows=$n1")
    }
    spark.stop()
  }
}
