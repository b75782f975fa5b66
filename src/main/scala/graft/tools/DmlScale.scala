package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off scale probe for the row-level DML path: cost must track the
  * AFFECTED file set, not table size. Builds a manifest catalog table of
  * N pools, then times (a) a DELETE whose matches live in one pool vs
  * (b) a full-table UPDATE, and reports manifest evidence. */
object DmlScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("dml-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = "file://" + java.nio.file.Files.createTempDirectory("graft_dmlscale_").toString
    graft.catalog.GraftCatalog.register(spark, "gsc", root)
    spark.sql("CREATE NAMESPACE gsc.db")
    spark.sql("CREATE TABLE gsc.db.big (id BIGINT, grp BIGINT, v STRING) USING manifest")
    val pools = 20
    val rowsPerPool = 500000
    (0 until pools).foreach { p =>
      spark.range(p.toLong * rowsPerPool, (p + 1).toLong * rowsPerPool)
        .select(col("id"), (col("id") % 1000).as("grp"),
          sha1(col("id").cast("string")).as("v"))
        .repartition(4)
        .createOrReplaceTempView("batch")
      spark.sql("INSERT INTO gsc.db.big SELECT * FROM batch")
    }
    val dir = s"$root/db/big"
    def files(): Int = graft.core.ManifestTable.manifest(dir,
      graft.core.ManifestTable.currentVersion(dir).get).length
    val filesBefore = files()
    println(s"PROBE rows=${pools.toLong * rowsPerPool} files=$filesBefore")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // (a) selective DELETE: matches confined to pool 3's id range
    time("delete_one_pool") {
      spark.sql("DELETE FROM gsc.db.big WHERE id >= 1500000 AND id < 1501000")
    }
    val filesAfterDelete = files()
    println(s"PROBE files_after_delete=$filesAfterDelete (expect ~before: " +
      s"only pool-3 files rewritten)")
    // (b) group-based UPDATE touching one group spread over ALL pools
    time("update_one_group_all_pools") {
      spark.sql("UPDATE gsc.db.big SET v = 'x' WHERE grp = 7 AND length(v) > 0")
    }
    println(s"PROBE files_after_update=${files()}")
    val n = spark.sql("SELECT count(*) FROM gsc.db.big").head().getLong(0)
    println(s"PROBE final_rows=$n")
    spark.stop()
  }
}
