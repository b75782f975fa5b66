package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale probe for merge-on-read vs copy-on-write row-level DML: the
  * claim under test is that a selective DELETE's cost tracks the DELETED
  * ROW COUNT (vector bytes) under merge-on-read, while copy-on-write
  * pays the full size of every file holding a match — and that the
  * read-side vector tax and the purge cost stay proportional to the
  * vectored files. Builds twin tables (same data, one per mode), runs
  * the same DML on both, times DML / scan-after / purge, and prints the
  * manifest evidence. */
object DvScale {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("dv-scale")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    val root = "file://" + java.nio.file.Files.createTempDirectory("graft_dvscale_").toString
    graft.catalog.GraftCatalog.register(spark, "gdv", root)
    spark.sql("CREATE NAMESPACE gdv.db")
    val pools = 20
    val rowsPerPool = 500000
    def build(table: String, props: String): Unit = {
      spark.sql(s"CREATE TABLE gdv.db.$table (id BIGINT, grp BIGINT, v STRING) " +
        s"USING manifest $props")
      (0 until pools).foreach { p =>
        spark.range(p.toLong * rowsPerPool, (p + 1).toLong * rowsPerPool)
          .select(col("id"), (col("id") % 1000).as("grp"),
            sha1(col("id").cast("string")).as("v"))
          .repartition(4)
          .createOrReplaceTempView("batch")
        spark.sql(s"INSERT INTO gdv.db.$table SELECT * FROM batch")
      }
    }
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"PROBE $label ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def files(table: String): Int = {
      val dir = s"$root/db/$table"
      graft.core.ManifestTable.manifest(dir,
        graft.core.ManifestTable.currentVersion(dir).get).length
    }
    time("build_cow")(build("cow", ""))
    time("build_mor")(build("mor", "TBLPROPERTIES ('graft.dml.mode'='merge-on-read')"))
    println(s"PROBE rows=${pools.toLong * rowsPerPool} files=${files("cow")}")

    // (a) RANGE delete: matches confined to one pool's id range — the
    // delta scan's pushed-condition stats pruning should plan ~4 of 80
    // files, and the vector write touches only those
    for (t <- Seq("cow", "mor")) {
      time(s"delete_one_range_$t") {
        spark.sql(s"DELETE FROM gdv.db.$t WHERE id >= 1500000 AND id < 1501000")
      }
      println(s"PROBE files_after_range_delete_$t=${files(t)}")
    }
    // (b) SCATTERED delete: one group = 0.1% of rows, spread over EVERY
    // file — copy-on-write's worst case (all files rewrite), vectors'
    // best case (10k positions across 80 small sidecars)
    for (t <- Seq("cow", "mor")) {
      time(s"delete_scattered_$t") {
        spark.sql(s"DELETE FROM gdv.db.$t WHERE grp = 7")
      }
      println(s"PROBE files_after_delete_$t=${files(t)}")
      time(s"count_after_delete_$t") {
        println(s"PROBE rows_after_$t=" +
          spark.sql(s"SELECT count(*) FROM gdv.db.$t").head().getLong(0))
      }
      time(s"agg_after_delete_$t") {
        spark.sql(s"SELECT grp, count(*) FROM gdv.db.$t WHERE grp < 100 GROUP BY grp")
          .collect()
      }
    }
    // debt collection: purge rewrites the vectored files once
    time("purge_mor") {
      val r = spark.sql("CALL gdv.system.purge_deletes('db.mor')").head()
      println(s"PROBE purged files=${r.getLong(0)} positions=${r.getLong(1)}")
    }
    time("count_after_purge_mor") {
      println("PROBE rows_after_purge=" +
        spark.sql("SELECT count(*) FROM gdv.db.mor").head().getLong(0))
    }
    spark.stop()
  }
}
