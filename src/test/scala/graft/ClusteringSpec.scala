package graft

import java.nio.file.Files

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Data clustering for scan efficiency: sorting on the filter column at
  * write time gives every parquet row group a narrow min/max range, so the
  * reader's predicate pushdown skips whole row groups — the single biggest
  * bytes-read lever at 100 TB after partition pruning (it is what
  * OPTIMIZE ... ZORDER approximates for one dimension). The spec MEASURES
  * the effect via the scan's numOutputRows metric: the same selective
  * filter over the same rows must emit far fewer rows from a clustered
  * scan than from a randomly-ordered one (rows in surviving row groups),
  * not just post-filter equally. */
class ClusteringSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    // write timestamps as INT64 micros: the INT96 legacy default carries
    // stats Spark's reader will not use for row-group pruning
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.01"

  /** Rows the (single) file scan emitted after row-group pruning. */
  private def scanOutputRows(df: org.apache.spark.sql.DataFrame): Long = {
    df.collect() // execute so metrics populate
    val executed = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val scans = executed.collect { case s: FileSourceScanExec => s }
    assert(scans.nonEmpty, s"no FileSourceScanExec in:\n$executed")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("sort-clustered write lets predicate pushdown skip row groups") {
    // cluster on a DATE column: the source's TIMESTAMP_NTZ type reaches the
    // plan's PushedFilters list but parquet predicate creation bails on NTZ,
    // so no row group is ever skipped (observed); INT32 dates push cleanly
    val base = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("ship_date"),
        col("l_quantity"), col("l_extendedprice"))
    val total = base.count()

    // small row groups so the file holds many (default 128 MiB would give
    // one group at this SF and nothing could be skipped)
    val clusteredDir = Files.createTempDirectory("graft_clustered_").toString
    base.sort("ship_date").coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(clusteredDir)
    val shuffledDir = Files.createTempDirectory("graft_shuffled_").toString
    // clustering destroyed: order by a hash of the key
    base.sort(xxhash64(col("l_orderkey"), col("ship_date"))).coalesce(1)
      .write.option("parquet.block.size", 64 * 1024)
      .mode("overwrite").parquet(shuffledDir)

    // typed literals: comparing against bare strings would wrap the COLUMN
    // in a cast and disable pushdown
    def monthScan(dir: String) = spark.read.parquet(dir)
      .filter(col("ship_date").between(
        lit(java.sql.Date.valueOf("1995-02-01")),
        lit(java.sql.Date.valueOf("1995-02-28"))))
    val clusteredRows = scanOutputRows(monthScan(clusteredDir))
    val shuffledRows = scanOutputRows(monthScan(shuffledDir))
    val matching = monthScan(clusteredDir).count()
    assert(matching === monthScan(shuffledDir).count()) // same query result

    // unclustered: every row group spans the full date range -> nothing
    // skipped, the scan emits (about) every row
    assert(shuffledRows > total / 2,
      s"expected ~no pruning on shuffled layout: $shuffledRows of $total")
    // clustered: only row groups overlapping the month survive
    assert(clusteredRows < total / 10,
      s"expected >90% of rows pruned on clustered layout: $clusteredRows of $total")
    assert(clusteredRows >= matching)
  }
}
