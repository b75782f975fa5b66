package graft

import graft.core.Tables
import graft.operators.{AsOfJoin, RangeJoin}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed co-located joins (SURVEY.md §2: "repartition/bucketing for
  * co-located joins") and operator edge cases. */
class BucketingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("bucketed tables join with no shuffle exchange on either side") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      Seq("li_bucketed", "ord_bucketed").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        // the in-memory catalog of a fresh JVM doesn't know about leftover
        // managed-table dirs from previous runs — remove them on disk
        def rm(f: java.io.File): Unit = {
          if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
          f.delete(): Unit
        }
        rm(new java.io.File(s"spark-warehouse/$t"))
      }
      Tables.lineitem(spark, sf).select("l_orderkey", "l_quantity")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed").join(spark.table("ord_bucketed"),
        col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("asOf with empty right side: all left rows survive with null values") {
    import spark.implicits._
    val left = Seq((1L, 10L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("event_id", "user_id", "ts")
    val right = Seq.empty[(Long, java.sql.Timestamp, Long, Double)]
      .toDF("user_id", "rts", "rid", "rvalue")
    val got = AsOfJoin.asOf(left, right, "user_id", "ts", "rts",
      Seq("rvalue"), Some("rid"))
    assert(got.count() === 1)
    assert(got.select("asof_rvalue").head().isNullAt(0))
  }

  test("range join with empty right side returns no rows, no failure") {
    import spark.implicits._
    val l = Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")))
      .toDF("l_id", "l_ts")
    val r = Seq.empty[(Long, java.sql.Timestamp)].toDF("r_id", "r_ts")
    assert(RangeJoin.timeWindowJoin(l, r, "l_ts", "r_ts", 300L).count() === 0)
  }

  test("LakeReader date pruning composes with tenant pruning") {
    import java.time.LocalDate
    import graft.core._
    val root = "file://" + java.nio.file.Files.createTempDirectory("graft_lr_").toString
    val cfg = LakeConfig(root = root, retryDelayMs = 0L)
    def pub(day: Int, ids: Seq[String]): Unit =
      new DatalakePublishService(cfg, clock = () => LocalDate.of(2024, 3, day))
        .publishFhirR4(spark, "t1", ids.map(id =>
          FhirEnvelope("Observation", id, s"""{"id":"$id"}""")))
    pub(1, Seq("a", "b")); pub(2, Seq("c"))
    val df = LakeReader.readFhir(spark, cfg, "Observation",
      tenant = Some("t1"), date = Some("2024-03-02"))
    assert(df.count() === 1)
    // empty result for unknown tenant keeps the schema
    val empty = LakeReader.readFhir(spark, cfg, "Observation", tenant = Some("nope"))
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("body", "fhir_tenant_id", "_date"))
  }
}
