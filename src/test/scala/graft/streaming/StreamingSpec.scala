package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.scalatest.funsuite.AnyFunSuite

/** Event-time streaming semantics driven by MemoryStream (not wall clock):
  * late-data handling under watermarks and arbitrary stateful processing
  * with flatMapGroupsWithState (SURVEY.md §2 Part B "Streaming"). */
class StreamingSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermark drops late data beyond the threshold (append windows)") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "v")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("wm_out").start()
    try {
      input.addData((ts("2024-01-01 10:01:00"), 1L), (ts("2024-01-01 10:05:00"), 2L))
      q.processAllAvailable()
      // advance event time far enough to close the 10:00 window
      input.addData((ts("2024-01-01 10:31:00"), 3L))
      q.processAllAvailable()
      // this event is > watermark behind: must be DROPPED
      input.addData((ts("2024-01-01 10:02:00"), 99L))
      q.processAllAvailable()
      // close everything out
      input.addData((ts("2024-01-01 11:30:00"), 4L))
      q.processAllAvailable()
      val rows = spark.table("wm_out")
        .select(col("window.start").cast("string"), col("n"))
        .as[(String, Long)].collect().toMap
      assert(rows("2024-01-01 10:00:00") === 2L) // late row not counted
    } finally q.stop()
  }

  test("flatMapGroupsWithState: running per-user event count with state") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val counted = input.toDS()
      .groupByKey(_._1)
      .flatMapGroupsWithState[Long, (Long, Long)](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, events: Iterator[(Long, String)], state: GroupState[Long]) =>
          val prev = state.getOption.getOrElse(0L)
          val total = prev + events.size
          state.update(total)
          Iterator((user, total))
      }
    val q = counted.toDF("user_id", "running_n").writeStream
      .outputMode(OutputMode.Append).format("memory").queryName("fmgs_out").start()
    try {
      input.addData((1L, "a"), (1L, "b"), (2L, "x"))
      q.processAllAvailable()
      input.addData((1L, "c"))
      q.processAllAvailable()
      val rows = spark.table("fmgs_out")
        .as[(Long, Long)].collect().toSet
      assert(rows.contains((1L, 2L)) && rows.contains((2L, 1L)) && rows.contains((1L, 3L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark dedups across batches inside the window") {
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val dedup = input.toDF().toDF("ts", "id")
      .withWatermark("ts", "30 minutes")
      .dropDuplicatesWithinWatermark(Seq("id"))
    val q = dedup.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("ddw_out").start()
    try {
      input.addData((ts("2024-01-01 10:00:00"), 1L))
      q.processAllAvailable()
      input.addData((ts("2024-01-01 10:05:00"), 1L)) // dup within watermark
      input.addData((ts("2024-01-01 10:06:00"), 2L))
      q.processAllAvailable()
      val n = spark.table("ddw_out").count()
      assert(n === 2L) // the duplicate id=1 was suppressed
    } finally q.stop()
  }

  test("session append mode emits a session ending EXACTLY at the watermark (<= boundary)") {
    // qs11's oracle encodes session_end <= watermark; this is the probe
    // that established <= over < — keep it as the regression guard
    import spark.implicits._
    implicit val sql = spark.sqlContext
    val input = MemoryStream[(Timestamp, Long)]
    val agg = input.toDF().toDF("ts", "uid")
      .withWatermark("ts", "1 hour")
      .groupBy(session_window(col("ts"), "30 minutes"), col("uid"))
      .agg(count(lit(1)).as("n"))
    val q = agg.writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("sb_out").start()
    try {
      // session A: one event at 10:00 -> end 10:30
      input.addData((ts("2024-01-01 10:00:00"), 1L)); q.processAllAvailable()
      // next event advances the watermark to exactly 10:30
      input.addData((ts("2024-01-01 11:30:00"), 2L)); q.processAllAvailable()
      val emitted = spark.table("sb_out")
        .select(col("uid"), col("session_window.end").cast("string"))
        .as[(Long, String)].collect().toSeq
      assert(emitted === Seq((1L, "2024-01-01 10:30:00")))
    } finally q.stop()
  }

  test("RocksDB state store: stateful agg across batches matches the default provider") {
    // The large-state production path: HDFSBackedStateStore keeps every
    // key's state on the executor heap — a 100 TB corpus's dedup/session
    // state does not fit. RocksDBStateStoreProvider spills to local disk
    // with bounded memory; results must be identical.
    import spark.implicits._

    def runCounts(provider: Option[String], sinkName: String): Map[Long, Long] = {
      val fresh = spark.newSession()
      provider.foreach(p =>
        fresh.conf.set("spark.sql.streaming.stateStore.providerClass", p))
      implicit val freshCtx: org.apache.spark.sql.SQLContext = fresh.sqlContext
      val input = MemoryStream[(Long, Long)]
      val agg = input.toDF().toDF("k", "v")
        .groupBy("k").agg(sum("v").as("total"))
      val q = agg.writeStream.outputMode(OutputMode.Complete)
        .format("memory").queryName(sinkName).start()
      try {
        // three separate batches so state genuinely persists/merges
        input.addData((1L, 10L), (2L, 20L)); q.processAllAvailable()
        input.addData((1L, 5L), (3L, 7L)); q.processAllAvailable()
        input.addData((2L, 1L), (3L, 2L), (1L, 1L)); q.processAllAvailable()
        fresh.table(sinkName).as[(Long, Long)].collect().toMap
      } finally q.stop()
    }

    val rocks = runCounts(
      Some("org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"),
      "rocks_out")
    val default = runCounts(None, "default_out")
    val expected = Map(1L -> 16L, 2L -> 21L, 3L -> 9L)
    assert(rocks === expected)
    assert(default === expected)
  }
}
