package graft.core

import java.time.format.DateTimeFormatter
import java.time.{LocalDate, LocalDateTime}
import java.util.UUID

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Dataset, SparkSession}

/** Bronze-layer publish surface (ref: DatalakePublishService.kt), re-expressed
  * as distributed Spark writes with the exact-filename document sink
  * (SURVEY.md §2 Part B "Exact-name document write").
  *
  * Scale design: rows are partitioned (capped at `publishPoolMax`, mirroring
  * the reference's min(10, n)-thread pool, ref :125-146) and each partition
  * opens ONE FileSystem handle for all of its writes (the reference's
  * dedicated-client-per-batch amortization, ref :63,104). Write results are
  * aggregated in the same single pass that performs the writes — no second
  * job, no driver-side row loop.
  *
  * Error contract preserved exactly, including ordering (SURVEY.md §7.4):
  *  1. any write failed       -> IllegalStateException("One or more writes to datalake failed")
  *  2. any resource lacked id -> IllegalStateException("Did not publish all FHIR resources ...")
  * Valid resources remain published even when the batch then throws; one
  * LocalDate.now() snapshot per batch (ref :60); empty input short-circuits
  * before any storage interaction (ref :56-59).
  */
class DatalakePublishService(
    cfg: LakeConfig,
    clock: () => LocalDate = () => LocalDate.now(),
    timeClock: () => LocalDateTime = () => LocalDateTime.now(),
    newTransactionId: () => String = () => UUID.randomUUID().toString)
    extends Serializable {

  import DatalakePublishService._

  /** Publish each FHIR envelope as one JSON document under
    * ehr/<type>/fhir_tenant_id=<t>/_date=<date>/<id>.json. */
  def publishFhirR4(spark: SparkSession, tenantId: String, resources: Seq[FhirEnvelope]): Unit = {
    if (resources.isEmpty) return // ref :56-59 — zero storage interaction
    import spark.implicits._
    val n = resources.size
    publishFhirR4(
      spark.createDataset(resources).repartition(math.min(cfg.publishPoolMax, n)),
      tenantId)
  }

  /** Dataset variant for large publishes: single distributed pass that
    * writes and aggregates (hadId, writeOk) counters. */
  def publishFhirR4(resources: Dataset[FhirEnvelope], tenantId: String): Unit = {
    val spark = resources.sparkSession
    if (resources.isEmpty) return
    val date = clock() // one snapshot per batch -> single _date (ref :60)
    import spark.implicits._
    val root = cfg.root
    val retryMs = cfg.retryDelayMs
    val outcomes: Dataset[(Boolean, Boolean)] = resources.mapPartitions { iter =>
      val fs = LakeStorage.openFor(root)
      iter.map { env =>
        if (env.id == null || env.id.isEmpty) (false, true) // filtered, ref :61
        else {
          val rel = LakePath.fhirPath(env.resourceType, tenantId, date, env.id)
          (true, LakeStorage.putWith(fs, new Path(root, rel), env.body, retryMs))
        }
      }
    }
    val (total, withId, allOk) = outcomes
      .toDF("had_id", "ok")
      .groupBy()
      .agg(
        org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1)),
        org.apache.spark.sql.functions.sum(org.apache.spark.sql.functions.col("had_id").cast("long")),
        org.apache.spark.sql.functions.min(org.apache.spark.sql.functions.col("ok")))
      .as[(Long, Long, Boolean)]
      .head()
    // Ordering matters: write-failure check precedes missing-id check
    // (ref :79 before :83); successfully written docs stay written.
    if (!allOk) throw new IllegalStateException(writeFailureMessage)
    if (withId < total) throw new IllegalStateException(missingIdMessage(tenantId))
  }

  /** Publish Binary payloads under ehr/Binary/fhir_tenant_id=<t>/<id>.json
    * (no date partition; "Binary" not lowercased, ref :100-120,148-153).
    * Empty input returns without any storage interaction — the reference has
    * no explicit short-circuit but its empty pool run uploads nothing, so
    * this is behaviorally equivalent (and required here: `reduce` on an
    * empty Dataset throws). */
  def publishBinaryData(spark: SparkSession, tenantId: String, binaries: Seq[(String, String)]): Unit = {
    if (binaries.isEmpty) return
    import spark.implicits._
    val root = cfg.root
    val retryMs = cfg.retryDelayMs
    val ds = spark.createDataset(binaries)
      .repartition(math.min(cfg.publishPoolMax, binaries.size))
    val allOk = ds.mapPartitions { iter =>
      val fs = LakeStorage.openFor(root)
      iter.map { case (id, body) =>
        LakeStorage.putWith(fs, new Path(root, LakePath.binaryPath(tenantId, id)), body, retryMs)
      }
    }.reduce(_ && _)
    if (!allOk) throw new IllegalStateException(writeFailureMessage)
  }

  /** Wrap a raw API response and publish it as a single object at
    * raw_data_response/tenant_id=<t>/transaction_id/<uuid>; returns the full
    * object URL (ref :169-196). */
  def publishRawData(tenantId: String, data: String, url: String): String = {
    val rel = LakePath.rawPath(tenantId, newTransactionId())
    val wrapped = rawJson(RawDataWrapper(
      url, timeClock().format(DateTimeFormatter.ISO_LOCAL_DATE_TIME), data))
    val storage = new LakeStorage(cfg.root, new org.apache.hadoop.conf.Configuration(), cfg.retryDelayMs)
    if (!storage.put(rel, wrapped))
      throw new IllegalStateException(rawFailureMessage) // ref :191-193
    LakePath.fullUrl(cfg, rel) // ref :195, OCIClient.kt:94-95
  }

  def getDatalakeFullURL(fileName: String): String = LakePath.fullUrl(cfg, fileName)
}

object DatalakePublishService {
  // Exact exception messages (FIXTURES.md §5; ref :80,:84-87,:192).
  val writeFailureMessage = "One or more writes to datalake failed"
  def missingIdMessage(tenantId: String): String =
    s"Did not publish all FHIR resources to datalake for tenant $tenantId: " +
      "Some resources lacked FHIR IDs. Errors were logged."
  val rawFailureMessage = "Raw data publication failed"

  /** RawDataWrapper JSON shape: {"url":...,"time":...,"body":...}
    * (ref :182-188,198). */
  def rawJson(w: RawDataWrapper): String = {
    def esc(s: String) = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    s"""{"url":"${esc(w.url)}","time":"${esc(w.time)}","body":"${esc(w.body)}"}"""
  }
}
