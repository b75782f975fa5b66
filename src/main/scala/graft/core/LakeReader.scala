package graft.core

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Partition-pruned scans over the bronze lake layout.
  *
  * The reference's `_date=<iso>` partition directory starts with '_', which
  * Spark's file index treats as hidden — naive `spark.read.json(root)`
  * silently sees nothing (SURVEY.md §7.5). This reader keeps the golden path
  * contract AND Spark-visible scans by doing its own partition discovery:
  * list leaf files via the FileSystem, prune by tenant/date BEFORE the scan
  * (list-level partition pruning — only matching files are ever opened),
  * then recover the partition columns from `input_file_name()`.
  *
  * At cluster scale the listing is a cheap metadata walk of only the
  * requested resourceType subtree, and the data scan reads only pruned
  * files — equivalent to Hive-style partition pruning.
  */
object LakeReader {

  /** Read FHIR documents of one resourceType; optional tenant/date pruning.
    * Returns columns: body (raw JSON) + fhir_tenant_id + _date + any
    * `schema` fields parsed from the body. */
  def readFhir(
      spark: SparkSession,
      cfg: LakeConfig,
      resourceType: String,
      tenant: Option[String] = None,
      date: Option[String] = None,
      bodySchema: Option[StructType] = None): DataFrame = {
    val storage = new LakeStorage(cfg.root, new Configuration(), cfg.retryDelayMs)
    val prefix = s"ehr/${resourceType.toLowerCase}"
    val files = storage.listRecursive(prefix)
      .filter(p => tenant.forall(t => p.contains(s"fhir_tenant_id=$t/")))
      .filter(p => date.forall(dt => p.contains(s"_date=$dt/")))
      .map(rel => s"${cfg.root}/$rel")
    if (files.isEmpty) {
      return emptyResult(spark, bodySchema)
    }
    // wholetext: one row per OBJECT (the publish contract is one document
    // per file) — line-based reading would shred pretty-printed JSON bodies
    val raw = spark.read.option("wholetext", "true").text(files: _*)
      .withColumnRenamed("value", "body")
      .withColumn("_path", input_file_name())
      .withColumn("fhir_tenant_id",
        regexp_extract(col("_path"), "fhir_tenant_id=([^/]+)", 1))
      .withColumn("_date", regexp_extract(col("_path"), "_date=([^/]+)", 1))
      .drop("_path")
    // PERMISSIVE + corrupt-record column: a structurally broken document
    // parses to a struct with only FhirSchemas.CorruptCol set (the raw
    // text) instead of failing the scan or silently nulling — include the
    // column in the schema (FhirSchemas.readSchema) to capture it
    bodySchema.fold(raw)(s => raw.withColumn("doc", from_json(col("body"), s,
      Map("columnNameOfCorruptRecord" -> FhirSchemas.CorruptCol))))
  }

  private def emptyResult(spark: SparkSession, bodySchema: Option[StructType]): DataFrame = {
    import org.apache.spark.sql.types._
    val base = StructType(Seq(
      StructField("body", StringType),
      StructField("fhir_tenant_id", StringType),
      StructField("_date", StringType)))
    val full = bodySchema.fold(base)(s => base.add(StructField("doc", s)))
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], full)
  }
}
