package graft.core

import org.apache.spark.sql.types._

/** Per-resource-type schemas for nested FHIR schema-on-read (SURVEY.md §1.3
  * / §7.5 "FHIR dynamic schema at scale"). The lake stores resource bodies
  * as raw JSON (one document per object — the reference's typed
  * `Binary`/`Resource` deserialization, DatalakeRetrieveService.kt:21,
  * DatalakePublishService.kt:52); queries parse them with an explicit
  * per-type `StructType` instead of schema inference, because at 100 TB:
  *
  *  - inference is a full extra pass over the data;
  *  - inferred schemas DRIFT run-to-run with the sample (a batch where no
  *    Patient has `identifier` infers a narrower struct and downstream
  *    references break);
  *  - an explicit schema makes drift HANDLING deterministic: unknown JSON
  *    fields are ignored, missing fields are null, and structurally broken
  *    documents land in the corrupt-record column instead of failing the
  *    scan — the three cases a long-lived lake actually sees.
  *
  * Schemas cover the projection the engine queries, not all of FHIR: adding
  * a field is a one-line change that never rewrites stored data
  * (schema-on-read).
  */
object FhirSchemas {

  /** Name of the corrupt-record column appended to every FHIR read. */
  val CorruptCol = "_corrupt"

  /** FHIR R4 Patient — identifiers, names (nested given array), flags. */
  val patient: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("active", BooleanType),
    StructField("birthDate", StringType),
    StructField("identifier", ArrayType(StructType(Seq(
      StructField("system", StringType),
      StructField("value", StringType))))),
    StructField("name", ArrayType(StructType(Seq(
      StructField("use", StringType),
      StructField("family", StringType),
      StructField("given", ArrayType(StringType))))))))

  /** FHIR R4 Location — the flat subset the reference's tests exercise. */
  val location: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("name", StringType),
    StructField("status", StringType)))

  /** FHIR R4 Binary metadata (content rides separately). */
  val binary: StructType = StructType(Seq(
    StructField("resourceType", StringType),
    StructField("id", StringType),
    StructField("contentType", StringType)))

  val byType: Map[String, StructType] = Map(
    "Patient" -> patient,
    "Location" -> location,
    "Binary" -> binary)

  /** The read schema: resource fields + the corrupt-record column (must be
    * part of the user-supplied schema for PERMISSIVE mode to populate it). */
  def readSchema(resourceType: String): StructType =
    byType(resourceType).add(StructField(CorruptCol, StringType))
}
