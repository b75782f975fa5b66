package graft.core

/** Core data model of the lake engine.
  *
  * Mirrors the reference's abstractions (SURVEY.md §1.1):
  *  - FHIR resources travel as envelopes of (resourceType, id, canonical-JSON
  *    body) — full bodies stay schema-on-read
  *    (ref: DatalakePublishService.kt:52,66-67).
  *  - RawDataWrapper is the only record type the reference defines itself
  *    (ref: DatalakePublishService.kt:198).
  *  - Binary documents hold id/contentType/base64 data
  *    (ref: DatalakeRetrieveService.kt:18-39).
  */
final case class FhirEnvelope(resourceType: String, id: String, body: String)

final case class RawDataWrapper(url: String, time: String, body: String)

final case class BinaryDoc(
    id: String,
    contentType: Option[String],
    data: Option[String])

/** Engine configuration mirroring the reference's `@Value` surface
  * (ref: OCIClient.kt:29-44, DatalakePublishService.kt:29-30), re-expressed
  * for a Hadoop-FileSystem-backed lake. `root` is any Hadoop FS URI
  * (file:///... locally; an object-store connector URI on a cluster).
  */
final case class LakeConfig(
    root: String,
    region: String = "us-phoenix-1",
    namespace: String = "namespace",
    bucket: String = "datalake",
    registryBucket: String = "infx-shared",
    /** Secondary root for registry/manifest reads (the reference's
      * `infx-shared` bucket, ref: OCIClient.kt:39-40,78-80). Defaults to a
      * sibling of `root`. */
    registryRoot: Option[String] = None,
    publishPoolMax: Int = 10,
    retryDelayMs: Long = 5000L) {
  def resolvedRegistryRoot: String = registryRoot.getOrElse(s"$root-registry")
}
