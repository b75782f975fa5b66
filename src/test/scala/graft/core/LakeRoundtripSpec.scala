package graft.core

import java.net.URI
import java.nio.file.Files
import java.time.{LocalDate, LocalDateTime}

import org.apache.hadoop.conf.Configuration
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Publish -> retrieve round-trips over a file:// lake, replacing the
  * reference's Testcontainers MockServer IT (DatalakePublishServiceIT.kt).
  * Error contracts per FIXTURES.md §5. */
class LakeRoundtripSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def freshLake(): (String, LakeConfig) = {
    val root = "file://" + Files.createTempDirectory("graft_spec_").toString
    (root, LakeConfig(root = root, retryDelayMs = 0L))
  }

  private val jan3_1990 = () => LocalDate.of(1990, 1, 3)

  test("publish FHIR writes golden paths and bodies round-trip") {
    val (root, cfg) = freshLake()
    val svc = new DatalakePublishService(cfg, clock = jan3_1990)
    val body = """{"resourceType":"Location","id":"abc","name":"Location1"}"""
    svc.publishFhirR4(spark, "mockTenant", Seq(FhirEnvelope("Location", "abc", body)))
    val storage = new LakeStorage(root, new Configuration())
    val expected = "ehr/location/fhir_tenant_id=mockTenant/_date=1990-01-03/abc.json"
    assert(storage.listRecursive() === Seq(expected))
    assert(storage.get(expected) === Some(body))
  }

  test("empty publish short-circuits without touching storage") {
    val (root, cfg) = freshLake()
    new DatalakePublishService(cfg).publishFhirR4(spark, "t", Seq.empty)
    assert(new LakeStorage(root, new Configuration()).listRecursive().isEmpty)
  }

  test("missing ids: valid rows published first, then exact throw") {
    val (root, cfg) = freshLake()
    val svc = new DatalakePublishService(cfg, clock = jan3_1990)
    val e = intercept[IllegalStateException] {
      svc.publishFhirR4(spark, "mockTenant", Seq(
        FhirEnvelope("Location", "ok", """{"id":"ok"}"""),
        FhirEnvelope("Location", "", """{}"""),
        FhirEnvelope("Location", null, """{}""")))
    }
    assert(e.getMessage ===
      "Did not publish all FHIR resources to datalake for tenant mockTenant: " +
        "Some resources lacked FHIR IDs. Errors were logged.")
    val storage = new LakeStorage(root, new Configuration())
    assert(storage.listRecursive() ===
      Seq("ehr/location/fhir_tenant_id=mockTenant/_date=1990-01-03/ok.json"))
  }

  test("single date snapshot per batch (one clock call)") {
    val (root, cfg) = freshLake()
    var calls = 0
    val svc = new DatalakePublishService(cfg, clock = () => { calls += 1; LocalDate.of(2024, 6, 1) })
    svc.publishFhirR4(spark, "t", (1 to 20).map(i =>
      FhirEnvelope("Patient", s"p$i", s"""{"id":"p$i"}""")))
    assert(calls === 1)
    val dates = new LakeStorage(root, new Configuration()).listRecursive()
      .map(p => p.split("/")(3)).distinct
    assert(dates === Seq("_date=2024-06-01"))
  }

  test("binary publish + keyed retrieval; missing keys dropped") {
    val (_, cfg) = freshLake()
    val svc = new DatalakePublishService(cfg)
    svc.publishBinaryData(spark, "tn", Seq(
      "b1" -> """{"resourceType":"Binary","id":"b1","contentType":"pdf","data":"AAA="}""",
      "b2" -> """{"resourceType":"Binary","id":"b2","contentType":"mp4"}"""))
    val ret = new DatalakeRetrieveService(cfg)
    assert(ret.retrieveBinaryData("tn", "b1")
      === Some(BinaryDoc("b1", Some("pdf"), Some("AAA="))))
    assert(ret.retrieveBinaryData("tn", "nope") === None)
    assert(ret.binaryExists("tn", "b2"))
    assert(!ret.binaryExists("tn", "nope"))
  }

  test("batch URL retrieval: inner-join semantics, malformed skipped without IO") {
    val (_, cfg) = freshLake()
    val svc = new DatalakePublishService(cfg)
    svc.publishBinaryData(spark, "tn", Seq("b1" -> """{"id":"b1","contentType":"pdf"}"""))
    // Binary lake paths contain '/', so the reference's single-segment URL
    // quirk (OCIClient.kt:252-256) truncates them -> not found. Publish a
    // single-segment object to exercise the happy path.
    val storage = new LakeStorage(cfg.root, new Configuration())
    storage.put("flat.json", """{"id":"flat","contentType":"text/json"}""")
    val ret = new DatalakeRetrieveService(cfg)
    val urls = Seq(
      new URI(LakePath.fullUrl(cfg, "flat.json")),
      new URI(LakePath.fullUrl(cfg, "missing.json")),
      new URI("https://a.b.c.d/efg/hij/klm/nop"))
    val got = ret.retrieveBinaryData(urls)
    assert(got.keySet === Set(urls.head))
    assert(got(urls.head).contentType === Some("text/json"))
  }

  test("raw publish returns full URL and wraps payload") {
    val (_, cfg) = freshLake()
    val svc = new DatalakePublishService(cfg,
      timeClock = () => LocalDateTime.of(1990, 1, 3, 10, 15, 30),
      newTransactionId = () => "tx1")
    val url = svc.publishRawData("tn", "the body", "https://src.example/x")
    assert(url === LakePath.fullUrl(cfg, "raw_data_response/tenant_id=tn/transaction_id/tx1"))
    val stored = new DatalakeRetrieveService(cfg)
      .getObjectBody("raw_data_response/tenant_id=tn/transaction_id/tx1")
    assert(stored ===
      Some("""{"url":"https://src.example/x","time":"1990-01-03T10:15:30","body":"the body"}"""))
  }

  test("registry (secondary bucket) reads resolve against their own root") {
    val (_, cfg) = freshLake()
    val reg = new LakeStorage(cfg.resolvedRegistryRoot, new Configuration())
    reg.put("manifest.json", """{"version":3}""")
    val ret = new DatalakeRetrieveService(cfg)
    assert(ret.getObjectFromRegistry("manifest.json") === Some("""{"version":3}"""))
    assert(ret.getObjectFromRegistry("missing.json") === None)
    // registry objects are NOT visible through the primary root
    assert(ret.getObjectBody("manifest.json") === None)
  }

  test("put retries once then returns false on persistent IO failure (A21)") {
    val (root, cfg) = freshLake()
    val storage = new LakeStorage(root, new Configuration(), retryDelayMs = 0L)
    // make the parent path a FILE so create() throws IOException
    assert(storage.put("blocker", "x"))
    val t0 = System.nanoTime()
    assert(!storage.put("blocker/child.json", "y"))
    assert((System.nanoTime() - t0) / 1e9 < 5.0) // retryDelayMs honored (0)
    // status/metadata fetch (A24)
    assert(storage.status("blocker").exists(_.getLen === 1))
    assert(storage.status("nope") === None)
    // byte-stream variant (A20)
    assert(storage.putBytes("bin.dat", Array[Byte](1, 2, 3)))
    assert(storage.status("bin.dat").exists(_.getLen === 3))
  }

  test("LakeReader preserves multi-line (pretty-printed) document bodies") {
    val (_, cfg) = freshLake()
    val pretty = "{\n  \"resourceType\": \"Patient\",\n  \"id\": \"p1\"\n}"
    new DatalakePublishService(cfg, clock = jan3_1990)
      .publishFhirR4(spark, "t1", Seq(FhirEnvelope("Patient", "p1", pretty)))
    val rows = LakeReader.readFhir(spark, cfg, "Patient").select("body").collect()
    assert(rows.length === 1, "one row per OBJECT, not per line")
    assert(rows.head.getString(0) === pretty)
  }

  test("LakeReader prunes by tenant and recovers partition columns") {
    val (_, cfg) = freshLake()
    def pub(tenant: String, day: Int, ids: Seq[String]): Unit =
      new DatalakePublishService(cfg, clock = () => LocalDate.of(2024, 2, day))
        .publishFhirR4(spark, tenant, ids.map(id =>
          FhirEnvelope("Patient", id, s"""{"resourceType":"Patient","id":"$id"}""")))
    pub("t1", 1, Seq("a", "b"))
    pub("t2", 1, Seq("c"))
    val df = LakeReader.readFhir(spark, cfg, "Patient", tenant = Some("t1"))
    val rows = df.select("fhir_tenant_id", "_date").distinct().collect()
    assert(rows.length === 1)
    assert(rows.head.getString(0) === "t1")
    assert(rows.head.getString(1) === "2024-02-01")
    assert(df.count() === 2)
  }
}
