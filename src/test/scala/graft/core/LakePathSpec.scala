package graft.core

import java.net.URI
import java.time.LocalDate

import org.scalatest.funsuite.AnyFunSuite

/** Golden path-contract strings ported verbatim from the reference tests
  * (DatalakePublishServiceTest.kt:62-65, DatalakeRetrieveServiceTest.kt:179,
  * OCIClientTest.kt:244-254). */
class LakePathSpec extends AnyFunSuite {

  test("FHIR path: lowercased type, hive tenant, _date partition") {
    assert(LakePath.fhirPath("Location", "mockTenant", LocalDate.of(1990, 1, 3), "abc")
      === "ehr/location/fhir_tenant_id=mockTenant/_date=1990-01-03/abc.json")
  }

  test("Binary path: no date partition, 'Binary' NOT lowercased") {
    assert(LakePath.binaryPath("tenant", "12345")
      === "ehr/Binary/fhir_tenant_id=tenant/12345.json")
  }

  test("raw path: literal transaction_id dir, no extension") {
    assert(LakePath.rawPath("t", "uuid-1")
      === "raw_data_response/tenant_id=t/transaction_id/uuid-1")
  }

  test("full URL construction") {
    val cfg = LakeConfig(root = "file:///tmp", region = "us-phoenix-1",
      namespace = "ns", bucket = "bkt")
    assert(LakePath.fullUrl(cfg, "a/b.json")
      === "https://objectstorage.us-phoenix-1.oraclecloud.com/n/ns/b/bkt/o/a/b.json")
  }

  test("URL parse: valid single-segment") {
    assert(LakePath.bucketAndFile("https://objectstorage.r.oraclecloud.com/n/ns/b/bkt/o/f.json")
      === Some(("bkt", "f.json")))
  }

  test("URL parse: multi-segment names truncate to first segment (reference quirk)") {
    assert(LakePath.bucketAndFile("https://objectstorage.r.oraclecloud.com/n/ns/b/bkt/o/a/b/c")
      === Some(("bkt", "a")))
  }

  test("URL parse: malformed -> None without IO") {
    assert(LakePath.bucketAndFile("") === None)
    assert(LakePath.bucketAndFile("https://a.b.c.d/efg/hij/klm/nop") === None)
    assert(LakePath.bucketAndFile("https://objectstorage.r.oraclecloud.com/n/ns/b/bucket/o") === None)
    assert(LakePath.bucketAndFile(new URI("https://x/y")) === None)
  }
}
