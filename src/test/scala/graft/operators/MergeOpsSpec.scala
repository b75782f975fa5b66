package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases for the lake merge operators (Upsert, Scd2) beyond the
  * oracle queries' happy paths. */
class MergeOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()
  import spark.implicits._

  test("upsert: empty update batch returns existing unchanged") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq.empty[(Long, String)].toDF("k", "v")
    val got = Upsert.upsert(existing, updates, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "b")))
  }

  test("upsert: all-new keys append, collisions replace") {
    val existing = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    val updates = Seq((2L, "B"), (3L, "c")).toDF("k", "v")
    val got = Upsert.upsert(existing, updates, Seq("k"))
      .as[(Long, String)].collect().toSet
    assert(got === Set((1L, "a"), (2L, "B"), (3L, "c")))
  }

  test("scd2: change closes the open version and appends a new one") {
    val current = Seq(
      (1L, "x", "2020-01-01", Option.empty[String]),         // open, will change
      (1L, "w", "2019-01-01", Some("2020-01-01")),           // already closed
      (2L, "y", "2020-01-01", Option.empty[String]))         // open, untouched
      .toDF("k", "v", "valid_from", "valid_to")
    val changes = Seq((1L, "X", "2024-06-01")).toDF("k", "v", "ts")
    val got = Scd2.applyChanges(current, changes, Seq("k"), "ts")
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(got === Set(
      (1L, "w", "2019-01-01", Some("2020-01-01")), // history untouched
      (1L, "x", "2020-01-01", Some("2024-06-01")), // closed by the change
      (1L, "X", "2024-06-01", None),               // new open version
      (2L, "y", "2020-01-01", None)))              // untouched open row
  }

  test("scd2: change for an unseen key just opens a first version") {
    val current = Seq((1L, "x", "2020-01-01", Option.empty[String]))
      .toDF("k", "v", "valid_from", "valid_to")
    val changes = Seq((9L, "new", "2024-06-01")).toDF("k", "v", "ts")
    val got = Scd2.applyChanges(current, changes, Seq("k"), "ts")
      .as[(Long, String, String, Option[String])].collect().toSet
    assert(got === Set(
      (1L, "x", "2020-01-01", None),
      (9L, "new", "2024-06-01", None)))
  }
}
