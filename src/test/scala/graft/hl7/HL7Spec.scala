package graft.hl7

import graft.queries.HL7Corpus
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The reference's 8-case corpus (hl7/HL7UtilsTest.kt:7-106) + property
  * tests: anything not matching the MSH grammar yields None. */
class HL7Spec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val r = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(r.passed, r.status.toString)
  }

  test("corpus: cases 1-7 malformed -> None, case 8 -> MDM/T02") {
    val results = HL7Corpus.cases.map { case (i, msg) => i -> HL7.msh9(msg) }.toMap
    (1 to 7).foreach(i => assert(results(i) === None, s"case $i"))
    assert(results(8) === Some(("MDM", "T02")))
  }

  test("null input -> None") {
    assert(HL7.msh9(null) === None)
  }

  test("trailing empty components survive (Kotlin split parity): MDM^^^^") {
    // length 7, '^' first at index 3, everything after empty -> ("MDM", "")
    assert(HL7.msh9("MSH|^~\\&|a|b|c|d|e||MDM^^^^|x|T|2.7") === Some(("MDM", "")))
  }

  test("MSH mid-string is honored (indexOf semantics)") {
    val msg = "garbage MSH|^~\\&|a|b|c|d|e||XYZ^Q99|f|g|h"
    assert(HL7.msh9(msg) === Some(("XYZ", "Q99")))
  }

  test("property: messages without 'MSH' never parse") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      s.contains("MSH") || HL7.msh9(s).isEmpty
    })
  }

  test("property: fewer than 10 pipe fields never parse") {
    val few = for {
      n <- Gen.choose(0, 7)
      fields <- Gen.listOfN(n, Gen.alphaNumStr)
    } yield "MSH|^" + fields.mkString("|")
    check(Prop.forAll(few) { s =>
      s.split("\\|", 10).length >= 10 || HL7.msh9(s).isEmpty
    })
  }

  test("property: MSH-9 not of form XXX^YYY is rejected") {
    val badField9 = Gen.alphaNumStr
      .suchThat(f => !(f.length == 7 && f.indexOf('^') == 3))
      .map(f => s"MSH|^~\\&|a|b|c|d|e||$f|rest|x|y")
    check(Prop.forAll(badField9) { s => HL7.msh9(s).isEmpty })
  }

  test("property: well-formed XXX^YYY always parses") {
    val alpha3 = Gen.listOfN(3, Gen.alphaUpperChar).map(_.mkString)
    val good = for { t <- alpha3; e <- alpha3 } yield
      (t, e, s"MSH|^~\\&|a|b|c|d|e||$t^$e|rest|x|y")
    check(Prop.forAll(good) { case (t, e, s) => HL7.msh9(s).contains((t, e)) })
  }

  test("native expression pipeline == JVM/UDF implementation on random input") {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val rnd = new scala.util.Random(99)
    val seps = "|^~&#!".toCharArray
    // adversarial mix: corpus cases, random printable noise, near-valid
    // messages with random separators and random MSH offsets
    val msgs: Seq[String] = HL7Corpus.cases.map(_._2) ++
      (1 to 300).map(_ => rnd.alphanumeric.take(rnd.nextInt(40)).mkString) ++
      (1 to 300).map { _ =>
        val s1 = seps(rnd.nextInt(seps.length)); val s2 = seps(rnd.nextInt(seps.length))
        val pre = if (rnd.nextBoolean()) "junk " else ""
        val f9 = rnd.alphanumeric.take(rnd.nextInt(9)).mkString
        pre + s"MSH$s1$s2~\\&" + (1 to 8).map(_ => s1).mkString + f9 +
          s1 + "rest" + s1 + "x"
      }
    val df = msgs.zipWithIndex.map { case (m, i) => (i.toLong, m) }.toDF("id", "msg")
    val native = df.select(col("id"), HL7.msh9Native(col("msg")).as("m"))
      .select(col("id"), col("m.msg_type"), col("m.msg_event"))
      .as[(Long, Option[String], Option[String])].collect()
      .map { case (k, t, e) => k -> ((t, e)) }.toMap
    msgs.zipWithIndex.foreach { case (m, i) =>
      val expect = HL7.msh9(m) match {
        case Some((t, e)) => (Some(t), Some(e))
        case None         => (None, None)
      }
      assert(native(i.toLong) === expect, s"mismatch on: <$m>")
    }
  }
}
