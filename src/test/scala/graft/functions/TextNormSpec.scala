package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** AccentFold (qt18): NFD → strip Mn → NFC → root-locale lowercase.
  * Properties: hand-derived folds, idempotence, ASCII fast path == lower,
  * interpreted eval == generated code, null preservation. */
class TextNormSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private def fold(s: String): String = {
    val r = TextNorm.foldAccents(UTF8String.fromString(s))
    if (r == null) null else r.toString
  }

  test("hand-derived folds") {
    assert(fold("Café au Lait") == "cafe au lait")
    assert(fold("Zürich RÉSUMÉ naïve") == "zurich resume naive")
    assert(fold("El Niño — São Paulo") == "el nino — sao paulo")
    // Œ and ß are not canonically decomposable: lowercased, never mangled
    assert(fold("ŒUVRE straße") == "œuvre straße")
    // Å = A + U+030A (combining ring, category Mn) under NFD
    assert(fold("Ångström Å") == "angstrom a")
    // precomposed and combining-mark spellings of é fold identically
    assert(fold("café") == fold("café"))
  }

  test("supplementary-plane Mn marks strip (code-point iteration, not chars)") {
    // U+1E944 (ADLAM ALIF LENGTHENER) is a plane-1 non-spacing mark riding
    // a surrogate pair — char-wise iteration would misclassify the halves
    // as SURROGATE and keep the accent
    val adlamMark = new String(Character.toChars(0x1E944))
    val adlamHa = new String(Character.toChars(0x1E922)) // ADLAM CAPITAL HA
    assert(fold("a" + adlamMark + "b") == "ab")
    assert(fold(adlamHa + adlamMark) == fold(adlamHa),
      "plane-1 base char must survive, its combining mark must not")
  }

  test("idempotent and null/empty preserving") {
    val samples = Seq("Café", "Ångström", "plain ascii", "", "à́e")
    samples.foreach { s => assert(fold(fold(s)) == fold(s), s"not idempotent: $s") }
    assert(TextNorm.foldAccents(null: UTF8String) == null)
    assert(fold("") == "")
  }

  test("ASCII fast path equals lower(); codegen equals interpreted") {
    import spark.implicits._
    val rows = Seq("Plain ASCII Text 123", "MIXED case", "Æon Flux â ê î ô û",
      "ça va TRÈS bien", "ASCII-only, with punctuation!").toDF("s")
    // whole-stage codegen path
    val gen = rows.select(TextNorm.foldAccents(col("s")).as("f"), lower(col("s")).as("l"))
      .collect()
    gen.foreach { r =>
      val (f, l) = (r.getString(0), r.getString(1))
      if (l.forall(_ < 0x80)) assert(f == l, s"ASCII fast path diverged: $l")
    }
    // interpreted path (codegen off) must match bit-exactly
    val prev = spark.conf.get("spark.sql.codegen.wholeStage")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val interp = rows.select(TextNorm.foldAccents(col("s")).as("f")).collect()
      assert(interp.map(_.getString(0)).toSeq == gen.map(_.getString(0)).toSeq)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", prev)
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("non-string input is rejected at analysis") {
    import spark.implicits._
    val df = Seq(1, 2).toDF("n")
    val e = intercept[Exception] {
      df.select(TextNorm.foldAccents(col("n"))).collect()
    }
    assert(e.getMessage.toLowerCase.contains("string"))
  }
}
