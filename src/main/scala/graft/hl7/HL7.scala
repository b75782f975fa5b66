package graft.hl7

import java.util.regex.Pattern

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** HL7v2 MSH-9 (message type/event) extraction
  * (ref: hl7/HL7Utils.kt:11-40, algorithm preserved exactly):
  *
  *   1. locate "MSH"; separator1 = char at msh+3, separator2 = char at msh+4;
  *   2. split the WHOLE message by separator1 with limit 10, require >= 10
  *      fields; MSH-9 is field index 8;
  *   3. require length == 7 with separator2 at index 3 ("MDM^T02");
  *   4. split by separator2 -> (type, event).
  *
  * Any malformed input -> None (the reference returns an empty list).
  */
object HL7 {

  def msh9(message: String): Option[(String, String)] = {
    if (message == null) return None
    val mshIdx = message.indexOf("MSH")
    if (mshIdx < 0 || message.length < mshIdx + 5) return None
    val sep1 = message.charAt(mshIdx + 3)
    val sep2 = message.charAt(mshIdx + 4)
    val fields = message.split(Pattern.quote(sep1.toString), 10)
    if (fields.length < 10) return None
    val f = fields(8)
    if (f.length == 7 && f.indexOf(sep2) == 3) {
      // limit = -1 keeps trailing empty components (Kotlin's split never
      // drops them; Java's default split does) — "MDM^^^^" must yield
      // ("MDM", "") and not crash
      val parts = f.split(Pattern.quote(sep2.toString), -1)
      Some((parts(0), parts(1)))
    } else None
  }

  /** Scalar UDF surface: hl7_msh9(msg) -> struct(msg_type, msg_event),
    * null when malformed. Registered per-session. */
  val msh9Udf = udf((message: String) => msh9(message))

  def register(spark: SparkSession): Unit =
    spark.udf.register("hl7_msh9", msh9Udf)

  /** Native column implementation of the same algorithm — pure built-in
    * expressions (locate/substr/split/when), so MSH-9 extraction over a
    * large HL7 corpus stays inside whole-stage codegen instead of paying
    * the ScalaUDF serialization boundary per row ("functions, not UDFs").
    *
    * Positions are 1-based (SQL); the reference's 0-based charAt(mshIdx+3)
    * is substr(m+3, 1) here. `get()` (0-based, null on out-of-bounds) is
    * used instead of element_at, which throws under ANSI mode.
    * Equivalence with [[msh9]]/[[msh9Udf]] is property-tested in HL7Spec.
    */
  def msh9Native(msg: Column): Column = {
    val m = locate("MSH", msg) // 1-based; 0 = absent; null msg -> null
    val sep1 = substr(msg, m + 3, lit(1))
    val sep2 = substr(msg, m + 4, lit(1))
    def rxQuote(c: Column) = concat(lit("\\Q"), c, lit("\\E"))
    val fields = split(msg, rxQuote(sep1), lit(10))
    val f = get(fields, lit(8)) // MSH-9, null when < 9 fields
    val parts = split(f, rxQuote(sep2), lit(-1))
    val ok = m >= 1 && length(msg) >= m + 4 && size(fields) >= 10 &&
      length(f) === 7 && call_function("instr", f, sep2) === 4
    when(ok, struct(get(parts, lit(0)).as("msg_type"), get(parts, lit(1)).as("msg_event")))
  }
}
