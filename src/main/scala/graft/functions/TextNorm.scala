package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode accent folding + casefold — the normalization pass multilingual
  * dedup/matching pipelines run before shingling so "Café" and "cafe"
  * collide (SURVEY.md §4.2: the reference normalizes keys before equality,
  * we extend it to full diacritic folding).
  *
  * Semantics: NFD-decompose, drop non-spacing combining marks (category
  * Mn — the accents themselves), NFC-recompose what remains, lowercase in
  * the root locale (no Turkish-i surprises). Deterministic, idempotent
  * (property-tested), null-preserving.
  *
  * Spark has no built-in for this, so it is a native [[UnaryExpression]]:
  * codegen emits one static call per row into [[TextNorm.foldAccents]] —
  * the row stays inside whole-stage codegen (same shape as Spark's own
  * `Upper`/`Lower`), never crossing a ScalaUDF serialization boundary.
  * An all-ASCII fast path (byte scan, no allocation beyond the lowercase)
  * keeps the common English-web-corpus row cheap.
  */
case class AccentFold(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"fold_accents expects STRING, got ${child.dataType.simpleString}")
  }

  override def nullSafeEval(input: Any): Any =
    TextNorm.foldAccents(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextNorm.foldAccents($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNorm {
  import org.apache.spark.sql.graftbridge.ColumnBridge

  /** Column surface: fold_accents(c). */
  def foldAccents(c: Column): Column =
    ColumnBridge.column(AccentFold(ColumnBridge.expression(c)))

  /** Static kernel shared by interpreted eval and generated code. */
  def foldAccents(s: UTF8String): UTF8String = {
    if (s == null) return null
    // ASCII fast path: no decomposition possible, lowercase is byte-local.
    var ascii = true
    var i = 0
    val n = s.numBytes()
    while (ascii && i < n) {
      if ((s.getByte(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) return s.toLowerCase
    val nfd = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    val sb = new java.lang.StringBuilder(nfd.length)
    // iterate CODE POINTS, not UTF-16 chars: supplementary-plane combining
    // marks (Adlam, Bassa Vah tones, …) are surrogate pairs, and
    // Character.getType on a lone surrogate half would misreport them as
    // SURROGATE — the mark would survive the fold
    var j = 0
    while (j < nfd.length) {
      val cp = nfd.codePointAt(j)
      if (Character.getType(cp) != Character.NON_SPACING_MARK) sb.appendCodePoint(cp)
      j += Character.charCount(cp)
    }
    val recomposed = Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
    UTF8String.fromString(recomposed.toLowerCase(java.util.Locale.ROOT))
  }
}
