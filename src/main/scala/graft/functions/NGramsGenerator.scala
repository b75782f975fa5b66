package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** SQL-callable table function (custom Catalyst `Generator`): word n-grams
  * with their positions, one output ROW per n-gram — the UDTF surface of
  * SURVEY.md §2 Part B's last row, previously covered only by
  * explode/LATERAL over the [[TextFunctions.ngrams]] array.
  *
  * {{{
  *   SELECT doc_id, g.pos, g.ngram
  *   FROM documents LATERAL VIEW ngrams_table(text, 3) g AS pos, ngram
  * }}}
  *
  * Whole-operator semantics (one input row -> many output rows) need a
  * `Generator`, not a scalar Expression: Catalyst plans it as `Generate`,
  * which streams output rows without materializing a per-row array — unlike
  * the explode(transform(...)) form, which allocates the full n-gram array
  * per document before exploding it. On a 100 TB corpus with large
  * documents that intermediate array is real memory pressure; the
  * generator's per-row iterator is not.
  *
  * Null/short inputs emit zero rows (explode-of-empty semantics); `n` must
  * be a positive integer literal (generator output schema is fixed at
  * analysis). Tokenization matches [[TextFunctions.tokens]] (single-space
  * split). Evaluation is CodegenFallback — `Generate` only codegens
  * explode-family built-ins; the row-iterator path is the same one Spark's
  * own non-codegen generators use.
  */
case class NGramsGenerator(text: Expression, n: Expression)
    extends Generator with CodegenFallback {

  override def children: Seq[Expression] = Seq(text, n)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): NGramsGenerator =
    copy(text = newChildren(0), n = newChildren(1))

  override def checkInputDataTypes(): TypeCheckResult =
    if (text.dataType.isInstanceOf[StringType] && n.dataType == IntegerType && n.foldable)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"ngrams_table expects (text STRING, n INT literal); " +
        s"got (${text.dataType.simpleString}, ${n.dataType.simpleString}, foldable=${n.foldable})")

  override def elementSchema: StructType = StructType(Seq(
    StructField("pos", IntegerType, nullable = false),
    StructField("ngram", StringType, nullable = false)))

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val t = text.eval(input)
    val k0 = n.eval(input)
    if (t == null || k0 == null) return Nil
    val k = k0.asInstanceOf[Int]
    if (k <= 0) return Nil
    val toks = t.asInstanceOf[UTF8String].toString.split(" ", -1)
    if (toks.length < k) return Nil
    // stream positions lazily: Generate pulls the iterator row by row, so a
    // huge document never materializes its full n-gram list at once
    (0 to toks.length - k).iterator.map { i =>
      val sb = new java.lang.StringBuilder(toks(i))
      var j = i + 1
      while (j < i + k) { sb.append(' ').append(toks(j)); j += 1 }
      InternalRow(i, UTF8String.fromString(sb.toString))
    }
  }
}
