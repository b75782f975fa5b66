package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for the LLM-pipeline surface
  * (SURVEY.md §2 Part B "Text analysis"): tokenization, shingling,
  * fingerprinting. Pure codegen'd built-ins — no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenization (the driver's `documents.text` is
    * single-space-separated lowercase; for general text compose with
    * `lower` + `regexp_replace` first). */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct word n-gram shingles. Empty array when the doc has fewer than
    * `n` tokens (guards `sequence`'s descending-step behavior). */
  def shingles(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*))))

  /** Word n-grams with repeats (frequency analysis). */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (1 to n).map(k => element_at(toks, i + k)): _*)))

  /** Content fingerprints: md5 / sha256 of the raw text. */
  def md5Fingerprint(text: Column): Column = md5(text.cast("binary"))
  def sha256Fingerprint(text: Column): Column = sha2(text.cast("binary"), 256)

  /** Winnowing-style rolling fingerprint: the lexicographic minimum of the
    * md5 hex digests of all character k-grams. Stable under small edits
    * anywhere outside the minimal window. */
  def winnowMin(text: Column, k: Int): Column =
    when(length(text) < k, md5(text.cast("binary")))
      .otherwise(array_min(transform(
        sequence(lit(1), length(text) - (k - 1)),
        i => md5(text.substr(i, lit(k)).cast("binary")))))

  /** Type-token ratio: distinct tokens / total tokens. */
  def typeTokenRatio(toks: Column): Column =
    size(array_distinct(toks)).cast("double") / size(toks).cast("double")
}
