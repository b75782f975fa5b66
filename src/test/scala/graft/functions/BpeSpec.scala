package graft.functions

import graft.core.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Learned-BPE tokenizer: hand-derived merge/encode contract on the
  * classic crafted corpus (the oracle gate qt17 replays the same), plus
  * corpus-scale invariants over the documents fixture through the
  * production distinct-word-encode + join-back path. */
class BpeSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  private val sf = "/root/testdata/sf0.001"

  test("learnMerges reproduces the classic example with deterministic tie-breaks") {
    val wc = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)
    val merges = Bpe.learnMerges(wc, numMerges = 6)
    assert(merges === Seq(("e", "s"), ("es", "t"), ("l", "o"),
      ("lo", "w"), ("e", "w"), ("ew", "est")))
    // early stop: a vocabulary that exhausts its pairs returns fewer merges
    val tiny = Bpe.learnMerges(Seq("ab" -> 1L), numMerges = 10)
    assert(tiny === Seq(("a", "b")))
  }

  test("encodeWord: lowest rank first, left-to-right, unknown pairs inert") {
    val ranks = Seq(("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w"),
      ("e", "w"), ("ew", "est")).zipWithIndex.toMap
    assert(Bpe.encodeWord("lowest", ranks) === Vector("low", "est"))
    assert(Bpe.encodeWord("newer", ranks) === Vector("n", "ew", "e", "r"))
    assert(Bpe.encodeWord("wider", ranks) === Vector("w", "i", "d", "e", "r"))
    assert(Bpe.encodeWord("low", ranks) === Vector("low"))
    assert(Bpe.encodeWord("x", ranks) === Vector("x"))
    assert(Bpe.encodeWord("", ranks) === Vector.empty)
  }

  test("corpus-scale train + encode over documents: lossless, bounded, deterministic") {
    // repartition = an upstream exchange: encode is a pure per-row map,
    // so shuffled input must still pair every row with ITS OWN tokens
    // (the per-row lossless check below is what would catch mispairing)
    val docs = Tables.documents(spark, sf).select(col("doc_id"), col("text"))
      .repartition(7)
    val merges = Bpe.train(docs, "text", vocabWords = 512, numMerges = 64)
    assert(merges.length === 64, "enough pair mass for the full merge budget")
    // training twice on the same corpus is bit-identical (deterministic
    // ordering end to end)
    assert(Bpe.train(docs, "text", vocabWords = 512, numMerges = 64) === merges)
    val enc = Bpe.encode(docs, "text", merges, "toks")
    assert(enc.count() === docs.count(), "encode preserves row count")
    // lossless per word: re-concatenating a doc's tokens reproduces its
    // lowercased word stream; token count never exceeds character count
    val checked = enc
      .withColumn("words",
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
      .select(
        (concat_ws("", col("toks")) === concat_ws("", col("words"))).as("lossless"),
        (size(col("toks")) <= length(concat_ws("", col("words")))).as("bounded"),
        (size(col("toks")) <= size(col("words")) * 32).as("sane"))
    assert(checked.filter(!col("lossless") || !col("bounded")).count() === 0)
    // merges compress: strictly fewer tokens than characters overall
    val totals = enc
      .withColumn("words",
        regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))
      .agg(sum(size(col("toks"))).as("toks"),
        sum(length(concat_ws("", col("words")))).as("chars")).head()
    assert(totals.getLong(0) < totals.getLong(1),
      s"no compression: ${totals.getLong(0)} tokens vs ${totals.getLong(1)} chars")
  }
}
