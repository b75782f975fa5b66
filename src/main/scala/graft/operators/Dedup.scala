package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for the LLM-data-pipeline surface (SURVEY.md §2
  * Part B "Dedup"): exact, n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB posture):
  *  - The only all-pairs computation anywhere is *within LSH candidate
  *    buckets* (or blocked partitions) — never across the full corpus.
  *  - Shingle self-joins support a `maxShingleDocFreq` stop-shingle cap:
  *    a shingle occurring in >F docs contributes F² candidate rows, so at
  *    scale frequent (uninformative) shingles are dropped before the join —
  *    the standard skew guard for this workload.
  *  - All hashing is Spark's codegen'd xxhash64/md5 — no UDFs, no
  *    per-row JVM allocation beyond the arrays themselves.
  */
object Dedup {

  /** Exact dedup by key columns: keep the lowest id per group.
    * (`dropDuplicates` semantics but with a deterministic survivor.) */
  def exactByKey(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct word-n-gram shingle sets, one row per (doc, shingle). */
  def shingleSet(docs: DataFrame, idCol: String, textCol: String, n: Int,
                 maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh = docs.select(col(idCol).as("doc_id"),
      explode(shingles(tokens(col(textCol)), n)).as("s"))
    maxShingleDocFreq.fold(sh) { cap =>
      // stop-shingle skew guard: drop shingles shared by too many docs
      val freq = sh.groupBy("s").agg(count(lit(1)).as("df")).filter(col("df") <= cap)
      sh.join(broadcast(freq.select("s")), Seq("s"), "left_semi")
    }
  }

  /** Exact n-gram Jaccard similarity for every pair sharing >= 1 shingle.
    * jaccard = |A ∩ B| / (|A| + |B| - |A ∩ B|). */
  def ngramJaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                        n: Int, threshold: Double,
                        maxShingleDocFreq: Option[Int] = None): DataFrame = {
    val sh = shingleSet(docs, idCol, textCol, n, maxShingleDocFreq)
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sizes.as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("jaccard",
        col("inter").cast("double") / (col("s1.n_sh") + col("s2.n_sh") - col("inter")))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature: for seed i, min over shingles of xxhash64(s, i). */
  def minhashSignature(shinglesCol: Column, numHashes: Int): Column =
    transform(sequence(lit(0), lit(numHashes - 1)),
      i => array_min(transform(shinglesCol, s => xxhash64(s, i))))

  /** MinHash + banded LSH near-dup detection, verified with EXACT Jaccard.
    *
    * Pipeline: shingle -> signature (numBands*rowsPerBand hashes) -> band
    * buckets -> equi-join on (band, bucket-hash) for candidates -> exact
    * verify via array_intersect on the shingle sets. The expensive exact
    * step runs only on LSH candidates; at threshold t=0.8 with 16x4 bands
    * the per-pair miss probability is (1-t^4)^16 < 3e-4, and < 4e-8 for the
    * t>=0.9 pairs this detects in practice.
    */
  def minhashLshPairs(docs: DataFrame, idCol: String, textCol: String,
                      n: Int, threshold: Double,
                      numBands: Int = 16, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = numBands * rowsPerBand
    val withShingles = docs.select(col(idCol).as("doc_id"),
      shingles(tokens(col(textCol)), n).as("sh"))
    val withSig = withShingles
      .filter(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), numHashes))
    // one row per (doc, band): bucket key = xxhash64 of the band's slice
    val bands = withSig.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(numBands - 1)),
          b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)), b))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val candidates = bands.as("x").join(bands.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
      .distinct()
    // exact verification on candidates only
    candidates
      .join(withShingles.select(col("doc_id"), col("sh").as("sh1")), col("d1") === col("doc_id"))
      .drop("doc_id")
      .join(withShingles.select(col("doc_id"), col("sh").as("sh2")), col("d2") === col("doc_id"))
      .drop("doc_id")
      .withColumn("jaccard",
        size(array_intersect(col("sh1"), col("sh2"))).cast("double") /
          size(array_union(col("sh1"), col("sh2"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("d1"), col("d2"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** 64-bit SimHash fingerprint of a token array: bit k is the sign of the
    * sum over tokens of +-1 depending on bit k of xxhash64(token). */
  def simhash64(toks: Column): Column = {
    val counts = aggregate(
      toks,
      array_repeat(lit(0L), 64),
      (acc, t) => {
        val h = xxhash64(t)
        zip_with(acc, sequence(lit(0), lit(63)),
          (a, i) => a + when(call_function("shiftright", h, i.cast("int")).bitwiseAND(1) === 1, 1L).otherwise(-1L))
      })
    aggregate(
      zip_with(counts, sequence(lit(0), lit(63)),
        (c, i) => when(c > 0, call_function("shiftleft", lit(1L), i.cast("int"))).otherwise(lit(0L))),
      lit(0L), (acc, v) => acc.bitwiseOR(v))
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs with hamming distance <= maxDistance (< 16),
    * banded into 4 x 16-bit chunks: any pair at distance <= 3 shares at
    * least one exact chunk (pigeonhole), so candidates come from an
    * equi-join on (chunk index, chunk value) — never all-pairs. */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String,
                   maxDistance: Int = 3): DataFrame = {
    require(maxDistance < 4, "4-chunk banding guarantees recall only for distance <= 3")
    val fp = docs.select(col(idCol).as("doc_id"),
      simhash64(tokens(col(textCol))).as("fp"))
    val chunks = fp.select(col("doc_id"), col("fp"),
        posexplode(transform(sequence(lit(0), lit(3)),
          c => call_function("shiftright", col("fp"), c.cast("int") * 16).bitwiseAND(0xFFFFL))))
      .withColumnRenamed("pos", "chunk").withColumnRenamed("col", "ck")
    chunks.as("x").join(chunks.as("y"),
        col("x.chunk") === col("y.chunk") && col("x.ck") === col("y.ck") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"),
        hamming64(col("x.fp"), col("y.fp")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDistance)
  }

  /** Embedding near-dup: pairs with cosine >= threshold. Blocked by an
    * optional blocking column (e.g. a coarse cluster id) so the pair join
    * is never a full cross product at scale; None = all-pairs (small/test
    * scale only). */
  def embeddingCosinePairs(vecs: DataFrame, idCol: String, vecCol: String,
                           threshold: Double,
                           blockCol: Option[String] = None): DataFrame = {
    val a = vecs.select(col(idCol).as("d1"), col(vecCol).as("v1"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"))
    val b = vecs.select(col(idCol).as("d2"), col(vecCol).as("v2"),
      blockCol.map(col).getOrElse(lit(0)).as("blk"))
    a.join(b, Seq("blk")).filter(col("d1") < col("d2"))
      .withColumn("cosine", cosineSimilarity(col("v1"), col("v2")))
      .filter(col("cosine") >= threshold)
      .select(col("d1"), col("d2"), round(col("cosine"), 6).as("cosine"))
  }
}
