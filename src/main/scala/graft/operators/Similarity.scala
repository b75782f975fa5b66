package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY.md §2 Part B
  * "Similarity search"): brute-force cosine top-k as the exact baseline and
  * an IVF (inverted-file) variant as the 100 TB scale path.
  *
  * Scale design: brute force broadcasts the (small) query set and scans the
  * corpus once — a map-only plan with a per-group top-k window, no shuffle
  * of the corpus. IVF prunes the scan to `nprobe` clusters: centroid
  * assignment is a broadcast join against K centroids, and the probe only
  * reads the matching clusters (partition-prunable when the corpus is
  * written bucketed/partitioned by cluster id).
  */
object Similarity {

  /** Exact brute-force cosine top-k: for each query vector, the k nearest
    * corpus vectors. Ties broken deterministically by corpus id.
    *
    * Selection runs through [[TopKByScore]], a bounded-heap typed Aggregator:
    * Spark's partial aggregation keeps only k candidates per (query,
    * partition) on the map side and merges k-lists in the reduce — no
    * shuffle of the full scored cross product and no per-group sort, unlike
    * the window/row_number formulation (which shuffles and sorts ALL corpus
    * rows per query). At 100 TB corpus scale that is the difference between
    * shuffling k rows per query per partition and shuffling the corpus.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame =
    rankTopK(
      corpus.crossJoin(broadcast(queries))
        .withColumn("cosine", round(cosineSimilarity(col("q_vec"), col("vec")), 6)),
      k, col("cosine"), "cosine")

  /** The shared selection tail of every top-k operator: bounded-heap
    * [[TopKByScore]] per query (score desc, id asc), ranks exploded to
    * (q_id, rank, id, `scoreName`). Distance metrics pass negate=true —
    * the heap keeps the k SMALLEST by ranking the negation and the
    * output un-negates. ONE definition: the round-at-6 / tie-break
    * contract the oracles replay must not fork across operators. */
  private def rankTopK(pairs: DataFrame, k: Int, scoreCol: Column,
                       scoreName: String, negate: Boolean = false): DataFrame = {
    val topk = udaf(new TopKByScore(k), ExpressionEncoderHelp.scored)
    pairs.groupBy(col("q_id"))
      .agg(topk(col("id"), if (negate) -scoreCol else scoreCol).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("int").as("rank"),
        col("col.id").as("id"),
        (if (negate) -col("col.score") else col("col.score")).as(scoreName))
  }

  /** One scored candidate: (id, score). */
  case class Scored(id: Long, score: Double)

  /** Bounded top-k selection by (score desc, id asc) — identical ordering to
    * `row_number over (order by score desc, id)`, but with map-side partial
    * aggregation and O(k) state per group. */
  class TopKByScore(k: Int) extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
    // Exactly Spark's SQLOrderingUtil.compareDoubles semantics: primitive
    // == first (so -0.0 ties with 0.0, as SQL sort treats them), then
    // java.lang.Double.compare for the total order (NaN largest). Plain
    // >/== alone would make NaN rows rank nondeterministically under
    // sortWith; Double.compare alone would rank 0.0 above -0.0, diverging
    // from the row_number window formulation this aggregator mirrors.
    private def better(a: Scored, b: Scored): Boolean = {
      val c = if (a.score == b.score) 0 else java.lang.Double.compare(a.score, b.score)
      c > 0 || (c == 0 && a.id < b.id)
    }
    private def trim(s: Seq[Scored]): Seq[Scored] =
      s.sortWith(better).take(k)
    override def zero: Seq[Scored] = Vector.empty
    override def reduce(buf: Seq[Scored], a: Scored): Seq[Scored] = {
      // fast reject: buffer full and candidate worse than current cutoff
      if (buf.length >= k && better(buf.last, a)) buf else trim(buf :+ a)
    }
    override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = trim(x ++ y)
    override def finish(r: Seq[Scored]): Seq[Scored] = trim(r)
    override def bufferEncoder: Encoder[Seq[Scored]] = ExpressionEncoderHelp.scoredSeq
    override def outputEncoder: Encoder[Seq[Scored]] = ExpressionEncoderHelp.scoredSeq
  }

  /** Per-group element-wise mean of float-array vectors (typed Aggregator —
    * the custom-agg slot reserved in SURVEY.md §2 Part B). */
  class VectorMean(dim: Int) extends Aggregator[Array[Float], (Array[Double], Long), Array[Double]] {
    override def zero: (Array[Double], Long) = (Array.fill(dim)(0.0), 0L)
    override def reduce(b: (Array[Double], Long), a: Array[Float]): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { b._1(i) += a(i); i += 1 }
      (b._1, b._2 + 1)
    }
    override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
      var i = 0
      while (i < dim) { x._1(i) += y._1(i); i += 1 }
      (x._1, x._2 + y._2)
    }
    override def finish(r: (Array[Double], Long)): Array[Double] =
      if (r._2 == 0) r._1 else r._1.map(_ / r._2)
    override def bufferEncoder: Encoder[(Array[Double], Long)] =
      Encoders.product[(Array[Double], Long)]
    override def outputEncoder: Encoder[Array[Double]] = ExpressionEncoderHelp.doubleArray
  }

  /** Cluster centroids as the element-wise mean per cluster column. Uses
    * Spark's partial aggregation (posexplode + two-level groupBy is shuffle
    * -heavy; the Aggregator reduces map-side). */
  def centroids(vecs: DataFrame, clusterCol: String, vecCol: String, dim: Int): DataFrame = {
    val agg = udaf(new VectorMean(dim), ExpressionEncoderHelp.floatArray)
    vecs.groupBy(col(clusterCol).as("cluster"))
      .agg(agg(col(vecCol)).as("centroid"))
  }

  /** The K centroids folded into ONE array-of-structs row, so assignment
    * can broadcast them and run as a pure map over the corpus. The fold
    * itself exchanges only K rows (SinglePartition of the centroid set).
    * An EMPTY centroid set filters to ZERO rows HERE — one size() check
    * on the single folded row, so the downstream crossJoin yields no
    * assignments (the pre-fold semantics) with no per-corpus-row work;
    * null VECTORS still keep their rows (deterministic tiebreak). */
  private def centroidArray(cents: DataFrame): DataFrame =
    cents.agg(collect_list(struct(
      col("cluster").cast("long").as("cluster"), col("centroid"))).as("_cents"))
      .where(size(col("_cents")) > 0)

  /** Nearest-centroid argmax as a higher-order function over the broadcast
    * centroid array — a PURE MAP: zero Exchange between the corpus scan and
    * the assignment (the old formulation crossJoined K copies of every row
    * and collapsed them with a groupBy(id), which exchanged ALL n rows with
    * their vectors per call — per Lloyd iteration in [[kmeans]]).
    *
    * Winner semantics are identical to the bounded-heap top-1 it replaces
    * (score desc, cluster asc): `array_max` over (score, -cluster) structs
    * compares doubles with Spark's nan-safe ordering — NaN largest,
    * -0.0 == 0.0 — exactly [[TopKByScore.better]]'s Double.compare path,
    * and among score ties the largest -cluster is the smallest cluster. */
  private def nearestCluster(vec: Column, centsArr: Column): Column =
    array_max(transform(centsArr, c => struct(
      cosineSimilarity(vec, c.getField("centroid")).as("score"),
      (-c.getField("cluster")).as("_negc"),
      c.getField("cluster").as("cluster")))).getField("cluster")

  /** Corpus → nearest-centroid assignment as a standalone operator:
    * returns (idCol, vecCol, cluster). Pure map over `vecs` (the
    * [[nearestCluster]] broadcast-array argmax) — the corpus side of the
    * plan has ZERO Exchange; only the K-row centroid fold shuffles. */
  def assignNearest(vecs: DataFrame, idCol: String, vecCol: String,
                    cents: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroidArray(cents)))
      .select(col(idCol), col(vecCol),
        nearestCluster(col(vecCol), col("_cents")).as("cluster"))

  /** Lloyd's k-means refinement over an embedding column: each iteration
    * re-assigns every vector to its nearest centroid (by cosine — the
    * broadcast-centroid-array [[nearestCluster]] argmax: map-only over the
    * corpus, zero corpus exchange) and recomputes centroids with the
    * [[VectorMean]] partial aggregate (map-side combine; the only shuffle
    * moves K x dim partial sums per partition). Initialization is
    * CALLER-PROVIDED (`init`: cluster, centroid) and iteration count fixed,
    * so the whole refinement is a deterministic dataflow both engines
    * replay — no random restarts. Returns (cluster, n, centroid) for the
    * final iteration; clusters that lose all members disappear, classic
    * Lloyd. */
  def kmeans(vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
             init: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, "at least one Lloyd iteration")
    val mean = udaf(new VectorMean(dim), ExpressionEncoderHelp.floatArray)
    var cents = init.select(col("cluster"), col("centroid"))
    var out: DataFrame = null
    for (_ <- 0 until iters) {
      val assigned = vecs.crossJoin(broadcast(centroidArray(cents)))
        .select(nearestCluster(col(vecCol), col("_cents")).as("cluster"),
          col(vecCol).as("_v"))

      out = assigned.groupBy("cluster")
        .agg(count(lit(1)).as("n"), mean(col("_v")).as("centroid"))
      cents = out.select("cluster", "centroid")
    }
    out
  }

  /** Deterministic seeded pseudo-Gaussian hyperplanes for sign-LSH,
    * independent of the data distribution (the production property
    * data-derived planes lack: a skewed corpus cannot bias the cuts, and
    * the planes never change as data arrives).
    *
    * Component (p, j) comes from a MINSTD LCG seeded by (plane, dim) and an
    * Irwin-Hall(3) sum mapped to [-1.5, 1.5) — approximately Gaussian by
    * the central limit theorem, which is all sign-LSH needs (direction
    * symmetry). Every step is exact 64-bit integer arithmetic (all values
    * < 2^48) followed by one IEEE division and subtraction, so ANY engine
    * replays the planes bit-for-bit from the formula alone — the DuckDB
    * oracle regenerates them in SQL with no data dependency. */
  def seededHyperplanes(spark: org.apache.spark.sql.SparkSession,
                        numPlanes: Int, dim: Int,
                        seed: Long = 9369319L): DataFrame = {
    val m = 2147483647L // 2^31 - 1 (MINSTD modulus)
    def lcg(x: org.apache.spark.sql.Column) = (x * lit(48271L)) % lit(m)
    spark.range(numPlanes.toLong).select(
      col("id").cast("int").as("h_id"),
      transform(sequence(lit(0), lit(dim - 1)), j => {
        val s0 = (col("id") * lit(131071L) + j.cast("long") * lit(524287L) +
          lit(seed)) % lit(m)
        val s1 = lcg(s0)
        val s2 = lcg(s1)
        val s3 = lcg(s2)
        (s1 + s2 + s3).cast("double") / lit(m.toDouble) - lit(1.5)
      }).as("h_vec"))
  }

  /** Sign-LSH (random-hyperplane) bucket assignment: bit i of the bucket id
    * is the sign of dot(vec, hyperplane_i). Vectors within a small angle
    * land in the same bucket with high probability, so ANN probing reduces
    * to an equi-join on bucket — the other scale path next to IVF (draw
    * `hyper` from [[seededHyperplanes]] for data-independent cuts).
    *
    * hyper: (h_id: Int in [0, 63], h_vec: Array[Float]), folded into one
    * broadcast array-of-structs row; the bucket id is an `aggregate()` HOF
    * over that array — a PURE MAP over the corpus, zero Exchange between
    * the scan and the bucket column (the old groupBy(id)-of-plane-copies
    * formulation exchanged the whole corpus to compute a per-row value).
    */
  def signLshBuckets(vecs: DataFrame, idCol: String, vecCol: String,
                     hyper: DataFrame): DataFrame = {
    val hyperArr = hyper.agg(collect_list(struct(
      col("h_id").cast("int").as("h_id"), col("h_vec"))).as("_hyper"))
      .where(size(col("_hyper")) > 0) // empty plane set -> zero buckets
    vecs.select(col(idCol), col(vecCol))
      .crossJoin(broadcast(hyperArr))
      .select(col(idCol),
        aggregate(col("_hyper"), lit(0L), (acc, h) =>
          acc + when(dotProduct(col(vecCol), h.getField("h_vec")) > 0,
              call_function("shiftleft", lit(1L), h.getField("h_id")))
            .otherwise(0L)).as("bucket"))
  }

  /** IVF top-k: assign every corpus vector to its nearest centroid, then for
    * each query search only the `nprobe` closest clusters exhaustively.
    * Deterministic given the centroid set; approximate vs. brute force only
    * through cluster pruning.
    *
    * The corpus→centroid assignment is the broadcast-array
    * [[nearestCluster]] argmax (a pure map, zero corpus Exchange); the
    * query→nprobe probes and the final per-query top-k run through the
    * bounded-heap [[TopKByScore]] aggregator, NOT `row_number` windows: a
    * window formulation full-sorts each group's candidate set (every member
    * of a hot cluster per query probing it), while the heap keeps O(k)
    * state per group with map-side partial aggregation. Ordering semantics
    * are identical everywhere (score desc, id asc; see TopKByScore), so the
    * output matches the window formulation bit-for-bit. */
  /** Query → its `nprobe` nearest centroids, one output row per
    * (query, probed cluster); `carry` threads extra query columns
    * through the probe fold (via first()) — ONE definition shared by
    * the plain and the filtered IVF search. */
  private def probeClusters(queries: DataFrame, cents: DataFrame, nprobe: Int,
                            carry: Seq[String] = Nil): DataFrame = {
    val topProbe = udaf(new TopKByScore(nprobe), ExpressionEncoderHelp.scored)
    val aggs = first(col("q_vec")).as("q_vec") +: carry.map(c => first(col(c)).as(c))
    queries.crossJoin(broadcast(cents))
      .withColumn("q_cos", cosineSimilarity(col("q_vec"), col("centroid")))
      .groupBy(col("q_id"))
      .agg(topProbe(col("cluster").cast("long"), col("q_cos")).as("top"),
        aggs: _*)
      .select((col("q_id") +: col("q_vec") +: carry.map(col)) :+
        explode(col("top").getField("id")).as("cluster"): _*)
  }

  def ivfTopK(queries: DataFrame, corpus: DataFrame, cents: DataFrame,
              k: Int, nprobe: Int): DataFrame = {
    // corpus -> nearest centroid: broadcast-array argmax, map-only over the
    // corpus (zero corpus Exchange; the index build's only shuffle is the
    // probe join itself)
    val assigned = assignNearest(corpus, "id", "vec", cents)
    // exact search within probed clusters only
    ivfTopKIndexed(queries, assigned, cents, k, nprobe)
  }

  /** Search a STORED IVF assignment — the steady-state serving shape: the
    * index table (cluster, id, vec) is persisted once (by [[ivfTopK]]'s
    * fused build, or grown incrementally by [[assignNearest]]-ing each new
    * batch against the FROZEN centroids and appending), and a query batch
    * pays only the probe join — never a corpus re-assignment. Because the
    * assignment is a pure function of the centroids, an incrementally
    * grown index is bit-identical to a full rebuild (qv14's gate). */
  def ivfTopKIndexed(queries: DataFrame, assigned: DataFrame, cents: DataFrame,
                     k: Int, nprobe: Int): DataFrame =
    rankTopK(
      assigned.join(broadcast(probeClusters(queries, cents, nprobe)), Seq("cluster"))
        .withColumn("cosine", round(cosineSimilarity(col("q_vec"), col("vec")), 6)),
      k, col("cosine"), "cosine")

  /** FILTERED (hybrid) ANN: exact top-k among the probed clusters' rows
    * that SATISFY a metadata predicate — tenant-/language-scoped vector
    * search over ONE shared index. The assignment carries the corpus
    * metadata columns and the probe fold carries the query's, so `keep`
    * (any boolean Column over both sides) prunes candidate rows AFTER
    * the probe join and BEFORE the bounded heap: differently-filtered
    * query batches reuse the same index build — the pre-filter
    * alternative re-assigns the corpus once per predicate, a full
    * corpus pass each time. Recall contract matches [[ivfTopK]]:
    * candidates outside the probed clusters are not seen (and a filter
    * can empty a probed cluster — fewer than k results is the honest
    * answer, exactly what the brute-force-filtered oracle returns for
    * the same probes). */
  def ivfTopKFiltered(queries: DataFrame, corpus: DataFrame, cents: DataFrame,
                      k: Int, nprobe: Int, corpusMeta: Seq[String],
                      queryMeta: Seq[String], keep: Column): DataFrame = {
    val assigned = corpus.crossJoin(broadcast(centroidArray(cents)))
      .select((Seq(col("id"), col("vec")) ++ corpusMeta.map(col)) :+
        nearestCluster(col("vec"), col("_cents")).as("cluster"): _*)
    rankTopK(
      assigned
        .join(broadcast(probeClusters(queries, cents, nprobe, queryMeta)),
          Seq("cluster"))
        .where(keep)
        .withColumn("cosine", round(cosineSimilarity(col("q_vec"), col("vec")), 6)),
      k, col("cosine"), "cosine")
  }

  // ------------------------------------------------ product quantization --

  /** Squared L2 between two equal-length double arrays, folded LEFT-TO-
    * RIGHT in index order (replayable summation — the oracle folds an
    * ordered list the same way). */
  private def l2sq(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  /** Product-quantization codebooks folded into ONE broadcastable row:
    * `_books[m][c]` = the dim/m-length slice of codeword c in subspace m.
    * Codewords are the `cents` centroids ORDER-FIXED by ascending cluster
    * id (array_sort on (code, centroid) structs), so a PQ CODE IS AN INDEX
    * into the sorted codeword list — deterministic and replayed by the
    * oracle with a row_number over cluster. Empty centroid sets filter to
    * zero rows here (the [[centroidArray]] contract). */
  private def pqBooks(cents: DataFrame, m: Int, dim: Int): DataFrame = {
    require(m >= 1 && dim % m == 0, s"dim=$dim must divide into m=$m subspaces")
    val sub = dim / m
    cents
      .agg(array_sort(collect_list(struct(
        col("cluster").cast("long").as("code"),
        col("centroid").cast("array<double>").as("centroid")))).as("_cw"))
      .where(size(col("_cw")) > 0)
      .select(transform(sequence(lit(0), lit(m - 1)), mi =>
        transform(col("_cw"), c =>
          slice(c.getField("centroid"), mi * lit(sub) + 1, lit(sub)))).as("_books"))
  }

  /** PQ-encode: map each vector to m small integer codes (argmin partial
    * squared-L2 per subspace; distance ties break to the smallest code —
    * the same array_max-over-(negd, negi) fold as [[nearestCluster]]).
    *
    * A PURE MAP over `vecs` with the folded codebook row broadcast — zero
    * corpus Exchange. This is the 100 TB ANN compression lever: the encoded
    * corpus is m small ints per vector instead of dim floats (64-dim float
    * → 8 codes ≈ 32× smaller), so the ADC scan in [[pqTopK]] reads codes,
    * never raw vectors. Returns (idCol, codes array<int>). */
  def pqEncode(vecs: DataFrame, idCol: String, vecCol: String,
               cents: DataFrame, m: Int, dim: Int,
               keep: Seq[String] = Nil): DataFrame =
    pqEncodeWith(pqBooks(cents, m, dim), vecs, idCol, vecCol, m, dim, keep)

  /** [[pqEncode]] against an ALREADY-FOLDED codebook row — callers that
    * also build query LUTs ([[pqTopK]], [[ivfPqTopK]]) fold the books
    * once and share the plan instead of aggregating the centroid set and
    * broadcasting the same row twice. */
  private def pqEncodeWith(books: DataFrame, vecs: DataFrame, idCol: String,
                           vecCol: String, m: Int, dim: Int,
                           keep: Seq[String]): DataFrame = {
    val sub = dim / m
    vecs.crossJoin(broadcast(books))
      .select(((col(idCol) +: keep.map(col)) :+
        transform(col("_books"), (bm, mi) => {
          val vSub = slice(col(vecCol).cast("array<double>"),
            mi * lit(sub) + 1, lit(sub))
          array_max(transform(bm, (cw, i) => struct(
            (-l2sq(vSub, cw)).as("negd"),
            (-i).as("negi"),
            i.cast("int").as("idx")))).getField("idx")
        }).as("codes")): _*)
  }

  /** PQ ANN via an ADC (asymmetric-distance) scan: per query, a lookup
    * table LUT[m][c] of partial squared-L2 to every codeword; a corpus
    * row's approximate distance is then the m-term LUT sum over its codes —
    * the encoded scan never touches a raw corpus vector (queries stay
    * exact-side, hence "asymmetric"). Top-k per query through the bounded-
    * heap [[TopKByScore]] on negated distance (map-side combine keeps k
    * candidates per partition; the corpus-sized scored set is never
    * shuffled). Both the codes and the 5-query LUT rows are broadcast-side;
    * the corpus side of the plan is scan → map → partial-agg.
    *
    * Returns (q_id, rank, id, approx) with approx = round(Σ_m LUT, 6),
    * ranked ascending, ties by id. */
  def pqTopK(queries: DataFrame, corpus: DataFrame, cents: DataFrame,
             m: Int, dim: Int, k: Int): DataFrame = {
    val sub = dim / m
    val books = pqBooks(cents, m, dim) // folded ONCE, shared by both sides
    val encoded = pqEncodeWith(books, corpus, "id", "vec", m, dim, Nil)
    val luts = queries.crossJoin(broadcast(books))
      .select(col("q_id"),
        transform(col("_books"), (bm, mi) => {
          val qSub = slice(col("q_vec").cast("array<double>"),
            mi * lit(sub) + 1, lit(sub))
          transform(bm, cw => l2sq(qSub, cw))
        }).as("_lut"))
    rankTopK(
      encoded.crossJoin(broadcast(luts))
        .withColumn("approx", round(
          aggregate(zip_with(col("codes"), col("_lut"),
              (c, lutm) => element_at(lutm, c + 1)),
            lit(0.0), (acc, v) => acc + v), 6)),
      k, col("approx"), "approx", negate = true)
  }

  /** IVF+PQ ANN — the two scale levers composed (the FAISS IVFPQ shape,
    * without residual re-centering so the oracle replays it): the stored
    * index is (coarse cluster, id, m PQ codes) per corpus vector — BOTH
    * built as pure maps over one corpus pass (broadcast coarse-centroid
    * argmax + broadcast-codebook encode, zero corpus Exchange) — and a
    * query reads only its nprobe probed clusters' code lists via the ADC
    * LUT sum, never a raw corpus vector. At 100 TB the multiplicative win:
    * nprobe/K of the rows × m bytes instead of dim floats per row; the
    * only corpus-sized work is the probe equi-join on cluster, and the
    * per-query top-k runs through the bounded heap (map-side combine, the
    * scored candidate set is never shuffled).
    *
    * `coarse` partitions the corpus (cosine, as [[ivfTopK]]); `pqCents`
    * quantizes it (squared-L2 codebooks, as [[pqTopK]]). Returns
    * (q_id, rank, id, approx): approx = round(Σ_m LUT, 6) ascending,
    * ties by id. */
  def ivfPqTopK(queries: DataFrame, corpus: DataFrame, coarse: DataFrame,
                pqCents: DataFrame, m: Int, dim: Int, k: Int,
                nprobe: Int): DataFrame = {
    val sub = dim / m
    val topProbe = udaf(new TopKByScore(nprobe), ExpressionEncoderHelp.scored)
    // the stored index: one corpus pass, two broadcast-folded maps deep
    val books = pqBooks(pqCents, m, dim) // folded ONCE, shared by both sides
    val index = pqEncodeWith(books,
      assignNearest(corpus, "id", "vec", coarse),
      "id", "vec", m, dim, keep = Seq("cluster"))
    // per query: nprobe coarse probes (cosine) + the ADC lookup table —
    // both tiny, joined driver-light and broadcast to the index scan
    val probes = queries.crossJoin(broadcast(coarse))
      .withColumn("q_cos", cosineSimilarity(col("q_vec"), col("centroid")))
      .groupBy(col("q_id"))
      .agg(topProbe(col("cluster").cast("long"), col("q_cos")).as("top"))
      .select(col("q_id"), explode(col("top").getField("id")).as("cluster"))
    val luts = queries.crossJoin(broadcast(books))
      .select(col("q_id").as("_lq"),
        transform(col("_books"), (bm, mi) => {
          val qSub = slice(col("q_vec").cast("array<double>"),
            mi * lit(sub) + 1, lit(sub))
          transform(bm, cw => l2sq(qSub, cw))
        }).as("_lut"))
    val probeLut = probes.join(luts, col("q_id") === col("_lq")).drop("_lq")
    rankTopK(
      index.join(broadcast(probeLut), Seq("cluster"))
        .withColumn("approx", round(
          aggregate(zip_with(col("codes"), col("_lut"),
              (c, lutm) => element_at(lutm, c + 1)),
            lit(0.0), (acc, v) => acc + v), 6)),
      k, col("approx"), "approx", negate = true)
  }

  // ------------------------------------------- scalar (int8) quantization --

  /** Per-dimension corpus bounds for scalar quantization, folded into ONE
    * broadcastable row `(_mins, _steps)` with `step = (max - min) / 255`
    * (0 for constant dimensions): the stored calibration of an SQ index.
    * One posexplode + 64-group aggregate at build time; K=dim rows fold. */
  def sqBounds(vecs: DataFrame, vecCol: String): DataFrame =
    vecs.select(posexplode(col(vecCol).cast("array<double>")).as(Seq("_p", "_v")))
      .groupBy("_p").agg(min("_v").as("_mn"), max("_v").as("_mx"))
      .agg(collect_list(struct(col("_p"), col("_mn"), col("_mx"))).as("_b"))
      .select(
        transform(array_sort(col("_b")), b => b.getField("_mn")).as("_mins"),
        transform(array_sort(col("_b")), b =>
          (b.getField("_mx") - b.getField("_mn")) / lit(255.0)).as("_steps"))

  /** INT8-style scalar quantization: `code[j] = round((v[j] - min[j]) /
    * step[j])` CLAMPED to 0..255 (constant dims → 0; vectors encoded
    * against STORED bounds — the index-maintenance case — saturate
    * instead of escaping the code space). The codes live in an int8-sized
    * value domain; they are materialized as an int array here, which
    * parquet's dictionary/bit-packed encodings store in ~1 byte per code
    * on disk (a binary packing would shrink the in-memory scan width too
    * — left as a layout choice, the semantics are byte codes either way).
    * A PURE MAP over the corpus (bounds ride one broadcast row; zero
    * corpus Exchange), mirroring [[pqEncode]]. */
  def sqEncode(vecs: DataFrame, idCol: String, vecCol: String,
               bounds: DataFrame, keep: Seq[String] = Nil): DataFrame =
    vecs.crossJoin(broadcast(bounds))
      .select((col(idCol) +: keep.map(col)) :+
        transform(col(vecCol).cast("array<double>"), (v, j) =>
          when(element_at(col("_steps"), j + 1) === 0.0, lit(0))
            .otherwise(least(lit(255), greatest(lit(0), round(
              (v - element_at(col("_mins"), j + 1)) /
                element_at(col("_steps"), j + 1)).cast("int"))))).as("codes"): _*)

  /** Top-k over the SQ index by approximate cosine. Each candidate row is
    * dequantized ONCE (`min[j] + step[j] * code[j]`, a projection BELOW
    * the broadcast join — never per (query, candidate) pair) and its norm
    * precomputed the same way; the per-pair work is one fused dot plus a
    * division. Selection is the bounded-heap [[TopKByScore]] — no Sort,
    * no Window, never a corpus shuffle. Deterministic: scores rounded at
    * 6 (same dot/|a||b| association as [[cosineSimilarity]], so the
    * oracle's list_cosine_similarity replays it), ties by id. */
  def sqTopK(queries: DataFrame, index: DataFrame, bounds: DataFrame,
             k: Int): DataFrame =
    rankTopK(
      sqCandidates(index, bounds).crossJoin(broadcast(queries))
        .withColumn("approx", round(
          dotProduct(col("q_vec"), col("_dvec")) /
            (l2Norm(col("q_vec")) * col("_dnorm")), 6)),
      k, col("approx"), "approx")

  /** Dequantized SQ candidates — each index row's reconstructed vector
    * (`min[j] + step[j] * code[j]`) and norm, computed ONCE per row
    * below the broadcast calibration join (never per query pair). ONE
    * definition shared by [[sqTopK]] and [[ivfSqTopK]]; `keep` columns
    * ride through. */
  private def sqCandidates(index: DataFrame, bounds: DataFrame,
                           keep: Seq[String] = Nil): DataFrame = {
    val dequant = transform(col("codes"), (c, j) =>
      element_at(col("_mins"), j + 1) +
        element_at(col("_steps"), j + 1) * c.cast("double"))
    index.crossJoin(broadcast(bounds))
      .withColumn("_dvec", dequant)
      .withColumn("_dnorm", l2Norm(col("_dvec")))
      .select((keep.map(col) :+ col("id") :+ col("_dvec") :+ col("_dnorm")): _*)
  }

  /** IVF + scalar quantization composed — the qv07 pattern with SQ codes
    * instead of PQ: the stored index is (coarse cluster, id, dim int8
    * codes) per corpus vector, built in ONE corpus pass of two
    * broadcast-folded maps (coarse-centroid argmax, then the bounds-row
    * quantizer — zero corpus Exchange); a query scans ONLY its nprobe
    * probed clusters' codes, dequantized ONCE per index row BELOW the
    * probe join, and ranks approximate cosine through the bounded heap.
    * The compression/recall rung between qv02 (IVF over raw vectors) and
    * qv07 (IVF over 32× PQ codes): ~4× compression with near-exact
    * ranks. */
  def ivfSqTopK(queries: DataFrame, corpus: DataFrame, coarse: DataFrame,
                bounds: DataFrame, k: Int, nprobe: Int): DataFrame = {
    // the stored index: one corpus pass, assignment + quantizer fused
    val index = sqEncode(assignNearest(corpus, "id", "vec", coarse),
      "id", "vec", bounds, keep = Seq("cluster"))
    ivfSqTopKIndexed(queries, index, coarse, bounds, k, nprobe)
  }

  /** Search a STORED (cluster, id, codes) SQ index — the serving half of
    * [[ivfSqTopK]], split out so the index can live in a catalog table
    * (built once, grown by [[assignNearest]]+[[sqEncode]] per batch
    * against the FROZEN coarse/bounds model) while query batches pay only
    * the probe fold + dequantized rank — the corpus is never re-encoded
    * per query batch (qp07's pipeline gate). */
  def ivfSqTopKIndexed(queries: DataFrame, index: DataFrame,
                       coarse: DataFrame, bounds: DataFrame,
                       k: Int, nprobe: Int): DataFrame =
    // per-query probe set (nprobe coarse clusters by cosine), q_vec rides
    // the fold so the scan side never rejoins the query table
    rankTopK(
      sqCandidates(index, bounds, keep = Seq("cluster"))
        .join(broadcast(probeClusters(queries, coarse, nprobe)), Seq("cluster"))
        .withColumn("approx", round(
          dotProduct(col("q_vec"), col("_dvec")) /
            (l2Norm(col("q_vec")) * col("_dnorm")), 6)),
      k, col("approx"), "approx")

  // ------------------------------------------------------- range search --

  /** EXACT cosine range search — every (query, corpus) pair with
    * `round(cosine, 6) >= tau` — with SOUND IVF cluster pruning: a cluster
    * is skipped only when NO member can possibly reach `tau`, so the
    * result set equals brute force bit-for-bit while touching only the
    * admissible clusters.
    *
    * The bound is the spherical triangle inequality, kept in cosine/sqrt
    * form so no `acos` enters the plan (IEEE `sqrt`/`*`/`+` are exactly
    * rounded, replayable across engines; `acos` is not): with
    * `theta_c = max` member↔centroid angle (per-cluster `min_cos` =
    * cos(theta_c), one partial aggregate over the assignment) and
    * `ang(q,c)` the query↔centroid angle,
    *
    *   ang(q, x) >= ang(q, c) - theta_c        for every member x of c
    *   cos(q, x) <= cos(ang(q,c) - theta_c)
    *             =  cos_qc * min_cos + sin_qc * sin_theta
    *
    * (and trivially <= 1 when ang(q,c) <= theta_c, i.e. cos_qc >= min_cos).
    * Clusters whose bound falls below `tau - slack` are never scanned.
    * `slack` (1e-6 default) must cover BOTH error sources between the
    * bound and the result filter: float rounding in the bound itself
    * (~1e-16) AND the result's 6-decimal rounding window — the filter
    * keeps `round(cosine, 6) >= tau`, which admits true cosines down to
    * tau - 5e-7, so a bound-side slack below 5e-7 could prune a cluster
    * holding a member that rounds INTO the result. 1e-6 dominates both.
    *
    * Scale shape: corpus→cluster assignment is the broadcast-array argmax
    * (map-only, zero corpus Exchange); radii are one K-row partial agg;
    * the (query × admitted cluster) probe set is broadcast into a banded
    * equi-join on cluster — only admitted clusters are scanned
    * (partition-prunable when stored clustered). This ONE-SHOT form pays
    * two map-only corpus passes (radii, then the probe join re-derives
    * the assignment — cheaper at 100 TB than materializing it); repeated
    * query batches should persist the [[assignNearest]] +
    * [[clusterRadii]] index once and probe [[rangeSearchIndexed]]. */
  def rangeSearch(queries: DataFrame, corpus: DataFrame, cents: DataFrame,
                  tau: Double, slack: Double = 1e-6): DataFrame = {
    val assigned = assignNearest(corpus, "id", "vec", cents)
    rangeSearchIndexed(queries, assigned, clusterRadii(assigned, cents),
      tau, slack)
  }

  /** The query half of the range search against a PREBUILT index —
    * `assigned` ([[assignNearest]] output) and `radii` ([[clusterRadii]])
    * persisted once and probed by every query batch: per batch, the only
    * corpus-side work is scanning the ADMITTED clusters (the K-row radii
    * fold and the assignment pass are paid at index-build time, not per
    * query — the steady-state production shape). */
  def rangeSearchIndexed(queries: DataFrame, assigned: DataFrame,
                         radii: DataFrame, tau: Double,
                         slack: Double = 1e-6): DataFrame =
    assigned.join(broadcast(rangeAdmitted(queries, radii, tau, slack)),
        Seq("cluster"))
      .withColumn("cosine", round(cosineSimilarity(col("q_vec"), col("vec")), 6))
      .filter(col("cosine") >= lit(tau))
      .select(col("q_id"), col("id"), col("cosine"))

  /** The stored half of a range-search index: per-cluster
    * (cluster, centroid, min_cos) where `min_cos` = cos(theta_c), the
    * smallest member-to-centroid cosine — ONE partial aggregate over the
    * assignment, K rows out. Persist next to `assigned`; recomputing it
    * per query batch would re-scan the corpus. */
  def clusterRadii(assigned: DataFrame, cents: DataFrame): DataFrame = {
    val centsL = cents.select(col("cluster").cast("long").as("cluster"),
      col("centroid"))
    assigned.join(broadcast(centsL), "cluster")
      .groupBy("cluster")
      .agg(first(col("centroid")).as("centroid"),
        min(cosineSimilarity(col("vec"), col("centroid"))).as("min_cos"))
  }

  /** The (q_id, q_vec, cluster) probe set [[rangeSearch]] admits — every
    * cluster whose triangle-inequality bound allows a member at `tau`.
    * Pure query-side work over the K-row `radii` index (no corpus access).
    * Exposed so specs can prove pruning actually happened (admitted
    * strictly fewer than |queries| × K clusters) independently of the
    * result-set equality with brute force. */
  def rangeAdmitted(queries: DataFrame, radii: DataFrame,
                    tau: Double, slack: Double = 1e-6): DataFrame = {
    def sinOf(c: Column): Column = sqrt(greatest(lit(0.0), lit(1.0) - c * c))
    queries
      .crossJoin(broadcast(radii))
      .withColumn("_cq", cosineSimilarity(col("q_vec"), col("centroid")))
      .withColumn("_ub", when(col("_cq") >= col("min_cos"), lit(1.0))
        .otherwise(col("_cq") * col("min_cos") +
          sinOf(col("_cq")) * sinOf(col("min_cos"))))
      .filter(col("_ub") >= lit(tau - slack))
      .select(col("q_id"), col("q_vec"), col("cluster"))
  }
}

private object ExpressionEncoderHelp {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val doubleArray: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
  val floatArray: Encoder[Array[Float]] = ExpressionEncoder[Array[Float]]()
  val scoredSeq: Encoder[Seq[Similarity.Scored]] = ExpressionEncoder[Seq[Similarity.Scored]]()
  val scored: Encoder[Similarity.Scored] = ExpressionEncoder[Similarity.Scored]()
}
