package graft.queries

import graft.core.Tables
import graft.functions.TextFunctions._
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Text analysis + deduplication over the `documents` table (SURVEY.md §2
  * Part B "Text analysis" / "Dedup"). Everything is DuckDB-checked with
  * identical formulas on both sides — including qd04 (SimHash), whose
  * per-token bits come from md5 slices both engines compute identically;
  * the oracle brute-forces all pairs (fine at oracle scale) while the
  * engine goes through chunk banding, and they agree exactly because
  * 4x16-bit banding has GUARANTEED recall at hamming <= 3 (pigeonhole).
  */
object TextQueries extends QueryModule {

  override val queries: Map[String, Q] = Map(
    // --- token statistics (tokenize + counting) ---
    "qt01_token_stats" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("t", tokens(col("text")))
        .select(
          col("doc_id"),
          size(col("t")).as("n_tokens"),
          size(array_distinct(col("t"))).as("n_distinct"),
          round(
            aggregate(col("t"), lit(0L), (acc, x) => acc + length(x)).cast("double") /
              size(col("t")).cast("double"), 4).as("avg_tok_len"))
        .orderBy("doc_id")
    },

    // --- language-ID via stopword-ratio heuristic ---
    "qt02_langid_stopwords" -> { (s, d) =>
      import s.implicits._
      val stop = TextQueries.stopwords.toDF("cand_lang", "word")
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val totals = toks.groupBy("doc_id").agg(count(lit(1)).as("n_tok"))
      val matched = toks.join(broadcast(stop), col("tok") === col("word"))
        .groupBy("doc_id", "cand_lang").agg(count(lit(1)).as("n_hit"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy(col("ratio_raw").desc, col("cand_lang"))
      matched.join(totals, "doc_id")
        .withColumn("ratio_raw", col("n_hit").cast("double") / col("n_tok"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("doc_id"), col("cand_lang").as("pred_lang"),
          round(col("ratio_raw"), 4).as("ratio"))
        .orderBy("doc_id")
    },

    // --- quality scoring (length/type-token-ratio heuristics) ---
    "qt03_quality_score" -> { (s, d) =>
      Tables.documents(s, d)
        .withColumn("t", tokens(col("text")))
        .select(
          col("doc_id"),
          col("n_chars"),
          size(col("t")).as("n_tokens"),
          round(typeTokenRatio(col("t")), 4).as("ttr"),
          qualityScore.as("quality"))
        .orderBy("doc_id")
    },

    // --- corpus-level n-gram frequency (top-20 bigrams) ---
    "qt04_top_bigrams" -> { (s, d) =>
      Tables.documents(s, d)
        .select(tokens(col("text")).as("t"))
        .select(explode(ngrams(col("t"), 2)).as("bigram"))
        .groupBy("bigram")
        .agg(count(lit(1)).as("cnt"))
        .orderBy(col("cnt").desc, col("bigram"))
        .limit(20)
    },

    // --- BPE-ish regex tokenization: alpha runs / digit runs / single
    //     punctuation, the pre-merge segmentation a byte-pair tokenizer
    //     starts from (whitespace tokenization is qt01) ---
    "qt06_bpe_tokens" -> { (s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_extract_all(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), lit(0)).as("toks"))
        .select(col("doc_id"),
          size(col("toks")).as("n_subtokens"),
          size(array_distinct(col("toks"))).as("n_unique"),
          element_at(array_sort(array_distinct(col("toks"))), 1).as("first_tok"))
        .orderBy("doc_id")
    },

    // --- LEARNED byte-pair-encoding tokenizer (functions/Bpe): real
    //     merge-table BPE replacing qt06's regex approximation. The gate
    //     trains on the classic crafted corpus (low*5 lower*2 newest*6
    //     widest*3) through the PRODUCTION paths — the distributed word
    //     count feeds the driver-side learner, encoding goes through the
    //     distinct-word mapPartitions + join-back — and emits the learned
    //     merge table plus sample encodings, all hand-derivable, so the
    //     oracle replays merges AND encode exactly ---
    "qt17_bpe_learned" -> { (s, d) =>
      import s.implicits._
      val crafted = Seq("low" -> 5, "lower" -> 2, "newest" -> 6, "widest" -> 3)
        .flatMap { case (w, n) => Seq.fill(n)(w) }
      val corpus = crafted.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
      val merges = graft.functions.Bpe.train(corpus, "text",
        vocabWords = 64, numMerges = 6)
      val mergeRows = merges.zipWithIndex.map { case ((a, b), r) =>
        ("merge", f"$r%02d", s"$a $b")
      }
      val samples = Seq("lowest", "newer", "wider", "low")
      val sampleDf = samples.zipWithIndex
        .map { case (w, i) => (i.toLong, w) }.toDF("id", "text")
      val encRows = graft.functions.Bpe.encode(sampleDf, "text", merges, "toks")
        .select(col("text"), concat_ws(" ", col("toks")).as("enc"))
        .collect().map(r => ("encode", r.getString(0), r.getString(1))).toSeq
      (mergeRows ++ encRows).toDF("kind", "k", "v").orderBy("kind", "k")
    },

    // --- Unicode accent folding + casefold (native codegen expression
    //     graft.functions.AccentFold — NFD, strip Mn marks, NFC, root-locale
    //     lowercase): the normalization pass multilingual dedup runs before
    //     shingling so "Café"/"cafe" collide. Crafted accented rows exercise
    //     the Unicode path against hand-derived expectations; real document
    //     rows exercise the all-ASCII fast path (where fold == lower) ---
    "qt18_accent_fold" -> { (s, d) =>
      import s.implicits._
      val crafted = Seq(
        1L -> "Café au Lait",
        2L -> "Zürich RÉSUMÉ naïve",
        3L -> "El Niño — São Paulo",
        4L -> "ŒUVRE straße",
        5L -> "Ångström Å").toDF("id", "text")
        .select(col("id"), graft.functions.TextNorm.foldAccents(col("text")).as("folded"))
      val docs = Tables.documents(s, d).filter(col("doc_id") < 5)
        .select((col("doc_id") + 100).as("id"),
          graft.functions.TextNorm.foldAccents(col("text")).as("folded"))
      crafted.unionAll(docs).orderBy("id")
    },

    // --- document fingerprinting: md5 / sha256 / winnowing-min ---
    "qt05_fingerprints" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 50)
        .select(
          col("doc_id"),
          md5Fingerprint(col("text")).as("md5_fp"),
          sha256Fingerprint(col("text")).as("sha256_fp"),
          winnowMin(col("text"), 8).as("winnow_fp"))
        .orderBy("doc_id")
    },

    // --- deterministic train/val/test split: the last md5 hex nibble of
    //     the id buckets rows 12/2/2 (75/12.5/12.5%) — reproducible across
    //     runs, engines and cluster sizes, unlike rand()-based splits ---
    "qt07_hash_split" -> { (s, d) =>
      val nib = substring(md5(col("doc_id").cast("string")), 32, 1)
      Tables.documents(s, d)
        .withColumn("split",
          when(nib.isin("c", "d"), "val")
            .when(nib.isin("e", "f"), "test")
            .otherwise("train"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("lang")).as("n_langs"),
          sum(col("n_chars")).as("total_chars"))
        .orderBy("split")
    },

    // --- temperature-based source MIXING (the data-mixing pass of a
    //     training pipeline): target proportions ∝ n^alpha with alpha=0.5
    //     (upsamples tail sources relative to raw counts), total budget =
    //     half the corpus; each source is then hash-sampled at its derived
    //     rate with the qt07 md5-threshold family — fully deterministic.
    //     Rates are rounded to 6 decimals BEFORE the threshold compare so
    //     the engine-vs-oracle comparison never hinges on a libm ULP; the
    //     mixing math itself is a sources-sized broadcast ---
    "qt14_source_mixing" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val counts = docs.groupBy("source").agg(count(lit(1)).as("n"))
      val totals = counts.agg(sum("n").as("total"), sum(sqrt(col("n"))).as("wsum"))
      val rates = counts.crossJoin(broadcast(totals))
        .withColumn("rate", round(
          least(lit(1.0),
            (col("total") / 2.0) * sqrt(col("n")) / col("wsum") / col("n")), 6))
        .select("source", "n", "rate")
      val h01 = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double") / 4294967296.0
      docs.join(broadcast(rates), Seq("source"))
        .withColumn("picked", h01 < col("rate"))
        .groupBy("source")
        .agg(max(col("n")).as("n_docs"), max(col("rate")).as("sample_rate"),
          count(when(col("picked"), 1)).as("n_sampled"),
          sum(when(col("picked"), col("n_chars"))).as("sampled_chars"))
        .orderBy("source")
    },

    // --- batch model scoring (the fastText-style linear-classifier
    //     inference shape): a broadcast token->weight MODEL (vocab = the
    //     corpus's top-200 document-frequency tokens, weights a
    //     deterministic INTEGER deci-value formula so the per-doc sum is
    //     exact and engine-independent), corpus-side plan = scan ->
    //     explode -> broadcast-join -> one partial agg on doc_id -> a
    //     pure-map sigmoid. At 100 TB the model rides the broadcast
    //     (real vocabularies of ~1M rows still fit) and the corpus is
    //     read once — no shuffle wider than the per-doc hit sums ---
    "qt15_classifier_score" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val toks = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val vocab = toks.filter(col("tok") =!= "")
        .groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
        .orderBy(col("df").desc, col("tok")).limit(200)
        .select(col("tok"),
          ((length(col("tok")) * 31 + ascii(col("tok"))) % 21 - 10)
            .cast("long").as("w10"))
      val hits = toks.join(broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(sum(col("w10")).as("sw10"), count(lit(1)).as("n_hits"))
      val logit = lit(-0.5) +
        coalesce(col("sw10"), lit(0L)) / (lit(10.0) * col("n_tok"))
      docs.select(col("doc_id"), size(tokens(col("text"))).as("n_tok"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_hits"), lit(0L)).as("n_hits"),
          round(logit, 4).as("logit"),
          round(lit(1.0) / (lit(1.0) + exp(-logit)), 4).as("score"),
          (logit >= 0).as("label"))
        .orderBy("doc_id")
    },

    // --- context-window packing: greedy sequential fill of 4096-token
    //     budgets via a DISTRIBUTED prefix sum (two-phase: per-range-
    //     partition running sums + broadcast partition offsets — a global
    //     no-partition window would funnel the corpus through one task) ---
    "qt08_token_packing" -> { (s, d) =>
      val docs = Tables.documents(s, d)
        .withColumn("n_tok", size(tokens(col("text"))).cast("long"))
      graft.operators.Packing.packBudget(docs, "doc_id", "n_tok", budget = 4096L)
        .groupBy("pack_id")
        .agg(count(lit(1)).as("n_docs"), sum("n_tok").as("pack_tokens"))
        .orderBy("pack_id")
    },

    // --- repetition-based quality filter (the C4/Gopher family of
    //     intra-document repetition signals): duplicate-trigram fraction
    //     and most-frequent-token fraction, with a keep verdict. All
    //     ratios are integer-count rationals -> bit-exact vs the oracle ---
    "qt09_repetition_filter" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val tc = docs.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val perDoc = tc.groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), max("c").as("top_c"))
      // token array projected before the n-gram HOF (perf lesson: inlined
      // exprs recompute the split per reference)
      val tri = docs.select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), ngrams(col("t"), 3).as("g3"))
        .select(col("doc_id"), size(col("g3")).as("total3"),
          size(array_distinct(col("g3"))).as("dist3"))
      perDoc.join(tri, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          round(coalesce(
            lit(1.0) - col("dist3").cast("double") / col("total3").cast("double"),
            lit(0.0)), 4).as("dup_trigram_frac"),
          round(col("top_c").cast("double") / col("n_tokens").cast("double"), 4)
            .as("top_tok_frac"))
        .withColumn("keep",
          col("dup_trigram_frac") < 0.2 && col("top_tok_frac") < 0.1)
        .orderBy("doc_id")
    },

    // --- corpus-vocabulary coverage scoring: the global-frequency side of
    //     LM data quality (rare/OOV-heavy docs score low). The token->
    //     corpus-frequency join is a plain equi-join — at 100 TB the vocab
    //     (with long-tail typos) can exceed broadcast size, so the planner/
    //     AQE picks broadcast vs shuffle by actual size; all scores are
    //     integer rationals (exact oracle parity) ---
    "qt10_vocab_coverage" -> { (s, d) =>
      val toks = Tables.documents(s, d)
        .select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("cf"))
      toks.join(freq, Seq("tok"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_tokens"),
          sum(when(col("cf") < 5, 1L).otherwise(0L)).as("n_oov"),
          min("cf").as("min_cf"),
          sum("cf").as("sum_cf"))
        .select(col("doc_id"), col("n_tokens"), col("n_oov"),
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 4)
            .as("oov_rate"),
          col("min_cf"),
          round(col("sum_cf").cast("double") / col("n_tokens").cast("double"), 4)
            .as("avg_cf"))
        .orderBy("doc_id")
    },

    // --- PII redaction: regex masking of emails/phones with per-doc
    //     match counts. The corpus text is synthetic-clean, so both
    //     engines append identical deterministic PII built from doc_id —
    //     what matters is the redaction plumbing (pure codegen'd
    //     regexp_replace/regexp_count, no UDFs) staying exact. Patterns
    //     stay in the Java-regex/RE2 common subset so both engines match
    //     identical spans ---
    "qt11_pii_redact" -> { (s, d) =>
      val emailRe = "[a-z0-9._%+-]+@[a-z0-9.-]+\\.[a-z]{2,}"
      val phoneRe = "\\b555-[0-9]{4}\\b"
      Tables.documents(s, d)
        .withColumn("raw", concat(
          substring(col("text"), 1, 40),
          lit(" contact u"), col("doc_id").cast("string"),
          lit("@example.com or call 555-"),
          lpad((col("doc_id") % 10000).cast("string"), 4, "0")))
        .select(col("doc_id"),
          regexp_count(col("raw"), lit(emailRe)).as("n_emails"),
          regexp_count(col("raw"), lit(phoneRe)).as("n_phones"),
          regexp_replace(regexp_replace(col("raw"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>").as("redacted"))
        .orderBy("doc_id")
    },

    // --- document chunking: overlapping token windows (size 64, stride
    //     48) — the context-window preprocessing step for training/RAG.
    //     One generate-starts + posexplode + slice pass, all codegen'd
    //     array ops over the projected token column (no per-chunk UDF, no
    //     re-tokenization per chunk); chunk text is fingerprinted so the
    //     oracle compares content without hauling full text through the
    //     hash comparison ---
    "qt13_chunking" -> { (s, d) =>
      val size = 64
      val stride = 48
      Tables.documents(s, d)
        .select(col("doc_id"), tokens(col("text")).as("t"))
        .withColumn("n", org.apache.spark.sql.functions.size(col("t")))
        .filter(col("n") > 0)
        .select(col("doc_id"), col("t"), col("n"),
          posexplode(sequence(lit(0), col("n") - 1, lit(stride))))
        .withColumnRenamed("pos", "chunk_idx").withColumnRenamed("col", "start")
        .select(col("doc_id"), col("chunk_idx"), col("start"),
          least(lit(size), col("n") - col("start")).as("chunk_tokens"),
          md5(concat_ws(" ", slice(col("t"), col("start") + 1, lit(size)))
            .cast("binary")).as("chunk_fp"))
        .orderBy("doc_id", "chunk_idx")
    },

    // --- the END-TO-END training-data pipeline as ONE composed query:
    //     exact dedup (md5 fingerprint, min-id survivor) -> near-dup
    //     removal (MinHash LSH pairs, drop the higher id of each pair) ->
    //     repetition quality filter (qt09 criteria) -> deterministic hash
    //     split (qt07 buckets) -> per-split doc/token totals. Every stage
    //     is the scale-shaped operator the standalone queries use; the
    //     DuckDB oracle replays the whole chain ---
    // --- the LAKEHOUSE incremental pipeline: every stage through the
    //     catalog surface. Corpus lands as table v1; the LSH index is
    //     built from the table and persisted via ATOMIC CTAS
    //     (writeTo.create); the delta batch arrives as v2; the consumer
    //     reads ONLY the delta through the CDC option and probes the
    //     STORED index — the corpus is never re-tokenized (qd09's plan
    //     proof) and nothing already processed is re-read (qc26's
    //     contract). What a production training-data ingest loop runs
    //     every batch, end-to-end ---
    "qp03_lakehouse_pipeline" -> { (s, d) =>
      if (s.conf.getOption("spark.sql.catalog.graft_cat").isEmpty)
        graft.catalog.GraftCatalog.register(s, "graft_cat",
          graft.core.TempDirs.create("graft_cat_root_"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      s.sql("DROP TABLE IF EXISTS graft_cat.db.pipe_docs")
      s.sql("DROP TABLE IF EXISTS graft_cat.db.pipe_index")
      Tables.documents(s, d).createOrReplaceTempView("qp03_documents")
      s.sql("CREATE TABLE graft_cat.db.pipe_docs " +
        "(doc_id BIGINT, text STRING) USING manifest")
      s.sql("INSERT INTO graft_cat.db.pipe_docs SELECT doc_id, text " +
        "FROM qp03_documents WHERE doc_id % 7 != 6")                    // v1: corpus
      Dedup.lshIndex(s.table("graft_cat.db.pipe_docs"), "doc_id", "text", n = 3)
        .writeTo("graft_cat.db.pipe_index").create()                    // atomic CTAS
      s.sql("INSERT INTO graft_cat.db.pipe_docs SELECT doc_id, text " +
        "FROM qp03_documents WHERE doc_id % 7 = 6")                     // v2: delta
      val corpus = s.sql("SELECT * FROM graft_cat.db.pipe_docs VERSION AS OF 1")
      val delta = s.read.option("start_version", "1").table("graft_cat.db.pipe_docs")
      Dedup.minhashLshPairsAgainstIndex(corpus,
          s.table("graft_cat.db.pipe_index"), delta,
          "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy("corpus_id", "delta_id")
    },

    // --- the WAP-staged corpus release: new documents land on a BRANCH,
    //     get decontaminated (LSH near-dup vs the released corpus) and
    //     quality-gated there, and publish atomically — the end-to-end
    //     composition of write-audit-publish with the dedup primitives
    //     (what a training-data release actually looks like). The
    //     decontamination is O(delta), not O(corpus): the release's LSH
    //     index is persisted alongside the release (atomic CTAS, same
    //     shape as qp03), and each staged batch shingles ONLY itself,
    //     probing the stored index for banded candidates — released text
    //     is re-read solely for verification candidates, never
    //     re-shingled per release ---
    "qp04_wap_pipeline" -> { (s, d) =>
      if (s.conf.getOption("spark.sql.catalog.graft_cat").isEmpty)
        graft.catalog.GraftCatalog.register(s, "graft_cat",
          graft.core.TempDirs.create("graft_cat_root_"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      Tables.documents(s, d).createOrReplaceTempView("qp04_documents")
      if (!scala.util.Try(s.table("graft_cat.db.corpus5_index").schema).isSuccess) {
        // RELEASE TIME (once per release, not per batch): corpus lands,
        // and the release ships WITH its LSH index — built here, probed
        // by every staged batch until the next release replaces it
        s.sql("DROP TABLE IF EXISTS graft_cat.db.corpus5")
        s.sql("CREATE TABLE graft_cat.db.corpus5 " +
          "(doc_id BIGINT, lang STRING, text STRING, n_chars BIGINT) USING manifest")
        s.sql("INSERT INTO graft_cat.db.corpus5 SELECT doc_id, lang, text, n_chars " +
          "FROM qp04_documents WHERE doc_id < 120")          // released corpus
        Dedup.lshIndex(
            s.table("graft_cat.db.corpus5").select(col("doc_id"), col("text")),
            "doc_id", "text", n = 3)
          .writeTo("graft_cat.db.corpus5_index").create()    // atomic CTAS
      } else {
        // STEADY STATE (a rerun in the same session, e.g. the bench's
        // repeated passes): the release and its index already exist —
        // restore the release point and retire the spent staging branch,
        // so what's measured is the per-batch path alone (stage → probe
        // the STORED index → gate → publish), which never re-shingles or
        // re-indexes the released corpus
        s.sql("CALL graft_cat.system.drop_branch('db.corpus5', 'r2')")
        s.sql("CALL graft_cat.system.rollback('db.corpus5', 1)")
      }
      s.sql("CALL graft_cat.system.branch('db.corpus5', 'r2')")
      s.conf.set(graft.catalog.GraftCatalog.WapBranchConf, "r2")
      try {
        s.sql("INSERT INTO graft_cat.db.corpus5 " +
          "SELECT doc_id, lang, text, n_chars " +
          "FROM qp04_documents WHERE doc_id >= 120")         // staged on the branch
        // decontamination ON THE BRANCH: staged docs that near-dup a
        // released doc (stored-index banded candidates, exact-jaccard
        // verified >= 0.8) are dropped before anything publishes. The
        // released slice comes from MAIN (`VERSION AS OF 1` — branch
        // routing only applies to untravelled reads) and is only touched
        // for candidates; the staged slice reads the branch with the
        // doc_id predicate, which file-level stats skipping resolves to
        // just the staged files
        val released = s.sql(
          "SELECT doc_id, text FROM graft_cat.db.corpus5 VERSION AS OF 1")
        val staged = s.table("graft_cat.db.corpus5")
          .filter(col("doc_id") >= 120).select("doc_id", "text")
        Dedup.minhashLshPairsAgainstIndex(released,
            s.table("graft_cat.db.corpus5_index"), staged,
            "doc_id", "text", n = 3, threshold = 0.8)
          .select(col("delta_id").as("doc_id")).distinct()
          .createOrReplaceTempView("qp04_dups")
        s.sql("DELETE FROM graft_cat.db.corpus5 " +
          "WHERE doc_id IN (SELECT doc_id FROM qp04_dups)")
        // quality gate on the staged slice only
        s.sql("DELETE FROM graft_cat.db.corpus5 WHERE doc_id >= 120 AND n_chars < 100")
      } finally s.conf.unset(graft.catalog.GraftCatalog.WapBranchConf)
      s.sql("CALL graft_cat.system.fast_forward('db.corpus5', 'r2')")
      s.sql("""SELECT lang, count(*) AS n_docs,
          CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM graft_cat.db.corpus5 GROUP BY lang ORDER BY lang""")
    },

    "qp01_training_pipeline" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      // 1. exact dedup on content fingerprint
      val exactKeep = docs.groupBy(md5(col("text").cast("binary")).as("fp"))
        .agg(min("doc_id").as("doc_id")).select("doc_id")
      val uniq = docs.join(exactKeep, Seq("doc_id"), "left_semi")
      // 2. near-dup removal: drop the higher id of every LSH-verified pair
      val drops = Dedup.minhashLshPairs(uniq, "doc_id", "text", n = 3, threshold = 0.8)
        .select(col("d2").as("doc_id")).distinct()
      // fanOut: the two quality passes below (token explode + trigram
      // HOFs) are heavy map work; the broadcast anti-join keeps the docs
      // side's 1-split local width otherwise. No-op at cluster widths.
      val kept = graft.core.Parallelism.fanOut(
        uniq.join(drops, Seq("doc_id"), "left_anti"))
      // 3. repetition quality filter (qt09 keep criteria)
      val tc = kept.select(col("doc_id"), explode(tokens(col("text"))).as("tok"))
        .groupBy("doc_id", "tok").agg(count(lit(1)).as("c"))
      val stats = tc.groupBy("doc_id")
        .agg(sum("c").as("n_tokens"), max("c").as("top_c"))
      val tri = kept.select(col("doc_id"), tokens(col("text")).as("t"))
        .filter(size(col("t")) >= 3)
        .select(col("doc_id"), ngrams(col("t"), 3).as("g3"))
        .select(col("doc_id"), size(col("g3")).as("total3"),
          size(array_distinct(col("g3"))).as("dist3"))
      val quality = stats.join(tri, Seq("doc_id"), "left")
        .filter(
          round(coalesce(lit(1.0) - col("dist3").cast("double") / col("total3").cast("double"),
            lit(0.0)), 4) < 0.2 &&
          round(col("top_c").cast("double") / col("n_tokens").cast("double"), 4) < 0.1)
        .select("doc_id", "n_tokens")
      // 4. deterministic split + totals
      val nib = substring(md5(col("doc_id").cast("string")), 32, 1)
      quality
        .withColumn("split",
          when(nib.isin("c", "d"), "val")
            .when(nib.isin("e", "f"), "test")
            .otherwise("train"))
        .groupBy("split")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
        .orderBy("split")
    },

    // --- exact dedup by key (dropDuplicates w/ deterministic survivor) ---
    "qd01_dedup_exact" -> { (s, d) =>
      Dedup.exactByKey(Tables.documents(s, d), "doc_id", Seq("lang", "source"))
        .orderBy("lang", "source")
    },

    // --- NORMALIZED exact dedup (qd01's fingerprint hardened for a
    //     multilingual corpus: accent-fold + casefold via the native
    //     AccentFold expression, whitespace collapsed, THEN md5 —
    //     "Café  au  lait" / "cafe au LAIT" / "CAFÉ AU LAIT" collide.
    //     Same one-groupBy scale shape as qd01; the normalization is
    //     pure codegen'd row work before the fingerprint ---
    "qd15_normalized_dedup" -> { (s, d) =>
      import s.implicits._
      val crafted = Seq(
        (1000000L, "Café  au  lait"),
        (1000001L, "cafe au LAIT"),
        (1000002L, "CAFÉ AU LAIT"),
        (1000003L, "something else entirely")).toDF("doc_id", "text")
      val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
        .unionAll(crafted)
      docs
        .withColumn("fp", md5(regexp_replace(
          trim(graft.functions.TextNorm.foldAccents(col("text"))), "\\s+", " ")))
        .groupBy("fp")
        .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n_copies"))
        .filter(col("n_copies") > 1)
        .select("keep_id", "n_copies")
        .orderBy("keep_id")
    },

    // --- exact n-gram Jaccard near-dup pairs ---
    "qd02_dedup_jaccard" -> { (s, d) =>
      Dedup.ngramJaccardPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.8)
        .orderBy("d1", "d2")
    },

    // --- MinHash + banded LSH with exact verification (the scale path;
    //     detected pairs all have jaccard >= 0.9, where 16x4-band recall
    //     is 1 - 4e-8, so the exact-Jaccard oracle is stable) ---
    "qd03_dedup_minhash_lsh" -> { (s, d) =>
      Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
          n = 3, threshold = 0.8)
        .orderBy("d1", "d2")
    },

    // --- dedup clustering: LSH pairs -> connected components -> cluster
    //     sizes (min doc id = cluster id = canonical survivor) ---
    "qd06_dedup_clusters" -> { (s, d) =>
      val pairs = Dedup.minhashLshPairs(Tables.documents(s, d), "doc_id", "text",
        n = 3, threshold = 0.8)
      Dedup.connectedComponents(pairs)
        .groupBy("cluster_id")
        .agg(count(lit(1)).as("n_docs"))
        .orderBy("cluster_id")
    },

    // --- SimHash near-dup: md5-slice bits -> oracle-replayable; the
    //     banded candidate join is exhaustive at hamming <= 3, so the
    //     brute-force oracle matches bit-exactly ---
    "qd04_dedup_simhash" -> { (s, d) =>
      Dedup.simhashPairs(Tables.documents(s, d), "doc_id", "text", maxDistance = 3)
        .orderBy("d1", "d2")
    },

    // --- exact SUBSTRING dedup (operators/Dedup.duplicatedSpans): 8-token
    //     spans repeated across distinct docs — one n-gram explosion +
    //     one hash-partitioned groupBy (the Spark-native stand-in for the
    //     single-node suffix-array pass of Lee et al. 2021). Headline:
    //     top spans by spread, plus the per-doc offset feed's row count
    //     riding the same gate (fully deterministic: n_docs/n_occ/span
    //     is a total order) ---
    "qd11_substring_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val offsets = Dedup.duplicatedSpanOffsets(docs, "doc_id", "text", n = 8)
        .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("nd"))
      Dedup.duplicatedSpans(docs, "doc_id", "text", n = 8)
        .orderBy(desc("n_docs"), desc("n_occurrences"), asc("span"))
        .limit(20)
        .crossJoin(broadcast(offsets
          .select(col("n").as("total_offset_rows"),
            col("nd").as("docs_with_dup_spans"))))
    },

    // --- span REMOVAL (keep-first policy over qd11's detection): every
    //     non-canonical occurrence of a duplicated 8-token span is masked
    //     and the text rebuilt from surviving tokens — codegen array-HOF
    //     pipeline, no UDFs; canonical = lowest (doc_id, start), fully
    //     deterministic, so the rebuilt corpus is oracle-replayable ---
    "qd12_span_removal" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.removeDuplicatedSpans(docs, "doc_id", "text", n = 8)
        .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          count(when(col("n_tokens_removed") > 0, 1)).as("docs_changed"),
          sum("n_tokens_removed").as("tokens_removed"),
          sum(length(col("clean_text"))).as("clean_chars"))
        .orderBy("lang")
    },

    // --- incremental dedup: near-dup pairs between a NEW BATCH (25% of
    //     doc ids) and the standing corpus — candidates from the delta's
    //     buckets probing the corpus LSH index, exact verify on candidate
    //     docs only; cost scales with the delta, not the corpus. Same
    //     >=0.9-pair recall argument as qd03, so exact cross-split
    //     Jaccard is the oracle ---
    "qd08_incremental_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      Dedup.minhashLshPairsAgainst(
          docs.filter(col("doc_id") % 4 =!= 3), docs.filter(col("doc_id") % 4 === 3),
          "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy("corpus_id", "delta_id")
    },

    // --- stored-index incremental dedup: batch 1 WRITES the corpus LSH
    //     index as a ManifestTable version; batch 2 READS it back and
    //     probes it with the delta — the plan provably never re-shingles
    //     the corpus (asserted in OperatorsSpec), the steady-state shape
    //     of continuously ingested training data ---
    "qd09_index_dedup" -> { (s, d) =>
      val docs = Tables.documents(s, d)
      val corpus = docs.filter(col("doc_id") % 5 =!= 4)
      val delta = docs.filter(col("doc_id") % 5 === 4)
      val idxDir = graft.core.TempDirs.create("graft_lshidx_")
      // batch 1: build + persist the index (one committed version)
      graft.core.ManifestTable.write(
        Dedup.lshIndex(corpus, "doc_id", "text", n = 3), idxDir)
      // batch 2: read the stored index, probe with the delta
      val idx = graft.core.ManifestTable.read(s, idxDir)
      Dedup.minhashLshPairsAgainstIndex(corpus, idx, delta,
          "doc_id", "text", n = 3, threshold = 0.8)
        .orderBy("corpus_id", "delta_id")
    },

    // --- benchmark decontamination: train docs sharing any 3-gram shingle
    //     with the (hash-split) eval slice — one equi-join on the shingle,
    //     eval side broadcast-sized, train corpus never shuffled ---
    "qd07_decontaminate" -> { (s, d) =>
      val nib = substring(md5(col("doc_id").cast("string")), 32, 1)
      val docs = Tables.documents(s, d).withColumn("is_eval", nib.isin("e", "f"))
      Dedup.decontaminate(
          docs.filter(!col("is_eval")), docs.filter(col("is_eval")),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },

    // --- Bloom-filter decontamination: the eval shingle set compressed to
    //     its distinct bit positions (broadcastable however big eval is),
    //     train shingles flagged iff all k bits set — no false negatives,
    //     deterministic false positives the oracle reproduces (md5-slice
    //     positions, same replayable family as q61/qd04) ---
    "qd10_bloom_decontaminate" -> { (s, d) =>
      val nib = substring(md5(col("doc_id").cast("string")), 32, 1)
      val docs = Tables.documents(s, d).withColumn("is_eval", nib.isin("e", "f"))
      Dedup.bloomDecontaminate(
          docs.filter(!col("is_eval")), docs.filter(col("is_eval")),
          "doc_id", "text", n = 3)
        .orderBy("doc_id")
    },

    // --- embedding-cosine near-dup pairs, banded-sign-LSH blocked: the
    //     pair join is an equi-join on (band, bucket) — 4 bands x 4
    //     SEEDED pseudo-Gaussian hyperplanes (data-independent; the oracle
    //     regenerates them from the same integer-LCG formula) — never an
    //     all-pairs self cross-product ---
    "qd05_dedup_embedding" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val hyper = graft.operators.Similarity.seededHyperplanes(s, numPlanes = 16, dim = VectorQueries.dim)
      Dedup.embeddingLshPairs(
          emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
          hyper, numBands = 4, planesPerBand = 4, threshold = 0.45)
        .orderBy("d1", "d2")
    },

    // --- SemDeDup: cluster-then-pairwise semantic dedup (label-mean
    //     centroids as the deterministic clustering; map-only assignment;
    //     pairwise cosine ONLY within a cluster; greedy keep-lowest-id
    //     survivors) ---
    "qd13_semantic_dedup" -> { (s, d) =>
      val emb = Tables.embeddings(s, d)
      val cents = graft.operators.Similarity.centroids(
        emb.select(col("label"), col("embedding")), "label", "embedding",
        VectorQueries.dim) // the oracle reuses VectorQueries.centroidCte
      Dedup.semanticDedup(
          emb.select(col("vec_id"), col("embedding")), "vec_id", "embedding",
          cents, threshold = 0.4)
        .orderBy("vec_id")
    },

    // --- QUALITY-AWARE dedup retention (the production refinement of
    //     keep-lowest-id: inside each near-dup cluster keep the HIGHEST
    //     quality document — LSH pairs -> connected components -> one
    //     argmax window over cluster members only; singletons pass
    //     through an anti-join, never entering the window. The cluster-
    //     membership table carries NO broadcast hint: its size is
    //     data-dependent (at web-corpus dup rates 30-50% of docs sit in
    //     dup clusters), so AQE picks broadcast when it IS small and
    //     degrades to a shuffle join when it is not — the window that
    //     follows shuffles dup members on cluster_id anyway, so the
    //     shuffle join adds no new exchange class (PlanShapeSpec proves
    //     the plan survives with broadcasting disabled) ---
    "qd14_quality_retention" -> { (s, d) =>
      qualityRetention(Tables.documents(s, d)).orderBy("doc_id")
    },

    // --- CCNet-style n-gram LM quality scoring: train add-one-smoothed
    //     word-bigram counts on a REFERENCE slice (lang='en'), score every
    //     document's mean negative log-likelihood under that model, keep
    //     low-perplexity docs. Scale shape: the model is BOUNDED — the
    //     top-`lmModelBigrams` reference bigrams plus the prefix table
    //     DERIVED from that pruned set, so the two broadcasts are
    //     O(model) at any corpus size (out-of-model bigrams take the
    //     smoothed OOV arm); the corpus side is scan -> explode -> two
    //     broadcast joins -> one partial agg, no corpus shuffle before
    //     the per-doc fold. Per-bigram log-probs are quantized to integer
    //     micro-nats so the per-doc SUM is exact across engines
    //     regardless of fold order ---
    "qt16_lm_score" -> { (s, d) =>
      lmScores(Tables.documents(s, d))
        .select(col("doc_id"), col("lang"), col("n_bigrams"), col("nll"),
          (col("nll") <= lmKeepNll).as("keep"))
        .orderBy("doc_id")
    },

    // --- GOVERNED INGEST: the round's write-side pieces composed — a
    //     CHECK-constrained table, batch staging on a WAP branch (the
    //     violating batch is rejected BEFORE any branch version commits),
    //     an LM-quality audit that deletes low-quality staged docs ON THE
    //     BRANCH (row-level DML against the branch log), and an atomic
    //     fast_forward publish; main holds nothing until the audited
    //     output lands whole ---
    "qp06_governed_ingest" -> { (s, d) =>
      if (s.conf.getOption("spark.sql.catalog.graft_cat").isEmpty)
        graft.catalog.GraftCatalog.register(s, "graft_cat",
          graft.core.TempDirs.create("graft_cat_root_"))
      s.sql("CREATE NAMESPACE IF NOT EXISTS graft_cat.db")
      s.sql("DROP TABLE IF EXISTS graft_cat.db.gov6")
      Tables.documents(s, d).createOrReplaceTempView("qp06_documents")
      val pfx = graft.catalog.Constraints.Prefix
      s.sql("CREATE TABLE graft_cat.db.gov6 " +
        "(doc_id BIGINT, lang STRING, text STRING, n_chars BIGINT) " +
        "USING manifest TBLPROPERTIES " +
        s"('${pfx}chars_positive'='n_chars > 0', " +
        s"'${pfx}text_present'='text IS NOT NULL')")
      // seed main with an EMPTY v1 (a branch forks from a committed
      // version; publishing later replays the branch's delta onto it)
      s.sql("INSERT INTO graft_cat.db.gov6 " +
        "SELECT doc_id, lang, text, n_chars FROM qp06_documents WHERE false")
      s.sql("CALL graft_cat.system.branch('db.gov6', 'audit')")
      s.conf.set(graft.catalog.GraftCatalog.WapBranchConf, "audit")
      val insertRejected = try {
        s.sql("INSERT INTO graft_cat.db.gov6 " +
          "SELECT doc_id, lang, text, n_chars FROM qp06_documents")
        // a malformed batch violates chars_positive: rejected atomically,
        // the branch keeps exactly the first batch. The boolean demands
        // the SPECIFIC constraint violation in the failure's cause chain
        // — any incidental failure (analysis, broken write path) would
        // fail the gate instead of masquerading as enforcement
        val rejected = scala.util.Try(s.sql(
          "INSERT INTO graft_cat.db.gov6 SELECT doc_id + 1000000, lang, " +
            "text, -n_chars FROM qp06_documents")) match {
          case scala.util.Failure(e) =>
            graft.catalog.Constraints.violationIn(e, "chars_positive")
          case _ => false
        }
        // AUDIT: LM-score the staged slice (the branch view) and delete
        // low-quality docs ON THE BRANCH — main is untouched throughout.
        // Docs too short to score (fewer than 2 tokens -> no bigrams)
        // have no nll row, never enter the low-quality set, and are KEPT
        // — the oracle's LEFT JOIN mirrors that rule explicitly
        lmScores(s.table("graft_cat.db.gov6"))
          .filter(col("nll") > lmKeepNll)
          .select("doc_id").createOrReplaceTempView("qp06_low_quality")
        s.sql("DELETE FROM graft_cat.db.gov6 " +
          "WHERE doc_id IN (SELECT doc_id FROM qp06_low_quality)")
        rejected
      } finally s.conf.unset(graft.catalog.GraftCatalog.WapBranchConf)
      // conf unset: the table name resolves MAIN again — still empty,
      // everything above staged on the branch
      val mainEmptyPrePublish = s.table("graft_cat.db.gov6").count() == 0L
      s.sql("CALL graft_cat.system.fast_forward('db.gov6', 'audit')")
      s.table("graft_cat.db.gov6")
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"), sum("n_chars").as("total_chars"))
        .select(lit(insertRejected).as("insert_rejected"),
          lit(mainEmptyPrePublish).as("main_empty_pre_publish"),
          col("lang"), col("n_docs"), col("total_chars"))
        .orderBy("lang")
    }
  )

  /** The qt16 scoring pipeline as a reusable piece (qp06's audit scores
    * the STAGED table with it): reference = the input's `lmRefLang`
    * slice, add-one smoothing, integer micro-nat quantization. Returns
    * (doc_id, lang, n_bigrams, nll).
    *
    * The model is BOUNDED: only the [[lmModelBigrams]] highest-count
    * reference bigrams (ties broken by bigram text — deterministic,
    * oracle-replayable) enter the count table, and the prefix table
    * derives from the PRUNED set, so both broadcasts are O(model), never
    * O(reference slice) — the same discipline CCNet applies by pruning
    * its KenLM. Out-of-model bigrams take the smoothed OOV arm
    * (c2 = 0, and c1 = 0 when the prefix was pruned too) — the add-one
    * formula already covers them, no special case. An UNBOUNDED model
    * would broadcast every distinct bigram of the reference slice:
    * billions of rows on a 100 TB corpus — the driver-OOM the cap
    * exists to prevent. Top-N selection is a distributed
    * TakeOrderedAndProject, never a single-partition sort. */
  private def lmScores(docs: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // Project the token array into its own column BEFORE the ngram HOF
    // (the shingleSet pattern): inlined, every element_at(tokens(text), i)
    // in the transform lambda re-runs the split — O(tokens²) splitting per
    // document, measured ~6× slower on this gate (optimization round 15).
    def bigrams(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), col("lang"), tokens(col("text")).as("_toks"))
      .select(col("doc_id"), col("lang"),
        explode(ngrams(col("_toks"), 2)).as("bigram"))
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
    val refBi = bigrams(docs.filter(col("lang") === lmRefLang))
    val c2 = refBi.groupBy("bigram").agg(count(lit(1)).as("c2"))
      .orderBy(col("c2").desc, col("bigram")).limit(lmModelBigrams)
    val c1 = c2.withColumn("w1", split(col("bigram"), " ").getItem(0))
      .groupBy("w1").agg(sum(col("c2")).as("c1"))
    val vocab = docs.filter(col("lang") === lmRefLang)
      .select(explode(tokens(col("text"))).as("w"))
      .agg(countDistinct(col("w")).as("v")) // 1 row, broadcast below
    val lp = bigrams(docs)
      .join(broadcast(c2), Seq("bigram"), "left")
      .join(broadcast(c1), Seq("w1"), "left")
      .crossJoin(broadcast(vocab))
      .withColumn("lp", round(log(
          (coalesce(col("c2"), lit(0L)) + lit(1.0)) /
            (coalesce(col("c1"), lit(0L)) + col("v"))) * lit(1000000.0))
        .cast("long"))
    lp.groupBy("doc_id", "lang")
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp")).as("_slp"))
      .withColumn("nll",
        round((-col("_slp").cast("double") / col("n_bigrams")) / lit(1000000.0), 4))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("nll"))
  }

  /** qt16's model constants, shared with the oracle SQL. The bigram cap
    * bounds the broadcast model at any corpus size; 512 also prunes at
    * the gate's sf (the reference slice holds ~900 distinct bigrams), so
    * the oracle exercises the OOV arm, not just the happy path. */
  private val lmRefLang = "en"
  private val lmModelBigrams = 512
  private val lmKeepNll = 3.8

  /** qd14's quality-aware retention as a reusable piece: LSH near-dup
    * pairs → connected components → per-cluster argmax (quality desc,
    * doc_id asc); singletons keep themselves. Size-safe at any dup
    * fraction: the dup-cluster membership table joins WITHOUT a
    * broadcast hint (AQE broadcasts it only when its runtime size
    * allows), so a corpus where half the documents sit in dup clusters
    * degrades to a shuffle join instead of OOM-ing the driver. Returns
    * (doc_id, cluster_id, quality, keep). */
  private[graft] def qualityRetention(docs: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text",
      n = 3, threshold = 0.8)
    val clusters = Dedup.connectedComponents(pairs) // (doc_id, cluster_id)
    // qt03's quality formula (ONE definition: [[qualityScore]]);
    // materialized — the join and the anti-join both consume it
    val scored = docs.withColumn("t", tokens(col("text")))
      .select(col("doc_id"), qualityScore.as("quality"))
      .localCheckpoint()
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("cluster_id")
      .orderBy(col("quality").desc, col("doc_id"))
    val dupKeep = scored.join(clusters, "doc_id")
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("cluster_id"), col("quality"),
        (col("rn") === 1).as("keep"))
    val singles = scored.join(clusters, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"), col("quality"),
        lit(true).as("keep"))
    dupKeep.unionByName(singles)
  }

  /** qt03's quality score over a tokenized `t` column — ONE definition,
    * shared by qt03 and qd14's retention rule (the oracle side mirrors it
    * verbatim in both gates' SQL). */
  private def qualityScore: org.apache.spark.sql.Column =
    round(least(lit(1.0), size(col("t")).cast("double") / 100.0) *
      typeTokenRatio(col("t")), 4)

  /** Small per-language stopword profiles (classic function-word lists). */
  val stopwords: Seq[(String, String)] = Seq(
    "en" -> "the", "en" -> "a", "en" -> "of", "en" -> "and", "en" -> "to",
    "es" -> "el", "es" -> "la", "es" -> "de", "es" -> "y", "es" -> "que",
    "de" -> "der", "de" -> "die", "de" -> "und", "de" -> "ist", "de" -> "von",
    "fr" -> "le", "fr" -> "la", "fr" -> "et", "fr" -> "les", "fr" -> "des")

  private val stopwordValues = stopwords
    .map { case (l, w) => s"('$l','$w')" }.mkString(", ")

  private val shingleCte =
    """toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
      sh AS (SELECT DISTINCT doc_id,
             unnest(list_transform(generate_series(1, len(t)-2),
                    i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
             FROM toks WHERE len(t) >= 3),
      sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
      pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                GROUP BY 1, 2)"""

  /** Shared recursive-CTE replay of the minhash-LSH near-dup CLUSTERS:
    * verified-Jaccard pairs → undirected edges → min-label reachability
    * components `comp(v, cid)`. Interpolate after [[shingleCte]] under a
    * WITH RECURSIVE (qd06 + qd14 — one definition, no silent drift). */
  private val componentsCte =
    """jp AS (SELECT d1, d2
              FROM pairs p JOIN sizes s1 ON p.d1 = s1.doc_id
                           JOIN sizes s2 ON p.d2 = s2.doc_id
              WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8),
       edges AS (SELECT d1 AS src, d2 AS dst FROM jp
                 UNION SELECT d2, d1 FROM jp),
       nodes AS (SELECT DISTINCT src AS v FROM edges),
       reach(v, label) AS (
         SELECT v, v FROM nodes
         UNION
         SELECT e.dst, r.label FROM reach r JOIN edges e ON e.src = r.v),
       comp AS (SELECT v, min(label) AS cid FROM reach GROUP BY v)"""

  private val jaccardSql =
    s"""WITH $shingleCte
       SELECT d1, d2, round(inter*1.0/(s1.n_sh + s2.n_sh - inter), 4) AS jaccard
       FROM pairs p JOIN sizes s1 ON p.d1 = s1.doc_id JOIN sizes s2 ON p.d2 = s2.doc_id
       WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8
       ORDER BY d1, d2"""

  override val oracle: Map[String, String] = Map(
    "qt01_token_stats" ->
      """SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct,
           round(list_aggregate(list_transform(t, x -> length(x)), 'sum')*1.0 / len(t), 4) AS avg_tok_len
         FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents)
         ORDER BY doc_id""",

    "qt02_langid_stopwords" ->
      s"""WITH stop(cand_lang, word) AS (SELECT * FROM (VALUES $stopwordValues)),
         toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok FROM documents),
         totals AS (SELECT doc_id, count(*) AS n_tok FROM toks GROUP BY doc_id),
         matched AS (SELECT doc_id, cand_lang, count(*) AS n_hit
                     FROM toks JOIN stop ON tok = word GROUP BY doc_id, cand_lang)
         SELECT doc_id, cand_lang AS pred_lang, ratio FROM (
           SELECT m.doc_id, m.cand_lang,
             round(m.n_hit*1.0 / t.n_tok, 4) AS ratio,
             row_number() OVER (PARTITION BY m.doc_id
               ORDER BY m.n_hit*1.0 / t.n_tok DESC, m.cand_lang) AS rn
           FROM matched m JOIN totals t ON m.doc_id = t.doc_id)
         WHERE rn = 1 ORDER BY doc_id""",

    // the model replays exactly: integer deci-weights make the per-doc
    // sum exact, so logit/score/label are engine-independent doubles
    "qt15_classifier_score" ->
      """WITH toks AS (
           SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
         vocab AS (
           SELECT tok,
             CAST((length(tok)*31 + ascii(tok)) % 21 - 10 AS BIGINT) AS w10
           FROM (SELECT tok, count(DISTINCT doc_id) AS df FROM toks
                 WHERE tok <> '' GROUP BY tok
                 ORDER BY df DESC, tok LIMIT 200)),
         hits AS (
           SELECT t.doc_id, sum(v.w10) AS sw10, count(*) AS n_hits
           FROM toks t JOIN vocab v USING (tok) GROUP BY t.doc_id),
         base AS (
           SELECT d.doc_id,
             CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
             -0.5 + coalesce(h.sw10, 0) /
               (10.0 * len(string_split(d.text, ' '))) AS logit
           FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id)
         SELECT doc_id, n_hits, round(logit, 4) AS logit,
           round(1.0 / (1.0 + exp(-logit)), 4) AS score,
           logit >= 0 AS label
         FROM base ORDER BY doc_id""",

    "qt03_quality_score" ->
      """SELECT doc_id, n_chars, CAST(len(t) AS INTEGER) AS n_tokens,
           round(len(list_distinct(t))*1.0 / len(t), 4) AS ttr,
           round(least(1.0, len(t)/100.0) * (len(list_distinct(t))*1.0/len(t)), 4) AS quality
         FROM (SELECT doc_id, n_chars, string_split(text,' ') AS t FROM documents)
         ORDER BY doc_id""",

    "qt04_top_bigrams" ->
      """SELECT bigram, count(*) AS cnt FROM (
           SELECT unnest(list_transform(generate_series(1, len(t)-1),
                  i -> t[i]||' '||t[i+1])) AS bigram
           FROM (SELECT string_split(text,' ') AS t FROM documents)
           WHERE len(t) >= 2)
         GROUP BY bigram ORDER BY cnt DESC, bigram LIMIT 20""",

    "qt06_bpe_tokens" ->
      """SELECT doc_id,
           CAST(len(t) AS INTEGER) AS n_subtokens,
           CAST(len(list_distinct(t)) AS INTEGER) AS n_unique,
           list_sort(list_distinct(t))[1] AS first_tok
         FROM (SELECT doc_id,
                 regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]') AS t
               FROM documents)
         ORDER BY doc_id""",

    // the crafted corpus's merges and encodings are hand-derived (count
    // desc, pair-lexicographic tie-break; lowest-rank-first encode), so
    // the oracle IS the expected table
    // crafted rows replay hand-derived folds; ASCII document rows reduce
    // to lower() (no decomposable characters — verified on the dataset)
    "qt18_accent_fold" ->
      """SELECT id, folded FROM (
           SELECT CAST(id AS BIGINT) AS id, folded FROM (VALUES
             (1, 'cafe au lait'),
             (2, 'zurich resume naive'),
             (3, 'el nino — sao paulo'),
             (4, 'œuvre straße'),
             (5, 'angstrom a')
           ) AS t(id, folded)
           UNION ALL
           SELECT doc_id + 100 AS id, lower(text) AS folded
           FROM documents WHERE doc_id < 5
         ) ORDER BY id""",

    "qt17_bpe_learned" ->
      """SELECT kind, k, v FROM (VALUES
           ('merge','00','e s'), ('merge','01','es t'), ('merge','02','l o'),
           ('merge','03','lo w'), ('merge','04','e w'), ('merge','05','ew est'),
           ('encode','low','low'), ('encode','lowest','low est'),
           ('encode','newer','n ew e r'), ('encode','wider','w i d e r')
         ) AS t(kind, k, v) ORDER BY kind, k""",

    "qt05_fingerprints" ->
      """SELECT doc_id, md5(text) AS md5_fp, sha256(text) AS sha256_fp,
           CASE WHEN length(text) < 8 THEN md5(text)
                ELSE list_aggregate(list_transform(
                       generate_series(1, length(text)-7),
                       i -> md5(substr(text, CAST(i AS INTEGER), 8))), 'min')
           END AS winnow_fp
         FROM documents WHERE doc_id < 50 ORDER BY doc_id""",

    "qd01_dedup_exact" ->
      """SELECT lang, source, min(doc_id) AS keep_id, count(*) AS n_dups
         FROM documents GROUP BY lang, source ORDER BY lang, source""",

    // ASCII document rows normalize to lower(text) (verified dataset
    // property); the crafted accent rows are replayed pre-folded
    "qd15_normalized_dedup" ->
      """WITH docs AS (
           SELECT doc_id, lower(text) AS norm FROM documents
           UNION ALL
           SELECT CAST(doc_id AS BIGINT), norm FROM (VALUES
             (1000000, 'cafe  au  lait'),
             (1000001, 'cafe au lait'),
             (1000002, 'cafe au lait'),
             (1000003, 'something else entirely')) AS t(doc_id, norm)),
         n AS (SELECT doc_id,
                 md5(regexp_replace(trim(norm), '\s+', ' ', 'g')) AS fp
               FROM docs)
         SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies
         FROM n GROUP BY fp HAVING count(*) > 1 ORDER BY keep_id""",

    "qt07_hash_split" ->
      """SELECT split, count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM (SELECT *,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('c','d') THEN 'val'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('e','f') THEN 'test'
                  ELSE 'train' END AS split
           FROM documents)
         GROUP BY split ORDER BY split""",

    "qt14_source_mixing" ->
      """WITH counts AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         t AS (SELECT sum(n) AS total, sum(sqrt(n)) AS wsum FROM counts),
         rates AS (SELECT source, n,
                     round(least(1.0,
                       (t.total / 2.0) * sqrt(n) / t.wsum / n), 6) AS rate
                   FROM counts, t),
         picked AS (SELECT d.source, r.n, r.rate, d.n_chars,
                      (CAST('0x'||substr(md5(CAST(d.doc_id AS VARCHAR)),1,8) AS BIGINT)
                        / 4294967296.0) < r.rate AS p
                    FROM documents d JOIN rates r ON d.source = r.source)
         SELECT source, max(n) AS n_docs, max(rate) AS sample_rate,
           count(CASE WHEN p THEN 1 END) AS n_sampled,
           CAST(sum(CASE WHEN p THEN n_chars END) AS BIGINT) AS sampled_chars
         FROM picked GROUP BY source ORDER BY source""",

    "qt08_token_packing" ->
      """WITH t AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
                    FROM documents),
         c AS (SELECT doc_id, n_tok,
             sum(n_tok) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM t)
         SELECT CAST(floor((cum - n_tok) / 4096.0) AS BIGINT) AS pack_id,
           count(*) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens
         FROM c GROUP BY 1 ORDER BY pack_id""",

    "qp01_training_pipeline" ->
      """WITH uniq AS (
           SELECT d.* FROM documents d
           JOIN (SELECT md5(text) AS fp, min(doc_id) AS doc_id
                 FROM documents GROUP BY md5(text)) k
             ON d.doc_id = k.doc_id),
         toksq AS (SELECT doc_id, string_split(text,' ') AS t FROM uniq),
         shp AS (SELECT DISTINCT doc_id,
                   unnest(list_transform(generate_series(1, len(t)-2),
                     i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
                 FROM toksq WHERE len(t) >= 3),
         sizesp AS (SELECT doc_id, count(*) AS n_sh FROM shp GROUP BY doc_id),
         pairsp AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS inter
                    FROM shp a JOIN shp b ON a.s = b.s AND a.doc_id < b.doc_id
                    GROUP BY 1, 2),
         jp AS (SELECT d1, d2 FROM pairsp p
                JOIN sizesp s1 ON p.d1 = s1.doc_id
                JOIN sizesp s2 ON p.d2 = s2.doc_id
                WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8),
         kept AS (SELECT * FROM uniq
                  WHERE doc_id NOT IN (SELECT d2 FROM jp)),
         tc AS (SELECT doc_id, tok, count(*) AS c
                FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                      FROM kept)
                GROUP BY doc_id, tok),
         stats AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                     CAST(max(c) AS BIGINT) AS top_c
                   FROM tc GROUP BY doc_id),
         tri AS (SELECT doc_id, CAST(len(g3) AS INTEGER) AS total3,
                   CAST(len(list_distinct(g3)) AS INTEGER) AS dist3
                 FROM (SELECT doc_id,
                         list_transform(generate_series(1, len(t)-2),
                           i -> t[i]||' '||t[i+1]||' '||t[i+2]) AS g3
                       FROM (SELECT doc_id, string_split(text,' ') AS t
                             FROM kept)
                       WHERE len(t) >= 3)),
         quality AS (SELECT s.doc_id, s.n_tokens
                     FROM stats s LEFT JOIN tri USING (doc_id)
                     WHERE round(coalesce(1.0 - dist3*1.0/total3, 0.0), 4) < 0.2
                       AND round(top_c*1.0/n_tokens, 4) < 0.1)
         SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                       IN ('c','d') THEN 'val'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 32, 1)
                       IN ('e','f') THEN 'test'
                     ELSE 'train' END AS split,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS total_tokens
         FROM quality GROUP BY 1 ORDER BY split""",

    "qt09_repetition_filter" ->
      """WITH tc AS (SELECT doc_id, tok, count(*) AS c
                     FROM (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                           FROM documents)
                     GROUP BY doc_id, tok),
         per_doc AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
                       CAST(max(c) AS BIGINT) AS top_c
                     FROM tc GROUP BY doc_id),
         tri AS (SELECT doc_id,
                   CAST(len(g3) AS INTEGER) AS total3,
                   CAST(len(list_distinct(g3)) AS INTEGER) AS dist3
                 FROM (SELECT doc_id,
                         list_transform(generate_series(1, len(t)-2),
                           i -> t[i]||' '||t[i+1]||' '||t[i+2]) AS g3
                       FROM (SELECT doc_id, string_split(text,' ') AS t
                             FROM documents)
                       WHERE len(t) >= 3))
         SELECT p.doc_id, p.n_tokens,
           round(coalesce(1.0 - dist3*1.0/total3, 0.0), 4) AS dup_trigram_frac,
           round(top_c*1.0/n_tokens, 4) AS top_tok_frac,
           (round(coalesce(1.0 - dist3*1.0/total3, 0.0), 4) < 0.2 AND
            round(top_c*1.0/n_tokens, 4) < 0.1) AS keep
         FROM per_doc p LEFT JOIN tri USING (doc_id)
         ORDER BY doc_id""",

    "qt10_vocab_coverage" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS tok
                       FROM documents),
         freq AS (SELECT tok, count(*) AS cf FROM toks GROUP BY tok)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(CASE WHEN cf < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
           round(sum(CASE WHEN cf < 5 THEN 1 ELSE 0 END)*1.0/count(*), 4) AS oov_rate,
           min(cf) AS min_cf,
           round(sum(cf)*1.0/count(*), 4) AS avg_cf
         FROM toks JOIN freq USING (tok)
         GROUP BY doc_id ORDER BY doc_id""",

    // raw PII text constructed identically from doc_id on both sides;
    // single-quoted RE2 literals, 'g' flag = Spark's replace-all default
    "qt11_pii_redact" ->
      """WITH raw AS (SELECT doc_id,
             substr(text, 1, 40) || ' contact u' || CAST(doc_id AS VARCHAR)
               || '@example.com or call 555-'
               || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS raw
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}')) AS INTEGER) AS n_emails,
           CAST(len(regexp_extract_all(raw, '\b555-[0-9]{4}\b')) AS INTEGER) AS n_phones,
           regexp_replace(
             regexp_replace(raw, '[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}', '<EMAIL>', 'g'),
             '\b555-[0-9]{4}\b', '<PHONE>', 'g') AS redacted
         FROM raw ORDER BY doc_id""",

    // DuckDB list slices are 1-based inclusive: t[a+1 : a+64] = 64 tokens
    "qt13_chunking" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS t,
             CAST(len(string_split(text, ' ')) AS INTEGER) AS n
           FROM documents),
         st AS (SELECT doc_id, t, n,
             CAST(unnest(generate_series(0, n - 1, 48)) AS INTEGER) AS start
           FROM t WHERE n > 0)
         SELECT doc_id, CAST(start / 48 AS INTEGER) AS chunk_idx, start,
           least(64, n - start) AS chunk_tokens,
           md5(array_to_string(t[start + 1 : start + 64], ' ')) AS chunk_fp
         FROM st ORDER BY doc_id, chunk_idx""",

    "qd02_dedup_jaccard" -> jaccardSql,

    "qd03_dedup_minhash_lsh" -> jaccardSql,

    // the branch is invisible to the oracle: the published table equals
    // released docs + staged docs that survive decontamination (no
    // exact-jaccard >= 0.8 near-dup against ANY released doc) and the
    // n_chars quality gate
    "qp04_wap_pipeline" ->
      s"""WITH $shingleCte,
         jac AS (SELECT d1, d2 FROM pairs p
                 JOIN sizes s1 ON p.d1 = s1.doc_id
                 JOIN sizes s2 ON p.d2 = s2.doc_id
                 WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8),
         contaminated AS (SELECT DISTINCT d2 AS doc_id FROM jac
                          WHERE d1 < 120 AND d2 >= 120),
         final AS (SELECT * FROM documents
                   WHERE doc_id < 120
                      OR (doc_id NOT IN (SELECT doc_id FROM contaminated)
                          AND n_chars >= 100))
         SELECT lang, count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
         FROM final GROUP BY lang ORDER BY lang""",

    "qd06_dedup_clusters" ->
      s"""WITH RECURSIVE $shingleCte, $componentsCte
         SELECT cid AS cluster_id, count(*) AS n_docs
         FROM comp GROUP BY cid ORDER BY cluster_id""",

    // qd04: the engine bands 16-bit chunks for candidates; the oracle can
    // afford all-pairs. Equality holds because banding recall is total at
    // hamming <= 3 and both engines compute identical md5-slice bits.
    "qd04_dedup_simhash" ->
      """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                      FROM documents),
         h AS (SELECT doc_id,
                 CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT) AS h1,
                 CAST('0x' || substr(md5(tok), 9, 8) AS BIGINT) AS h2
               FROM tok),
         bi AS (SELECT unnest(generate_series(0, 63)) AS i),
         b AS (SELECT doc_id, bi.i,
                 sum(CASE WHEN ((CASE WHEN bi.i < 32 THEN h1 >> bi.i
                                 ELSE h2 >> (bi.i - 32) END) & 1) = 1
                     THEN 1 ELSE -1 END) AS c
               FROM h, bi GROUP BY 1, 2),
         fp AS (SELECT doc_id,
                 CAST(sum(CASE WHEN i < 32 AND c > 0
                          THEN CAST(1 AS BIGINT) << i ELSE 0 END) AS BIGINT) AS f1,
                 CAST(sum(CASE WHEN i >= 32 AND c > 0
                          THEN CAST(1 AS BIGINT) << (i - 32) ELSE 0 END) AS BIGINT) AS f2
                FROM b GROUP BY doc_id)
         SELECT x.doc_id AS d1, y.doc_id AS d2,
           CAST(bit_count(xor(x.f1, y.f1)) + bit_count(xor(x.f2, y.f2)) AS INTEGER)
             AS hamming
         FROM fp x JOIN fp y ON x.doc_id < y.doc_id
         WHERE bit_count(xor(x.f1, y.f1)) + bit_count(xor(x.f2, y.f2)) <= 3
         ORDER BY d1, d2""",

    "qd11_substring_dedup" ->
      """WITH toks AS (SELECT doc_id, string_split(text,' ') AS t FROM documents),
         ng AS (SELECT doc_id,
                  unnest(list_transform(generate_series(1, len(t)-7),
                         i -> array_to_string(t[i:i+7], ' '))) AS span
                FROM toks WHERE len(t) >= 8),
         dup AS (SELECT span, count(DISTINCT doc_id) AS n_docs,
                   count(*) AS n_occurrences
                 FROM ng GROUP BY span HAVING count(DISTINCT doc_id) >= 2),
         off AS (SELECT count(*) AS total_offset_rows,
                   count(DISTINCT doc_id) AS docs_with_dup_spans
                 FROM ng WHERE span IN (SELECT span FROM dup))
         SELECT d.span, d.n_docs, d.n_occurrences,
           o.total_offset_rows, o.docs_with_dup_spans
         FROM (SELECT * FROM dup
               ORDER BY n_docs DESC, n_occurrences DESC, span LIMIT 20) d, off o
         ORDER BY d.n_docs DESC, d.n_occurrences DESC, d.span""",

    "qd12_span_removal" ->
      """WITH toks AS (SELECT doc_id, lang, string_split(text,' ') AS t FROM documents),
         ng AS (SELECT doc_id, u.i - 1 AS start_token, u.s AS span FROM (
                  SELECT doc_id,
                    unnest(list_transform(generate_series(1, len(t)-7),
                      i -> struct_pack(i := i,
                             s := array_to_string(t[i:i+7], ' ')))) AS u
                  FROM toks WHERE len(t) >= 8)),
         dup AS (SELECT span FROM ng GROUP BY span
                 HAVING count(DISTINCT doc_id) >= 2),
         offs AS (SELECT ng.doc_id, ng.start_token, ng.span
                  FROM ng JOIN dup USING (span)),
         marked AS (SELECT doc_id, start_token,
                      row_number() OVER (PARTITION BY span
                        ORDER BY doc_id, start_token) AS rn
                    FROM offs),
         masks AS (SELECT doc_id, list(DISTINCT start_token) AS ms
                   FROM marked WHERE rn > 1 GROUP BY doc_id),
         clean AS (SELECT t.doc_id, t.lang,
             CASE WHEN m.ms IS NULL THEN array_to_string(t.t, ' ')
               ELSE array_to_string(list_filter(
                 list_transform(generate_series(1, len(t.t)),
                   i -> CASE WHEN len(list_filter(m.ms,
                          x -> i-1 >= x AND i-1 < x+8)) > 0
                        THEN NULL ELSE t.t[i] END),
                 v -> v IS NOT NULL), ' ') END AS clean_text,
             CASE WHEN m.ms IS NULL THEN 0
               ELSE len(list_filter(generate_series(1, len(t.t)),
                 i -> len(list_filter(m.ms,
                        x -> i-1 >= x AND i-1 < x+8)) > 0)) END AS removed
           FROM toks t LEFT JOIN masks m ON t.doc_id = m.doc_id)
         SELECT lang, count(*) AS n_docs,
           count(CASE WHEN removed > 0 THEN 1 END) AS docs_changed,
           CAST(sum(removed) AS BIGINT) AS tokens_removed,
           CAST(sum(len(clean_text)) AS BIGINT) AS clean_chars
         FROM clean GROUP BY lang ORDER BY lang""",

    "qd08_incremental_dedup" ->
      s"""WITH $shingleCte,
         co AS (SELECT doc_id, s FROM sh WHERE doc_id % 4 != 3),
         de AS (SELECT doc_id, s FROM sh WHERE doc_id % 4 = 3),
         xp AS (SELECT co.doc_id AS corpus_id, de.doc_id AS delta_id,
                  count(*) AS inter
                FROM co JOIN de ON co.s = de.s GROUP BY 1, 2)
         SELECT corpus_id, delta_id,
           round(inter*1.0/(s1.n_sh + s2.n_sh - inter), 4) AS jaccard
         FROM xp p JOIN sizes s1 ON p.corpus_id = s1.doc_id
                   JOIN sizes s2 ON p.delta_id = s2.doc_id
         WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8
         ORDER BY corpus_id, delta_id""",

    "qp03_lakehouse_pipeline" ->
      s"""WITH $shingleCte,
         co AS (SELECT doc_id, s FROM sh WHERE doc_id % 7 != 6),
         de AS (SELECT doc_id, s FROM sh WHERE doc_id % 7 = 6),
         xp AS (SELECT co.doc_id AS corpus_id, de.doc_id AS delta_id,
                  count(*) AS inter
                FROM co JOIN de ON co.s = de.s GROUP BY 1, 2)
         SELECT corpus_id, delta_id,
           round(inter*1.0/(s1.n_sh + s2.n_sh - inter), 4) AS jaccard
         FROM xp p JOIN sizes s1 ON p.corpus_id = s1.doc_id
                   JOIN sizes s2 ON p.delta_id = s2.doc_id
         WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8
         ORDER BY corpus_id, delta_id""",

    "qd09_index_dedup" ->
      s"""WITH $shingleCte,
         co AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 != 4),
         de AS (SELECT doc_id, s FROM sh WHERE doc_id % 5 = 4),
         xp AS (SELECT co.doc_id AS corpus_id, de.doc_id AS delta_id,
                  count(*) AS inter
                FROM co JOIN de ON co.s = de.s GROUP BY 1, 2)
         SELECT corpus_id, delta_id,
           round(inter*1.0/(s1.n_sh + s2.n_sh - inter), 4) AS jaccard
         FROM xp p JOIN sizes s1 ON p.corpus_id = s1.doc_id
                   JOIN sizes s2 ON p.delta_id = s2.doc_id
         WHERE inter*1.0/(s1.n_sh + s2.n_sh - inter) >= 0.8
         ORDER BY corpus_id, delta_id""",

    "qd07_decontaminate" ->
      """WITH sp AS (SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('e','f') AS is_eval
           FROM documents),
         toks AS (SELECT doc_id, is_eval, string_split(text,' ') AS t FROM sp),
         sh AS (SELECT DISTINCT doc_id, is_eval,
             unnest(list_transform(generate_series(1, len(t)-2),
                    i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
           FROM toks WHERE len(t) >= 3)
         SELECT tr.doc_id,
           CAST(count(DISTINCT tr.s) AS BIGINT) AS n_shared_shingles,
           CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_docs
         FROM sh tr JOIN sh ev ON tr.s = ev.s
         WHERE NOT tr.is_eval AND ev.is_eval
         GROUP BY tr.doc_id ORDER BY tr.doc_id""",

    "qd10_bloom_decontaminate" ->
      """WITH sp AS (SELECT doc_id, text,
             substr(md5(CAST(doc_id AS VARCHAR)), 32, 1) IN ('e','f') AS is_eval
           FROM documents),
         toks AS (SELECT doc_id, is_eval, string_split(text,' ') AS t FROM sp),
         sh AS (SELECT DISTINCT doc_id, is_eval,
             unnest(list_transform(generate_series(1, len(t)-2),
                    i -> t[i]||' '||t[i+1]||' '||t[i+2])) AS s
           FROM toks WHERE len(t) >= 3),
         hk AS (SELECT unnest([0, 1]) AS i),
         bits AS (SELECT DISTINCT
             CAST('0x' || substr(md5(s), 1 + 8 * hk.i, 8) AS BIGINT) % 65536 AS pos
           FROM sh, hk WHERE is_eval),
         tp AS (SELECT DISTINCT doc_id, s,
             CAST('0x' || substr(md5(s), 1 + 8 * hk.i, 8) AS BIGINT) % 65536 AS pos
           FROM sh, hk WHERE NOT is_eval),
         flags AS (SELECT tp.doc_id, tp.s,
             count(*) AS n_pos, count(bits.pos) AS n_set
           FROM tp LEFT JOIN bits ON tp.pos = bits.pos
           GROUP BY 1, 2)
         SELECT doc_id, count(*) AS n_flagged_shingles
         FROM flags WHERE n_set = n_pos
         GROUP BY doc_id ORDER BY doc_id""",

    "qd05_dedup_embedding" ->
      s"""WITH ${VectorQueries.seededPlanesCte(numPlanes = 16, dim = VectorQueries.dim)},
         b AS (SELECT e.vec_id AS doc_id, CAST(h.h_id // 4 AS INTEGER) AS band,
                 CAST(sum(CASE WHEN list_dot_product(CAST(e.embedding AS DOUBLE[]), h.hv) > 0
                               THEN CAST(power(2, h.h_id % 4) AS BIGINT) ELSE 0 END) AS BIGINT) AS bucket
               FROM embeddings e CROSS JOIN h GROUP BY 1, 2),
         cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
                  FROM b x JOIN b y
                  ON x.band = y.band AND x.bucket = y.bucket AND x.doc_id < y.doc_id)
         SELECT d1, d2,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])), 6) AS cosine
         FROM cand JOIN embeddings a ON cand.d1 = a.vec_id
                   JOIN embeddings c ON cand.d2 = c.vec_id
         WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                      CAST(c.embedding AS DOUBLE[])) >= 0.45
         ORDER BY d1, d2""",

    // clusters replay through qd06's recursive reachability; the keep rule
    // is per-cluster argmax (quality desc, doc_id asc) over qt03's quality
    "qd14_quality_retention" ->
      s"""WITH RECURSIVE $shingleCte, $componentsCte,
         q AS (SELECT doc_id,
                 round(least(1.0, len(t)/100.0) *
                   (len(list_distinct(t))*1.0/len(t)), 4) AS quality
               FROM toks),
         ranked AS (SELECT q.doc_id, comp.cid, comp.v, q.quality,
                 row_number() OVER (PARTITION BY comp.cid
                   ORDER BY q.quality DESC, q.doc_id) AS rn
               FROM q LEFT JOIN comp ON q.doc_id = comp.v)
         SELECT doc_id, COALESCE(cid, doc_id) AS cluster_id, quality,
           CASE WHEN v IS NULL THEN true ELSE rn = 1 END AS keep
         FROM ranked ORDER BY doc_id""",

    // the booleans are Spark-side enforcement/staging facts; the
    // published table replays as the LM-quality survivors (the rejected
    // batch must have left nothing; the audit deletions must be exactly
    // the nll > threshold docs)
    "qp06_governed_ingest" ->
      s"""WITH toks AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS t
                        FROM documents),
          bi AS (SELECT doc_id, lang,
                   unnest(list_transform(generate_series(1, len(t)-1),
                     i -> t[i]||' '||t[i+1])) AS bigram
                 FROM toks WHERE len(t) >= 2),
          c2all AS (SELECT bigram, count(*) AS c2 FROM bi
                 WHERE lang = '$lmRefLang' GROUP BY 1),
          c2 AS (SELECT bigram, c2 FROM c2all
                 ORDER BY c2 DESC, bigram LIMIT $lmModelBigrams),
          c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
                   CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
          v AS (SELECT count(DISTINCT w) AS v FROM
                  (SELECT unnest(t) AS w FROM toks WHERE lang = '$lmRefLang') u),
          lp AS (SELECT b.doc_id,
                   CAST(round(ln((COALESCE(c2.c2, 0) + 1.0) /
                                 (COALESCE(c1.c1, 0) + v.v)) * 1000000.0)
                     AS BIGINT) AS lp
                 FROM bi b
                 LEFT JOIN c2 ON b.bigram = c2.bigram
                 LEFT JOIN c1 ON string_split(b.bigram, ' ')[1] = c1.w1
                 CROSS JOIN v),
          nll AS (SELECT doc_id,
                    round((-CAST(sum(lp) AS DOUBLE) / count(*)) / 1000000.0, 4)
                      AS nll
                  FROM lp GROUP BY doc_id)
          SELECT true AS insert_rejected, true AS main_empty_pre_publish,
            t.lang, count(*) AS n_docs,
            CAST(sum(t.n_chars) AS BIGINT) AS total_chars
          FROM toks t LEFT JOIN nll ON t.doc_id = nll.doc_id
          WHERE nll.nll IS NULL OR nll.nll <= $lmKeepNll
          GROUP BY t.lang ORDER BY t.lang""",

    // replays the whole model: reference bigram/prefix counts, add-one
    // smoothing over the reference vocab, integer micro-nat quantization
    "qt16_lm_score" ->
      s"""WITH toks AS (SELECT doc_id, lang, string_split(text, ' ') AS t
                        FROM documents),
          bi AS (SELECT doc_id, lang,
                   unnest(list_transform(generate_series(1, len(t)-1),
                     i -> t[i]||' '||t[i+1])) AS bigram
                 FROM toks WHERE len(t) >= 2),
          c2all AS (SELECT bigram, count(*) AS c2 FROM bi
                 WHERE lang = '$lmRefLang' GROUP BY 1),
          c2 AS (SELECT bigram, c2 FROM c2all
                 ORDER BY c2 DESC, bigram LIMIT $lmModelBigrams),
          c1 AS (SELECT string_split(bigram, ' ')[1] AS w1,
                   CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
          v AS (SELECT count(DISTINCT w) AS v FROM
                  (SELECT unnest(t) AS w FROM toks WHERE lang = '$lmRefLang') u),
          lp AS (SELECT b.doc_id, b.lang,
                   CAST(round(ln((COALESCE(c2.c2, 0) + 1.0) /
                                 (COALESCE(c1.c1, 0) + v.v)) * 1000000.0)
                     AS BIGINT) AS lp
                 FROM bi b
                 LEFT JOIN c2 ON b.bigram = c2.bigram
                 LEFT JOIN c1 ON string_split(b.bigram, ' ')[1] = c1.w1
                 CROSS JOIN v)
          SELECT doc_id, lang, count(*) AS n_bigrams,
            round((-CAST(sum(lp) AS DOUBLE) / count(*)) / 1000000.0, 4) AS nll,
            round((-CAST(sum(lp) AS DOUBLE) / count(*)) / 1000000.0, 4)
              <= $lmKeepNll AS keep
          FROM lp GROUP BY doc_id, lang ORDER BY doc_id""",

    "qd13_semantic_dedup" ->
      s"""WITH ${VectorQueries.centroidCte},
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         a AS (SELECT vec_id, v, cluster FROM (
             SELECT e.vec_id, e.v, c.cluster,
               row_number() OVER (PARTITION BY e.vec_id
                 ORDER BY list_cosine_similarity(e.v, c.centroid) DESC, c.cluster) AS rn
             FROM e CROSS JOIN cent c) WHERE rn = 1),
         dup AS (SELECT DISTINCT y.vec_id
                 FROM a x JOIN a y
                 ON x.cluster = y.cluster AND x.vec_id < y.vec_id
                 AND list_cosine_similarity(x.v, y.v) >= 0.4)
         SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           a.vec_id NOT IN (SELECT vec_id FROM dup) AS keep
         FROM a ORDER BY vec_id"""
  )
}
