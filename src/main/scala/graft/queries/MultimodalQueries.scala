package graft.queries

import graft.core.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing (SURVEY.md §2 Part B "Multimodal
  * columns"): opaque binary payloads + typed metadata, base64 round-trips,
  * and the distributed decode stub. Document text stands in for media bytes
  * (no codec libraries in this environment — see Multimodal.DecodeStub).
  */
object MultimodalQueries extends QueryModule {

  override val queries: Map[String, Q] = Map(
    // --- binary payload + metadata + base64 round-trip ---
    "qm01_binary_payload" -> { (s, d) =>
      Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"),
          col("text").cast("binary").as("payload"))
        .select(
          col("doc_id"),
          length(col("payload")).as("n_bytes"),
          // Spark's base64 emits RFC-2045 76-char line chunks; strip them to
          // the canonical unchunked form (what DuckDB/java.util.Base64 emit)
          regexp_replace(base64(col("payload")), "[\\r\\n]", "").as("b64"),
          sha2(col("payload"), 256).as("sha256_hex"),
          (unbase64(base64(col("payload"))) === col("payload")).as("roundtrip_ok"))
        .orderBy("doc_id")
    },

    // --- LATE MATERIALIZATION (the I/O shape that matters when the
    //     payload column dwarfs the metadata: rank/select on metadata
    //     columns ONLY — that scan never reads the payload — then join
    //     the selected ids back to fetch payloads for just the winners.
    //     At 100 TB the heavy column is read for k rows per group, not
    //     the corpus; PlanShapeSpec asserts the ranking scan's
    //     ReadSchema excludes the payload) ---
    "qm06_late_materialization" -> { (s, d) =>
      import org.apache.spark.sql.expressions.Window
      val docs = Tables.documents(s, d)
      val w = Window.partitionBy("lang")
        .orderBy(col("n_chars").desc, col("doc_id"))
      val picked = docs.select(col("doc_id"), col("lang"), col("n_chars"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
      val payloads = docs
        .select(col("doc_id"), col("text").cast("binary").as("payload"))
      picked.join(payloads, "doc_id")
        .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"),
          length(col("payload")).as("n_bytes"),
          sha2(col("payload"), 256).as("sha256_hex"))
        .orderBy("lang", "rk")
    },

    // --- REAL distributed image decode (javax.imageio in mapPartitions):
    //     a deterministic PNG corpus is generated executor-side — dims and
    //     fill color derive from doc_id — then container-parsed and
    //     raster-scanned back. The oracle predicts what the real decode
    //     must recover (PNG is lossless), so a codec regression fails the
    //     hash ---
    "qm02_image_decode" -> { (s, d) =>
      val media = Multimodal.generateImages(s,
        Tables.documents(s, d).filter(col("doc_id") < 100), "doc_id")
      Multimodal.decodeImages(s, media)
        .toDF()
        .select(col("media_id"), col("width"), col("height"),
          round(col("mean_r"), 4).as("mean_r"),
          round(col("mean_g"), 4).as("mean_g"),
          round(col("mean_b"), 4).as("mean_b"))
        .orderBy("media_id")
    },

    // --- REAL aspect-fit resize: plan the target dims with codegen'd
    //     column math on the REAL decoded dims, execute the raster resize
    //     with the real codec, and verify by re-decoding — resized_ok is
    //     the re-decoded == planned check, end to end through actual PNG
    //     bytes ---
    "qm04_image_resize" -> { (s, d) =>
      import s.implicits._
      val media = Multimodal.generateImages(s,
        Tables.documents(s, d).filter(col("doc_id") < 100), "doc_id")
      val planned = Multimodal.resizeDims(
        Multimodal.decodeImages(s, media).toDF(), maxDim = 24)
        .select(col("media_id"), col("width"), col("height"),
          col("out_w"), col("out_h"))
      val byId = media.toDF().select(col("media_id"), col("payload"))
      val resized = planned.join(byId, "media_id")
        .select(col("media_id"), col("width"), col("height"),
          col("out_w"), col("out_h"), col("payload"))
        .as[(Long, Int, Int, Int, Int, Array[Byte])]
        .mapPartitions(_.map { case (id, w, h, ow, oh, bytes) =>
          val out = Multimodal.ImageCodec.resizePng(bytes, ow, oh)
          val re = Multimodal.ImageCodec.decode(id, out)
          (id, w, h, ow, oh, re.width == ow && re.height == oh)
        })
        .toDF("media_id", "width", "height", "out_w", "out_h", "resized_ok")
      resized.orderBy("media_id")
    },

    // --- per-modality inference batch shaping: route media by content
    //     type, then greedily fill fixed byte budgets per type with the
    //     distributed prefix-sum packer (qt08's operator on a second
    //     modality) — the batch-assembly step in front of GPU decode.
    //     Each type packs independently (the per-type calls are each
    //     fully distributed; types are a small constant) ---
    "qm05_media_batching" -> { (s, d) =>
      val types = Seq("audio", "image", "video")
      val media = Tables.documents(s, d)
        .select(col("doc_id"), col("n_chars").cast("long").as("n_bytes"),
          element_at(array(types.map(lit): _*),
            (col("doc_id") % 3).cast("int") + 1).as("media_type"))
      types.map { t =>
        graft.operators.Packing.packBudget(
            media.filter(col("media_type") === t), "doc_id", "n_bytes",
            budget = 4096L)
          .withColumn("media_type", lit(t))
      }.reduce(_.unionByName(_))
        .groupBy("media_type", "pack_id")
        .agg(count(lit(1)).as("n_items"), sum("n_bytes").as("batch_bytes"))
        .orderBy("media_type", "pack_id")
    },

    // --- frame-sampling stub (explode shape of frame extraction) ---
    "qm03_frame_sample" -> { (s, d) =>
      import s.implicits._
      val media = Multimodal.withBinaryPayload(
          Tables.documents(s, d).filter(col("doc_id") < 20),
          "doc_id", "text", "video/fake")
        .as[Multimodal.MediaRow]
      Multimodal.sampleFrames(s, media, stride = 16)
        .groupBy("media_id")
        .agg(count(lit(1)).as("n_frames"),
          round(avg(col("frame_byte")), 4).as("avg_frame_byte"))
        .orderBy("media_id")
    }
  )

  override val oracle: Map[String, String] = Map(
    "qm01_binary_payload" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           base64(encode(text)) AS b64, sha256(text) AS sha256_hex,
           true AS roundtrip_ok
         FROM documents WHERE doc_id < 100 ORDER BY doc_id""",

    // the ranking and the payload fetch replay as one query — late
    // materialization changes I/O order, never results
    "qm06_late_materialization" ->
      """SELECT lang, CAST(rk AS INTEGER) AS rk, doc_id, n_chars,
           CAST(octet_length(encode(text)) AS INTEGER) AS n_bytes,
           sha256(text) AS sha256_hex
         FROM (SELECT *,
                 row_number() OVER (PARTITION BY lang
                   ORDER BY n_chars DESC, doc_id) AS rk
               FROM documents)
         WHERE rk <= 3 ORDER BY lang, rk""",

    // the oracle predicts the REAL decode's output from the generative
    // parameters (solid-fill lossless PNG: means == fill color exactly)
    "qm02_image_decode" ->
      """SELECT doc_id AS media_id,
           CAST(16 + doc_id % 32 AS INTEGER) AS width,
           CAST(16 + (doc_id // 3) % 24 AS INTEGER) AS height,
           round(CAST(doc_id % 256 AS DOUBLE), 4) AS mean_r,
           round(CAST((doc_id * 7) % 256 AS DOUBLE), 4) AS mean_g,
           round(CAST((doc_id * 13) % 256 AS DOUBLE), 4) AS mean_b
         FROM documents WHERE doc_id < 100 ORDER BY media_id""",

    "qm04_image_resize" ->
      """WITH dec AS (
           SELECT doc_id AS media_id,
             CAST(16 + doc_id % 32 AS INTEGER) AS width,
             CAST(16 + (doc_id // 3) % 24 AS INTEGER) AS height
           FROM documents WHERE doc_id < 100)
         SELECT media_id, width, height,
           CAST(CASE WHEN greatest(width, height) > 24
                THEN greatest(1, CAST(floor(width * 24.0 / greatest(width, height)) AS INTEGER))
                ELSE width END AS INTEGER) AS out_w,
           CAST(CASE WHEN greatest(width, height) > 24
                THEN greatest(1, CAST(floor(height * 24.0 / greatest(width, height)) AS INTEGER))
                ELSE height END AS INTEGER) AS out_h,
           true AS resized_ok
         FROM dec ORDER BY media_id""",

    "qm05_media_batching" ->
      """WITH m AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS n_bytes,
             ['audio','image','video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type
           FROM documents),
         c AS (SELECT media_type, doc_id, n_bytes,
             sum(n_bytes) OVER (PARTITION BY media_type ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM m)
         SELECT media_type,
           CAST(floor((cum - n_bytes) / 4096.0) AS BIGINT) AS pack_id,
           count(*) AS n_items, CAST(sum(n_bytes) AS BIGINT) AS batch_bytes
         FROM c GROUP BY 1, 2 ORDER BY media_type, pack_id""",

    "qm03_frame_sample" ->
      """SELECT doc_id AS media_id,
           count(*) AS n_frames,
           round(avg(b), 4) AS avg_frame_byte
         FROM (SELECT doc_id,
                 unnest(list_transform(generate_series(1, length(text), 16),
                   i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS b
               FROM documents WHERE doc_id < 20)
         GROUP BY doc_id ORDER BY media_id"""
  )
}
