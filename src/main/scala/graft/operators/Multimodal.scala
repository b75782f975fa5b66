package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 Part B "Multimodal columns"):
  * image/audio/video travel as opaque `binary` columns with a typed metadata
  * struct, and decode / feature-extract / frame-sample run as distributed
  * typed transforms over those columns.
  *
  * The IMAGE path is REAL: [[ImageCodec]] encodes/decodes/resizes PNGs with
  * the JDK's built-in `javax.imageio` (no external jars), executor-side in
  * `mapPartitions`. Audio/video codecs aren't in this environment, so the
  * generic [[DecodeStub.decode]] keeps a deterministic fake for those
  * modalities — the surrounding schema, batch shape, partitioning and
  * plumbing are identical, so swapping a real codec in is a one-function
  * change. (The PySpark equivalent is a pandas UDF over `mapInPandas`; in
  * Scala the idiomatic shape is a typed `mapPartitions` so the codec can
  * amortize per-batch init.)
  */
object Multimodal {

  /** One media row: id + opaque payload + metadata. */
  case class MediaRow(media_id: Long, payload: Array[Byte], content_type: String)

  /** Fake "decoded frame/feature" record — the schema a real decoder would
    * emit (dims + a small feature vector per sampled frame). */
  case class DecodedMedia(
      media_id: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      mean_byte: Double)

  /** Attach payload (binary) + metadata columns to any DataFrame with a
    * string content column (test-data stand-in for real media bytes). */
  def withBinaryPayload(df: DataFrame, idCol: String, contentCol: String,
                        contentType: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      col(contentCol).cast("binary").as("payload"),
      lit(contentType).as("content_type"))

  object DecodeStub {
    /** STUB codec: a real implementation would parse the container format.
      * This deterministic fake derives "dimensions" from the leading bytes
      * and a "feature" from the byte mean, so tests exercise real data
      * movement with verifiable output. */
    def decode(r: MediaRow): DecodedMedia = {
      val bytes = r.payload
      val b = (i: Int) => if (i < bytes.length) bytes(i) & 0xFF else 0
      val mean = if (bytes.isEmpty) 0.0
        else bytes.foldLeft(0L)((a, x) => a + (x & 0xFF)).toDouble / bytes.length
      DecodedMedia(
        media_id = r.media_id,
        width = 1 + (b(0) * 256 + b(1)) % 1024,
        height = 1 + (b(2) * 256 + b(3)) % 1024,
        n_frames = 1 + bytes.length / 64,
        mean_byte = mean)
    }
  }

  /** Distributed decode: one codec instance per partition (the real-world
    * pattern for native decoder init amortization). */
  def decodeAll(spark: SparkSession, media: Dataset[MediaRow]): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      // per-partition codec init would go here
      it.map(DecodeStub.decode)
    }
  }

  /** One REAL decoded image: dimensions + per-channel pixel means. */
  case class ImageDecoded(
      media_id: Long,
      width: Int,
      height: Int,
      mean_r: Double,
      mean_g: Double,
      mean_b: Double)

  /** REAL image codec on the JDK's built-in `javax.imageio` (PNG/JPEG/BMP/
    * GIF ship with every JRE — no external jars): encode, decode with
    * pixel statistics, and raster-resize. Used executor-side inside
    * `mapPartitions` — pure in-memory AWT (headless-safe), no display. */
  object ImageCodec {
    System.setProperty("java.awt.headless", "true")

    /** Deterministic solid-fill PNG — the generative twin of [[decode]]:
      * an oracle that knows (w, h, rgb) can verify the real decode
      * recovered them exactly (PNG is lossless). */
    def encodePng(width: Int, height: Int, r: Int, g: Int, b: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(width, height,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = img.createGraphics()
      try {
        g2.setColor(new java.awt.Color(r, g, b))
        g2.fillRect(0, 0, width, height)
      } finally g2.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** REAL decode: container parse + full raster scan. */
    def decode(mediaId: Long, bytes: Array[Byte]): ImageDecoded = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(img != null, s"media $mediaId: payload is not a decodable image")
      val (w, h) = (img.getWidth, img.getHeight)
      var (sr, sg, sb) = (0L, 0L, 0L)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val p = img.getRGB(x, y)
          sr += (p >> 16) & 0xFF; sg += (p >> 8) & 0xFF; sb += p & 0xFF
          x += 1
        }
        y += 1
      }
      val n = w.toLong * h
      ImageDecoded(mediaId, w, h, sr.toDouble / n, sg.toDouble / n, sb.toDouble / n)
    }

    /** REAL aspect-preserving raster resize to exactly (outW, outH):
      * bilinear re-render, re-encoded as PNG. */
    def resizePng(bytes: Array[Byte], outW: Int, outH: Int): Array[Byte] = {
      val src = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      require(src != null, "payload is not a decodable image")
      val dst = new java.awt.image.BufferedImage(outW, outH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = dst.createGraphics()
      try {
        g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g2.drawImage(src, 0, 0, outW, outH, null)
      } finally g2.dispose()
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(dst, "png", out)
      out.toByteArray
    }
  }

  /** Deterministic PNG corpus generated DISTRIBUTED (executor-side encode,
    * one codec per partition): dims and fill color derive from the id, so
    * a SQL oracle can predict what a real decode must recover. */
  def generateImages(spark: SparkSession, ids: DataFrame, idCol: String): Dataset[MediaRow] = {
    import spark.implicits._
    ids.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val w = 16 + (id % 32).toInt
        val h = 16 + ((id / 3) % 24).toInt
        MediaRow(id, ImageCodec.encodePng(w, h,
          (id % 256).toInt, (id * 7 % 256).toInt, (id * 13 % 256).toInt),
          "image/png")
      }
    }
  }

  /** Distributed REAL image decode ([[ImageCodec.decode]] per row,
    * mapPartitions so a heavier codec could amortize per-partition init). */
  def decodeImages(spark: SparkSession, media: Dataset[MediaRow]): Dataset[ImageDecoded] = {
    import spark.implicits._
    media.mapPartitions(it => it.map(r => ImageCodec.decode(r.media_id, r.payload)))
  }

  /** Resize planning: fit (width, height) within maxDim preserving aspect
    * ratio, integer arithmetic only. The byte-level rescale would live in
    * the stubbed codec; the dimension plan is pure column math and stays
    * inside whole-stage codegen (functions, not UDFs). */
  def resizeDims(decoded: DataFrame, maxDim: Int): DataFrame = {
    val m = greatest(col("width"), col("height"))
    def fit(side: org.apache.spark.sql.Column) =
      when(m > maxDim,
        greatest(lit(1), floor(side.cast("double") * maxDim / m).cast("int")))
        .otherwise(side).cast("int")
    decoded
      .withColumn("out_w", fit(col("width")))
      .withColumn("out_h", fit(col("height")))
  }

  /** Frame sampling stub: every `stride`-th byte as a "frame" id — keeps the
    * explode/repartition shape of real frame extraction. */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow], stride: Int): DataFrame = {
    import spark.implicits._
    media.flatMap { r =>
      r.payload.indices.by(stride).map(i => (r.media_id, i / stride, r.payload(i) & 0xFF))
    }.toDF("media_id", "frame_no", "frame_byte")
  }
}
