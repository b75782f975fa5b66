package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (SURVEY.md §2 Part B "Multimodal columns"):
  * image/audio/video travel as opaque `binary` columns with a typed metadata
  * struct, and decode / feature-extract / frame-sample run as distributed
  * typed transforms over those columns.
  *
  * The actual codec step is STUBBED (no image/audio libraries in this
  * environment): [[DecodeStub.decode]] produces a deterministic fake decode
  * from the bytes. Everything around it — schema, batch shape, partitioning,
  * the mapPartitions plumbing — is real: swapping in a real codec is a
  * one-function change. (The PySpark equivalent is a pandas UDF over
  * `mapInPandas`; in Scala the idiomatic shape is a typed
  * `mapPartitions` so the codec can amortize per-batch init.)
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
