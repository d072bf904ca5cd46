package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines.
  *
  * Media payloads are opaque `binary` columns plus a typed metadata struct;
  * decode / feature-extraction runs batched per partition via
  * `mapPartitions` over a typed Dataset (the Scala analogue of arrow-batched
  * Python UDFs): one decoder instance per partition, streamed rows, no
  * per-row initialization. At 100 TB the payload column dominates I/O, so
  * everything metadata-only must prune it — schema keeps `content` in its
  * own column so Parquet column pruning skips the bytes entirely unless a
  * stage actually decodes.
  *
  * The codec layer itself is STUBBED (no image/audio libraries in this
  * environment): `decodeStub` derives deterministic pseudo-features from the
  * payload bytes. The Spark-side contract — schema, batching, partitioning,
  * output shape — is real and tested; swap `decodeStub` for a real decoder
  * to productionize.
  */
object Multimodal {

  /** Typed media row: payload + metadata. */
  case class MediaRecord(
      media_id: Long,
      media_type: String, // image | audio | video
      content: Array[Byte],
      width: Int,
      height: Int,
      duration_ms: Long,
      codec: String)

  case class MediaFeatures(
      media_id: Long,
      media_type: String,
      n_bytes: Long,
      feature: Array[Float],
      feature_q: Array[Long])

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("duration_ms", LongType, nullable = false),
    StructField("codec", StringType, nullable = false)))

  /** Deterministic synthetic media table derived from `documents` — stands
    * in for a real ingest while keeping every byte reproducible. */
  def syntheticMedia(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("media_id"),
        element_at(typedLit(Seq("image", "audio", "video")),
          (col("doc_id") % 3 + 1).cast("int")).as("media_type"),
        to_binary(md5(col("text")), lit("hex")).as("content"),
        (col("doc_id") % 1920 + 1).cast("int").as("width"),
        (col("doc_id") % 1080 + 1).cast("int").as("height"),
        (col("doc_id") * 40 % 600000).as("duration_ms"),
        element_at(typedLit(Seq("png", "opus", "h264")),
          (col("doc_id") % 3 + 1).cast("int")).as("codec"))
      .as[MediaRecord]
  }

  /** STUB decoder: real systems call an image/audio codec here. Produces a
    * deterministic 8-dim pseudo-feature from the payload so the pipeline
    * shape (bytes → feature vector) is exercised end-to-end. The integer
    * lane sums are the primitive (exact, engine-reproducible — the oracle
    * hash-checks them); the float view divides once at the end, so the
    * two are consistent by construction. */
  private[operators] def decodeQuant(content: Array[Byte]): Array[Long] = {
    // ??? <- real codec goes here; deterministic fake below.
    val out = new Array[Long](8)
    if (content != null) {
      var i = 0
      while (i < content.length) {
        out(i % 8) += (content(i) & 0xFF)
        i += 1
      }
    }
    out
  }

  private[operators] def decodeStub(content: Array[Byte]): Array[Float] =
    decodeQuant(content).map(_ / 255.0f)

  /** Batched feature extraction: one decoder per partition, streamed rows.
    * Partition count should target ~128 MB of payload per task at scale —
    * callers repartition upstream on a size estimate, not here. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init (real codecs allocate decode contexts here)
      rows.map { m =>
        val q = decodeQuant(m.content)
        MediaFeatures(m.media_id, m.media_type,
          if (m.content == null) 0L else m.content.length.toLong,
          q.map(_ / 255.0f), q)
      }
    }
  }

  /** Stub "resize": metadata-only transform — never touches the payload
    * column, so Parquet scans prune `content` entirely. */
  def resizeMeta(media: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(
      lit(maxDim) / greatest(col("width"), lit(1)),
      lit(maxDim) / greatest(col("height"), lit(1)),
      lit(1.0))
    media.select(col("media_id"), col("media_type"),
      col("width"), col("height"),
      floor(col("width") * scale).cast("int").as("resized_width"),
      floor(col("height") * scale).cast("int").as("resized_height"))
  }

  /** Frame-sample plan for video rows: one output row per sampled frame
    * timestamp (every `everyMs`), payload untouched. posexplode keeps it
    * columnar; at scale this is the pre-decode shard list handed to workers.
    */
  def frameSamplePlan(media: DataFrame, everyMs: Long): DataFrame =
    media.filter(col("media_type") === "video")
      .select(col("media_id"), col("duration_ms"),
        posexplode(sequence(lit(0L), greatest(col("duration_ms") - 1, lit(0L)),
          lit(everyMs))).as(Seq("frame_idx", "frame_ts_ms")))
}
