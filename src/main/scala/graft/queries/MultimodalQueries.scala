package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column plumbing exposed to the oracle harness. The payload
  * bytes come from a deterministic synthetic media table derived from
  * `documents` (no media files ship with the harness), so metadata/plan
  * queries are fully oracle-checkable; the stubbed decode path
  * (`extractFeatures`) is covered by ScalaTest + a rows-only entry.
  */
object MultimodalQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Binary payload + typed metadata projection.
    "mm1_media_meta" -> { (s, dir) =>
      Multimodal.syntheticMedia(s, Tables.documents(s, dir)).toDF()
        .select(col("media_id"), col("media_type"),
          octet_length(col("content")).cast("bigint").as("n_bytes"),
          col("width"), col("height"), col("duration_ms"), col("codec"))
    },

    // Exact BINARY dedup: checksum the payload bytes, keep the lowest
    // media id per digest — image/audio dedup-by-content, dd1's shape on
    // the binary column (the shuffle carries 16-byte digests, never
    // payloads).
    "mm5_payload_dedup" -> { (s, dir) =>
      Multimodal.syntheticMedia(s, Tables.documents(s, dir)).toDF()
        .groupBy(md5(hex(col("content"))).as("checksum"))
        .agg(min(col("media_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))
    },

    // Metadata-only resize plan — payload column pruned at scan.
    "mm2_resize_meta" -> { (s, dir) =>
      Multimodal.resizeMeta(
        Multimodal.syntheticMedia(s, Tables.documents(s, dir)).toDF(),
        maxDim = 512)
    },

    // Frame-sampling plan for video rows (one row per 25 s sample point).
    "mm3_frame_plan" -> { (s, dir) =>
      Multimodal.frameSamplePlan(
        Multimodal.syntheticMedia(s, Tables.documents(s, dir)).toDF(),
        everyMs = 25000)
        .select(col("media_id"), col("duration_ms"),
          col("frame_idx").cast("bigint").as("frame_idx"),
          col("frame_ts_ms"))
    },

    // Batched stub decode: bytes → 8-dim feature vector. The decode runs
    // through the real mapPartitions path; the emitted integer lane sums
    // are exact, so the whole decode pipeline is hash-checked against a
    // DuckDB reconstruction of the md5-payload bytes (the float view is
    // f_q/255f — consistent by construction, checked in ScalaTest).
    "mm4_decode_features" -> { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticMedia(s, Tables.documents(s, dir))).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          element_at(col("feature_q"), 1).as("f0_q"),
          element_at(col("feature_q"), 8).as("f7_q"))
    },
  )

  private val mediaTypeSql =
    "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)]"
  private val codecSql =
    "(['png','opus','h264'])[CAST(doc_id % 3 + 1 AS INTEGER)]"

  def oracleSql: Map[String, String] = Map(
    "mm1_media_meta" ->
      s"""SELECT doc_id AS media_id, $mediaTypeSql AS media_type,
         |CAST(octet_length(unhex(md5(text))) AS BIGINT) AS n_bytes,
         |CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
         |CAST(doc_id % 1080 + 1 AS INTEGER) AS height,
         |doc_id * 40 % 600000 AS duration_ms,
         |$codecSql AS codec
         |FROM documents""".stripMargin,
    "mm5_payload_dedup" ->
      """SELECT md5(hex(unhex(md5(text)))) AS checksum,
        |MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
        |FROM documents GROUP BY 1""".stripMargin,
    "mm2_resize_meta" ->
      s"""WITH m AS (SELECT doc_id AS media_id, $mediaTypeSql AS media_type,
         |  CAST(doc_id % 1920 + 1 AS INTEGER) AS width,
         |  CAST(doc_id % 1080 + 1 AS INTEGER) AS height FROM documents)
         |SELECT media_id, media_type, width, height,
         |CAST(FLOOR(width * least(512 / greatest(width, 1),
         |  512 / greatest(height, 1), 1.0)) AS INTEGER) AS resized_width,
         |CAST(FLOOR(height * least(512 / greatest(width, 1),
         |  512 / greatest(height, 1), 1.0)) AS INTEGER) AS resized_height
         |FROM m""".stripMargin,
    "mm4_decode_features" ->
      s"""SELECT doc_id AS media_id, $mediaTypeSql AS media_type,
         |CAST(octet_length(unhex(md5(text))) AS BIGINT) AS n_bytes,
         |CAST(('0x' || substr(md5(text), 1, 2)) AS BIGINT) +
         |CAST(('0x' || substr(md5(text), 17, 2)) AS BIGINT) AS f0_q,
         |CAST(('0x' || substr(md5(text), 15, 2)) AS BIGINT) +
         |CAST(('0x' || substr(md5(text), 31, 2)) AS BIGINT) AS f7_q
         |FROM documents""".stripMargin,
    "mm3_frame_plan" ->
      s"""WITH v AS (SELECT doc_id AS media_id, doc_id * 40 % 600000 AS duration_ms
         |  FROM documents WHERE doc_id % 3 = 2)
         |SELECT media_id, duration_ms,
         |CAST(ts // 25000 AS BIGINT) AS frame_idx,
         |ts AS frame_ts_ms
         |FROM v, unnest(range(0, greatest(duration_ms, 1), 25000)) AS t(ts)""".stripMargin,
  )
}
