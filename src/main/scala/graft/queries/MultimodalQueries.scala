package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.operators.Multimodal

/** Multimodal-column plumbing exposed to the oracle harness. The payload
  * bytes come from a deterministic synthetic media table derived from
  * `documents` (no media files ship with the harness), so metadata/plan
  * queries are fully oracle-checkable; the decode path (`extractFeatures`
  * — real `javax.imageio` for image payloads, raw-byte lane sums for the
  * digest fixtures here) is covered by ScalaTest incl. a real-PNG decode.
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

    // Batched decode: bytes → 8-dim feature vector through the real
    // mapPartitions codec path (the fixture's digest payloads take the
    // raw-byte lane-sum branch — they are not images); the emitted
    // integer lane sums are exact, so the whole pipeline is hash-checked
    // against a DuckDB reconstruction of the md5-payload bytes (the
    // float view is f_q/255f — consistent by construction, ScalaTest).
    "mm4_decode_features" -> { (s, dir) =>
      Multimodal.extractFeatures(
        Multimodal.syntheticMedia(s, Tables.documents(s, dir))).toDF()
        .select(col("media_id"), col("media_type"), col("n_bytes"),
          element_at(col("feature_q"), 1).as("f0_q"),
          element_at(col("feature_q"), 8).as("f7_q"))
    },

    // Perceptual-style near-dup in FEATURE space: mm4's quantized lanes
    // bucketed by coarse bands (2 bands × 4 lanes, each lane div 64),
    // candidates only within shared buckets, then exact integer L1 ≤ 64
    // — the media analogue of dd2's LSH-then-verify. The corpus is
    // augmented with a RE-ENCODED copy of every 20th asset (id+10⁶,
    // normalized content: raw bytes differ, decoded content doesn't),
    // so the pairs mm5's byte checksum misses surface here with L1 = 0.
    // Everything integer: buckets, candidates, and the L1 verify are
    // engine-exact.
    "mm6_feature_neardup" -> { (s, dir) =>
      import graft.operators.TextAnalysis
      val base = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextAnalysis.normalizeText(col("text")).as("text"))
      val reEncoded = base.unionByName(
        base.filter(col("doc_id") % 20 === 0)
          .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
      val feats = Multimodal.extractFeatures(
          Multimodal.syntheticMedia(s, reEncoded)).toDF()
        .select(col("media_id"), col("feature_q")).transform(graft.operators.GlobalRank.pinned)
      val banded = feats.select(col("media_id"),
        posexplode(expr(
          """transform(sequence(0, 1), b -> concat_ws('_',
            |  transform(slice(feature_q, b * 4 + 1, 4),
            |    x -> cast(x div 64 as string))))""".stripMargin))
          .as(Seq("band", "bucket")))
      val cands = banded.as("l").join(banded.as("r"),
          col("l.band") === col("r.band") &&
            col("l.bucket") === col("r.bucket") &&
            col("l.media_id") < col("r.media_id"))
        .select(col("l.media_id").as("id_a"), col("r.media_id").as("id_b"))
        .distinct()
      cands
        .join(feats.select(col("media_id").as("id_a"),
          col("feature_q").as("fa")), "id_a")
        .join(feats.select(col("media_id").as("id_b"),
          col("feature_q").as("fb")), "id_b")
        .select(col("id_a"), col("id_b"),
          expr("""aggregate(zip_with(fa, fb, (a, b) -> abs(a - b)),
                 |0L, (acc, x) -> acc + x)""".stripMargin).as("l1"))
        .filter(col("l1") <= 64)
    },

    // MM10 (beyond reference): payload MAGIC-BYTE census — count and
    // size payloads by detected container format (PNG/JPEG/BMP prefix
    // match on the first bytes — the same gate the real decoder uses),
    // over a deterministically format-stamped slice of the corpus: the
    // format inventory a binary lake audit starts with (and the table
    // that says which codecs the decode tier must ship). Pure per-row
    // prefix compare; only the format rollup shuffles.
    "mm10_magic_census" -> { (s, dir) =>
      val media = Multimodal.syntheticMedia(s, Tables.documents(s, dir))
        .toDF()
        .withColumn("payload", expr(
          """case when media_id % 4 = 0
            |  then concat(unhex('89504E470D0A1A0A'), content)
            |when media_id % 4 = 1 then concat(unhex('FFD8FFE0'), content)
            |when media_id % 4 = 2 then concat(unhex('424D'), content)
            |else content end""".stripMargin.replace("\n", " ")))
      media.select(expr(
          """case when substring(hex(payload), 1, 16) = '89504E470D0A1A0A'
            |  then 'png'
            |when substring(hex(payload), 1, 4) = 'FFD8' then 'jpeg'
            |when substring(hex(payload), 1, 4) = '424D' then 'bmp'
            |else 'other' end""".stripMargin.replace("\n", " "))
          .as("format"),
          expr("octet_length(payload)").cast("bigint").as("nb"))
        .groupBy("format")
        .agg(count(lit(1)).as("n"), sum(col("nb")).as("total_bytes"))
    },

    // MM8 (beyond reference): payload BYTE-VALUE histogram — the
    // format-forensics profile of a binary column (uniform histogram ⇒
    // compressed/encrypted content; spiked ⇒ structured headers worth a
    // parser). Bytes stream out of the hex view two characters at a
    // time via a per-row array expression — no UDF, no byte-level
    // explode of raw binary through the shuffle; only the 256-bucket
    // rollup moves.
    "mm8_byte_histogram" -> { (s, dir) =>
      Multimodal.syntheticMedia(s, Tables.documents(s, dir)).toDF()
        .select(explode(expr(
          """transform(sequence(0, cast(octet_length(content) as int) - 1),
            |i -> conv(substr(hex(content), i * 2 + 1, 2), 16, 10))"""
            .stripMargin.replace("\n", " "))).as("b"))
        .select(col("b").cast("bigint").as("byte_val"))
        .groupBy("byte_val").agg(count(lit(1)).as("n"))
    },
  )

  private val mediaTypeSql =
    "(['image','audio','video'])[CAST(doc_id % 3 + 1 AS INTEGER)]"
  private val codecSql =
    "(['png','opus','h264'])[CAST(doc_id % 3 + 1 AS INTEGER)]"

  /** Lane j of decodeQuant over the 16 bytes of `h` (an md5 hex
    * expression): byte j + byte j+8, as hex-substring arithmetic
    * (mirrors mm4's f0/f7 terms). */
  private def laneSql(j: Int, h: String): String =
    s"""CAST(('0x' || substr($h, ${2 * j + 1}, 2)) AS BIGINT) +
       |CAST(('0x' || substr($h, ${2 * j + 17}, 2)) AS BIGINT)"""
      .stripMargin

  def oracleSql: Map[String, String] = Map(
    "mm6_feature_neardup" -> {
      val norm = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
      val lanes = (0 until 8).map(laneSql(_, "md5(t)"))
        .mkString("[", ",\n ", "]")
      val l1 = (1 to 8).map(i => s"abs(a.fq[$i] - b.fq[$i])")
        .mkString(" + ")
      s"""WITH docs2 AS (
         |  SELECT doc_id AS id, $norm AS t FROM documents
         |  UNION ALL
         |  SELECT doc_id + 1000000, $norm FROM documents
         |  WHERE doc_id % 20 = 0),
         |f AS MATERIALIZED (
         |  SELECT id, $lanes AS fq FROM docs2),
         |banded AS MATERIALIZED (
         |  SELECT id, b.b AS band,
         |    array_to_string(list_transform(fq[(b.b*4+1):(b.b*4+4)],
         |      x -> CAST(x // 64 AS VARCHAR)), '_') AS bucket
         |  FROM f CROSS JOIN (SELECT unnest(range(0, 2)) AS b) b),
         |cands AS (
         |  SELECT DISTINCT l.id AS id_a, r.id AS id_b
         |  FROM banded l JOIN banded r
         |    ON l.band = r.band AND l.bucket = r.bucket AND l.id < r.id)
         |SELECT c.id_a, c.id_b, CAST($l1 AS BIGINT) AS l1
         |FROM cands c JOIN f a ON c.id_a = a.id JOIN f b ON c.id_b = b.id
         |WHERE $l1 <= 64""".stripMargin
    },
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
    "mm10_magic_census" ->
      """WITH m AS (SELECT doc_id AS media_id, unhex(md5(text)) AS content
        |           FROM documents),
        |p AS (SELECT media_id,
        |  CASE WHEN media_id % 4 = 0
        |    THEN unhex('89504E470D0A1A0A') || content
        |  WHEN media_id % 4 = 1 THEN unhex('FFD8FFE0') || content
        |  WHEN media_id % 4 = 2 THEN unhex('424D') || content
        |  ELSE content END AS payload FROM m)
        |SELECT CASE WHEN substring(hex(payload), 1, 16) = '89504E470D0A1A0A'
        |    THEN 'png'
        |  WHEN substring(hex(payload), 1, 4) = 'FFD8' THEN 'jpeg'
        |  WHEN substring(hex(payload), 1, 4) = '424D' THEN 'bmp'
        |  ELSE 'other' END AS format,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(octet_length(payload)) AS BIGINT) AS total_bytes
        |FROM p GROUP BY 1""".stripMargin,
    "mm8_byte_histogram" ->
      """WITH h AS (SELECT md5(text) AS hx FROM documents),
        |b AS (SELECT CAST(('0x' ||
        |         substr(hx, CAST(i * 2 + 1 AS INTEGER), 2)) AS BIGINT)
        |         AS byte_val
        |      FROM h, unnest(range(0, 16)) AS t(i))
        |SELECT byte_val, CAST(COUNT(*) AS BIGINT) AS n
        |FROM b GROUP BY 1""".stripMargin,
  )
}
