package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: find training documents that share n-gram
  * shingles with an evaluation/benchmark set, so they can be dropped (or
  * flagged) before training — the standard hygiene step of LLM corpus
  * curation (eval answers leaking into the training set inflate scores).
  *
  * Scale shape: the benchmark side is SMALL (eval suites are thousands of
  * documents, the corpus is billions), so its distinct shingle-hash set is
  * broadcast — the corpus is scanned ONCE, each document's shingles probed
  * against the broadcast hash set map-side, and only matching (doc,
  * shingle) rows enter the tiny aggregation shuffle. Nothing ever pairs
  * corpus documents with each other ([[Dedup]] handles intra-corpus
  * near-dup); the work is O(corpus tokens) + O(matches).
  *
  * Hashes are the 60-bit md5 family shared with [[Dedup]] (engine-
  * reproducible; per-pair collision odds ~1e-13 are noise next to the
  * shingle-match threshold).
  */
object Contamination {

  /** Per-document overlap report: corpus documents sharing at least
    * `minOverlap` distinct `shingleN`-gram shingles with ANY benchmark
    * document. Returns (doc_id, n_overlap, n_shingles, overlap_ratio) —
    * ratio is overlap / document's own distinct shingle count, so a short
    * quote in a long document scores low while an embedded eval item
    * scores near 1. */
  def contaminationReport(corpus: DataFrame, benchmark: DataFrame,
                          shingleN: Int = 3, minOverlap: Int = 1,
                          textCol: String = "text", idCol: String = "doc_id")
  : DataFrame = {
    require(minOverlap >= 1, "minOverlap must be at least 1")
    val corpusShingles = corpus.select(
      col(idCol).as("doc_id"),
      array_distinct(transform(
        Dedup.shinglesExpr(col(textCol), shingleN),
        s => graft.functions.HashExpressions.md5Prefix60(s))).as("hs"))
    // distinct benchmark shingle hashes: tiny, broadcast
    val benchHashes = broadcast(
      benchmark.select(explode(array_distinct(transform(
          Dedup.shinglesExpr(col(textCol), shingleN),
          s => graft.functions.HashExpressions.md5Prefix60(s)))).as("h"))
        .distinct())
    corpusShingles
      .select(col("doc_id"), size(col("hs")).as("n_shingles"),
        explode(col("hs")).as("h"))
      .join(benchHashes, "h") // broadcast hash join: map-side probe
      .groupBy("doc_id", "n_shingles")
      .agg(count(lit(1)).as("n_overlap"))
      .filter(col("n_overlap") >= minOverlap)
      .select(col("doc_id"), col("n_overlap"), col("n_shingles"),
        (col("n_overlap").cast("double") /
          col("n_shingles").cast("double")).as("overlap_ratio"))
  }

  /** Streaming-compatible decontamination GATE: a pure per-row predicate
    * that drops any document sharing a shingle hash with the benchmark —
    * the benchmark's distinct shingle hashes are folded into one Bloom
    * sketch at plan time (static side, built once), so the gate is a
    * narrow filter with CONSTANT memory and no state or join: exactly
    * what a `readStream` pipeline can run per micro-batch. Bloom false
    * positives drop a few clean documents (conservative direction for a
    * hygiene gate — tune `fpp` down if corpus yield matters); false
    * negatives don't exist, so no contaminated document passes the gate
    * that exact matching would have caught. */
  def bloomGate(docs: DataFrame, benchmark: DataFrame, shingleN: Int = 3,
                expectedShingles: Long = 1000000L, fpp: Double = 0.001,
                textCol: String = "text"): DataFrame = {
    import java.io.ByteArrayOutputStream
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.BinaryType
    val benchHashes = benchmark.select(explode(array_distinct(transform(
      Dedup.shinglesExpr(col(textCol), shingleN),
      s => graft.functions.HashExpressions.md5Prefix60(s)))).as("h"))
    val sketch = benchHashes.stat.bloomFilter("h", expectedShingles, fpp)
    val bos = new ByteArrayOutputStream()
    sketch.writeTo(bos)
    val bytes = bos.toByteArray
    def mightContain(h: org.apache.spark.sql.Column) =
      ColumnBridge.column(BloomFilterMightContain(
        Literal(bytes, BinaryType), ColumnBridge.expr(h)))
    docs.filter(!exists(
      transform(Dedup.shinglesExpr(col(textCol), shingleN),
        s => graft.functions.HashExpressions.md5Prefix60(s)),
      h => mightContain(h)))
  }

  /** The decontaminated corpus: drop every document the report flags.
    * Anti join against the (small) flagged-id set — broadcast, no
    * corpus shuffle. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    shingleN: Int = 3, minOverlap: Int = 1,
                    textCol: String = "text", idCol: String = "doc_id")
  : DataFrame = {
    val flagged = contaminationReport(corpus, benchmark, shingleN,
      minOverlap, textCol, idCol).select(col("doc_id").as(idCol))
    corpus.join(broadcast(flagged), Seq(idCol), "left_anti")
  }
}
