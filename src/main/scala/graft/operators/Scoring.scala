package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.HashExpressions.md5Prefix60

/** Model-based quality scoring for corpus curation — the fastText-style
  * "quality classifier" tier of an LLM data pipeline (score every document
  * with a cheap linear model, then gate/sample on the score), plus the
  * threshold-sweep evaluation that picks the operating point.
  *
  * 100 TB design:
  *  - [[hashedLinearScore]] is pure narrow per-row compute: tokens are
  *    hashed into a fixed feature dimension (the hashing trick — no
  *    vocabulary table at all) and the weight lookup folds over the token
  *    array inside codegen. Zero shuffles, zero state; the scan streams at
  *    parquet speed regardless of corpus size. A trained model is just a
  *    different weight vector — broadcast as a plan-time literal array,
  *    exactly like the harness's formula weights.
  *  - [[thresholdSweep]] aggregates to DISTINCT SCORES first (map-side
  *    combined shuffle), so the windowed cumulative pass runs over
  *    score-cardinality rows — bounded by the model's output range, not
  *    the corpus. The single-partition window is deliberate and safe: a
  *    linear model over a 64-dim hashed space emits a few hundred distinct
  *    integer scores no matter how many documents it scored.
  *
  * Determinism: scores are exact integer sums (weights and bias are
  * integers); precision/recall are single IEEE divisions of exact integer
  * counts — any engine reproduces them bit-for-bit.
  */
object Scoring {

  /** Hashing-trick feature bucket of a token: md5-derived 60-bit hash mod
    * the feature dimension (same engine-reproducible hash family as the
    * dedup fingerprints). */
  def tokenBucket(token: Column, dim: Int): Column =
    md5Prefix60(token) % dim

  /** The harness's deterministic "trained" weight for a feature bucket:
    * integers in [-10, 10]. A real deployment substitutes learned weights
    * (quantized to integers for engine-reproducible scoring — the lossless
    * trick used across this codebase for floats that must cross engines). */
  def formulaWeight(bucket: Column): Column =
    bucket * 37 % 21 - 10

  /** Score every document with a hashed-feature linear model:
    * `score = bias + Σ_tokens w(h(token) mod dim)`. Emits the token count
    * and a `keep` verdict at threshold 0 alongside the raw score. */
  def hashedLinearScore(docs: DataFrame, dim: Int = 64, bias: Long = -3L,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame =
    scoreWith(docs, b => formulaWeight(b), dim, bias, idCol, textCol)

  /** [[hashedLinearScore]] with EXTERNALLY-SUPPLIED trained weights: the
    * learned weight vector (quantized to integers — the lossless
    * cross-engine trick used throughout) rides into the plan as a literal
    * array, so the per-token lookup is a codegen `element_at` against a
    * broadcast constant: still zero shuffles, zero vocabulary table, and
    * swapping models means swapping one array. `weights.length` is the
    * feature dimension. */
  def linearScoreWithWeights(docs: DataFrame, weights: Array[Long],
                             bias: Long = 0L, idCol: String = "doc_id",
                             textCol: String = "text"): DataFrame = {
    require(weights.nonEmpty, "weight vector must be non-empty")
    val w = typedLit(weights.toSeq)
    scoreWith(docs,
      b => element_at(w, (b + 1).cast("int")),
      weights.length, bias, idCol, textCol)
  }

  private def scoreWith(docs: DataFrame, weight: Column => Column, dim: Int,
                        bias: Long, idCol: String,
                        textCol: String): DataFrame = {
    require(dim > 0, "feature dimension must be positive")
    val toks = split(TextAnalysis.normalizeText(col(textCol)), " ")
    docs
      .select(col(idCol), toks.as("toks"))
      .select(col(idCol),
        size(col("toks")).cast("bigint").as("n_terms"),
        aggregate(col("toks"), lit(bias),
          (acc, t) => acc + weight(tokenBucket(t, dim)))
          .as("score"))
      .withColumn("keep", col("score") >= 0)
  }

  /** Precision/recall at every distinct score threshold ("predict positive
    * when score >= t"), the curve that picks a quality-gate operating
    * point. Input: one row per scored item with an integer score column
    * and a boolean label column. Output: one row per distinct score. */
  def thresholdSweep(scored: DataFrame, scoreCol: String = "score",
                     labelCol: String = "label"): DataFrame = {
    val byScore = scored
      .groupBy(col(scoreCol).cast("bigint").as("threshold"))
      .agg(count(lit(1)).as("n"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("npos"))
    val desc = Window.orderBy(col("threshold").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val all = Window.partitionBy()
    byScore
      .select(col("threshold"),
        sum(col("n")).over(desc).as("pred_pos"),
        sum(col("npos")).over(desc).as("tp"),
        sum(col("npos")).over(all).as("total_pos"))
      .select(col("threshold"), col("pred_pos"), col("tp"),
        (col("pred_pos") - col("tp")).as("fp"),
        (col("total_pos") - col("tp")).as("fn"),
        (col("tp").cast("double") / col("pred_pos").cast("double"))
          .as("precision"),
        (col("tp").cast("double") / col("total_pos").cast("double"))
          .as("recall"))
  }
}
