package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.{Sampling, Scoring, TextAnalysis}

/** Streaming (ingest-time) twins of the sampling-gate queries
  * s16/s18/s19 — the membership decisions a curation pipeline applies to
  * ARRIVING documents, proving batch ≡ stream exactly like the s1–s4
  * split gates and the dd16 cluster downweighter (StreamingSpec pins the
  * parity).
  *
  * Division of labor: LEARNING stays batch (the DSIR bucket
  * distributions, the SIR weight ceiling, the PPS step are corpus
  * statistics recomputed periodically — 64-to-1-row frames), while
  * APPLICATION is per-row and stateless (s16/s18) or single-cursor
  * sequential (s19), so the stream side never aggregates the corpus.
  */
object SamplingStreams {

  /** Stateless DSIR scorer for arriving documents: the s16 weight
    * `Σ_tokens lr(bucket(t))` computed as a pure projection against a
    * FROZEN 64-entry log-ratio table (batch-learned, broadcast as a map
    * literal) — no explode, no join, no state, so it runs in append
    * mode at ingest parallelism. `avg_micro` is the length-normalized
    * per-token log ratio (floor on double — logw can be negative, where
    * integer div truncates the wrong way; the s18 contract). Tokens
    * whose bucket is ABSENT from the frozen table are excluded from
    * BOTH `n_terms` and `logw_micro` — exactly what the batch
    * explode/inner-join rollup does against the same frozen table — so
    * batch ≡ stream holds even when arriving documents carry buckets
    * the learning pass never observed (counting them with a 0 ratio
    * would shift `avg_micro` and flip s18 gate membership). A document
    * with NO known-bucket token drops from the output, matching the
    * batch inner join yielding it zero rows. */
  def dsirScore(docs: DataFrame, ratioMicro: Map[Long, Long]): DataFrame = {
    val toks = split(TextAnalysis.normalizeText(col("text")), " ")
    val ratio = typedLit(ratioMicro)
    val known = filter(
      transform(toks, t => element_at(ratio, Scoring.tokenBucket(t, 64))),
      _.isNotNull)
    docs.select(col("doc_id"),
        size(known).cast("long").as("n_terms"),
        aggregate(known, lit(0L), (a, x) => a + x).as("logw_micro"))
      .filter(col("n_terms") > 0L)
      .withColumn("avg_micro",
        floor(col("logw_micro").cast("double") /
          col("n_terms").cast("double")).cast("bigint"))
  }

  /** Stateless SIR acceptance gate (the s18 log-space rule): accept iff
    * ln u < w̄ − w̄_max with the weight ceiling FROZEN from the batch
    * planning pass and u the stable md5 bucket — pure per-row
    * predicate, identical membership on batch and stream. */
  def sirGate(scored: DataFrame, wmaxMicro: Long): DataFrame =
    scored
      .withColumn("lnu_micro",
        floor(log((Sampling.bucket(col("doc_id"), "sir")
          .cast("double") + lit(0.5)) / lit(1000.0)) * lit(1e6))
          .cast("bigint"))
      .filter(col("lnu_micro") < col("avg_micro") - lit(wmaxMicro))

  /** One arriving document on the PPS token line. */
  case class PpsDoc(doc_id: Long, size: Long)
  /** An accepted document with its inclusion multiplicity. */
  case class PpsHit(doc_id: Long, size: Long, cum: Long, n_hits: Long)

  /** Streaming PPS SYSTEMATIC sampler (the s19 rule at ingest): lay
    * arriving documents' token counts end to end and emit those whose
    * span covers a lattice point m·step, with `step` FROZEN from the
    * batch planning pass. The running cursor is a single Long in
    * `mapGroupsWithState` under ONE logical group: the token line is
    * inherently sequential (each doc's span starts where the previous
    * ended), so the cursor is a one-row state, NOT a corpus aggregation
    * — the per-batch work is O(batch) and the state O(1). At cluster
    * scale the line is sharded (per source, per shard-step) and each
    * shard carries its own cursor; one global cursor is the
    * single-writer contract of an ordered ingest log. Documents must
    * arrive in line order across batches; within a batch the iterator
    * is sorted by doc_id (micro-batches may reorder). */
  def ppsSystematic(docs: Dataset[PpsDoc], step: Long): Dataset[PpsHit] = {
    require(step > 0, "step must be positive (frozen from the plan pass)")
    import docs.sparkSession.implicits._
    docs.groupByKey(_ => 0)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (_: Int, it: Iterator[PpsDoc], state: GroupState[Long]) =>
          var cum = state.getOption.getOrElse(0L)
          val hits = it.toSeq.sortBy(_.doc_id).flatMap { d =>
            val before = cum
            cum += d.size
            val n = cum / step - before / step
            if (n > 0) Some(PpsHit(d.doc_id, d.size, cum, n)) else None
          }
          state.update(cum)
          hits.iterator
      }
  }
}
