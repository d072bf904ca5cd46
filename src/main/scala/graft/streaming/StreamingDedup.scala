package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

import graft.functions.SignatureExpressions
import graft.operators.Dedup

/** Streaming near-duplicate detection — the Structured Streaming twin of
  * the batch MinHash+LSH pipeline (`operators.Dedup`), for dedup-at-ingest
  * in a training-data feed.
  *
  * Shape: the signature is the SAME narrow per-document computation as
  * batch (fused [[graft.functions.MinhashSignature]] kernel over
  * [[graft.functions.Md5Prefix60]] shingle hashes — no shuffle), then
  * documents explode into (band, bucket) cells and
  * `flatMapGroupsWithState` keyed by cell holds the ids seen in that
  * bucket. A new arrival emits one candidate pair per stored member
  * BEFORE joining the bucket — the candidate stream is incremental: each
  * pair appears when its second member lands.
  *
  * State hygiene: one record per active bucket holding at most
  * `maxPerBucket` ids (FIFO eviction — a bucket that collects unboundedly
  * many members is a degenerate band whose oldest entries are the least
  * likely future matches), and the whole bucket expires on an EVENT-TIME
  * TTL tied to the stream's watermark (the same mechanism as
  * [[EventStreams.gapSessionsCustom]]; a processing-time timeout would
  * schedule continuous no-data micro-batches). Both bounds are the knobs
  * a 100 TB ingest needs: state ∝ active buckets × maxPerBucket, not
  * corpus size.
  *
  * Pairs may repeat when two documents collide in several bands (the
  * batch pipeline's `.distinct()`); dedupe downstream with
  * `dropDuplicatesWithinWatermark` on (id_a, id_b) if exactly-once pairs
  * matter.
  */
object StreamingDedup {

  // public: Encoder codegen calls accessors from synthesized Java
  case class BucketState(members: List[Long], last_ms: Long)
  case class CandidatePair(id_a: Long, id_b: Long,
      band: Int, bucket: String)

  /** Stateless dedup-at-ingest against an EXISTING corpus: each
    * micro-batch's documents probe a STATIC LSH bucket index
    * ([[graft.operators.Dedup.bucketIndex]] of the corpus — built once
    * per generation, persisted/bucketed on the bucket key in practice).
    * Inner stream-static joins are stateless: no watermark, no state
    * store; per-batch cost is the batch's signatures plus one equi-join,
    * the streaming twin of
    * [[graft.operators.Dedup.minhashDedupIncremental]]. Emits
    * (id_a = corpus, id_b = stream) candidate pairs; a pair repeats when
    * the documents collide in several bands (dedupe downstream, as with
    * [[minhashCandidates]]). */
  def probeStaticIndex(index: DataFrame, stream: DataFrame,
                       idCol: String = "doc_id", textCol: String = "text",
                       numHashes: Int = 16, bands: Int = 4,
                       shingleN: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    val probe = stream
      .select(col(idCol).as("id_b"),
        SignatureExpressions.minhashSig(
          transform(
            array_distinct(Dedup.shinglesExpr(col(textCol), shingleN)),
            s => Dedup.baseHash(s)),
          numHashes).as("sig"))
      .select(col("id_b"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("_", transform(
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")))))
          .as(Seq("band", "bucket")))
    probe.join(index.select(col("id").as("id_a"), col("band"),
        col("bucket")), Seq("band", "bucket"))
      .select(col("id_a"), col("id_b"))
  }

  /** Candidate near-dup pairs from a streaming (id, ts, text) frame. */
  def minhashCandidates(docs: DataFrame, idCol: String = "doc_id",
                        tsCol: String = "ts", textCol: String = "text",
                        numHashes: Int = 16, bands: Int = 4,
                        shingleN: Int = 3, maxPerBucket: Int = 64,
                        watermark: String = "10 minutes",
                        stateTtlMs: Long = 30L * 60 * 1000)
  : Dataset[CandidatePair] = {
    import docs.sparkSession.implicits._
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands

    // narrow: fused signature per doc, then one row per band cell
    val banded = docs
      .withWatermark(tsCol, watermark)
      .select(col(idCol).as("doc"), col(tsCol).as("ts"),
        SignatureExpressions.minhashSig(
          transform(
            array_distinct(Dedup.shinglesExpr(col(textCol), shingleN)),
            s => Dedup.baseHash(s)),
          numHashes).as("sig"))
      .select(col("doc"), col("ts"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => concat_ws("_", transform(
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)),
            x => x.cast("string")))))
          .as(Seq("band", "bucket")))
      .as[(Long, Timestamp, Int, String)]

    banded
      .groupByKey { case (_, _, band, bucket) => (band, bucket) }
      .flatMapGroupsWithState[BucketState, CandidatePair](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case ((band, bucket), rows, state) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            // a bucket can receive data AFTER its ttl passed but BEFORE
            // the no-data timeout invocation fired — stale members must
            // not match (the ttl is a semantic bound, not just a cleanup)
            val prev = state.getOption
              .filter(s => s.last_ms + stateTtlMs >=
                state.getCurrentWatermarkMs())
              .getOrElse(BucketState(Nil, 0L))
            var members = prev.members
            var lastMs = prev.last_ms
            val out = Vector.newBuilder[CandidatePair]
            rows.foreach { case (id, t, _, _) =>
              lastMs = math.max(lastMs, t.getTime)
              if (!members.contains(id)) {
                members.foreach { m =>
                  out += CandidatePair(math.min(m, id),
                    math.max(m, id), band, bucket)
                }
                members = (id :: members)
                  .take(maxPerBucket) // FIFO bound per bucket
              }
            }
            state.update(BucketState(members, lastMs))
            // expire once the watermark passes last-seen + ttl (timeout
            // timestamps must sit above the current watermark)
            state.setTimeoutTimestamp(math.max(lastMs + stateTtlMs,
              state.getCurrentWatermarkMs() + 1))
            out.result().iterator
          }
      }
  }
}
