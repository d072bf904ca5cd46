package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training-data pipelines: lay documents head-to-tail
  * in a deterministic order and cut the token stream into fixed-length
  * training sequences ("concat-and-chunk" — the standard pretraining
  * packing scheme, where a document may span a sequence boundary).
  *
  * This operator computes the PLAN of that layout, not the token movement:
  * each document's absolute token offset in its stream and the sequence
  * index where it starts. Downstream shard writers consume the plan; the
  * expensive token concatenation itself is embarrassingly parallel once
  * every document knows its offset.
  *
  * Scale shape: one window (partition by stream, order by the document
  * key) = one shuffle keyed on the stream column. Streams are whatever
  * unit must be contiguous (a language, a source, a shard) — at 100 TB the
  * stream key must have enough cardinality that a single stream fits an
  * executor's spillable sort, which is the same requirement any windowed
  * pipeline carries. The running sum is exact integer arithmetic, so the
  * layout is reproducible across engines and reruns.
  */
object Packing {

  /** Assign packing coordinates within each stream:
    *
    *  - `token_offset`: tokens laid down BEFORE this document (exclusive
    *    running sum in `orderCol` order);
    *  - `seq_idx`:      index of the `seqLen`-token training sequence the
    *    document STARTS in (`token_offset / seqLen`);
    *  - `seq_offset`:   position within that sequence.
    */
  def packSequences(df: DataFrame, streamCol: Column, orderCol: Column,
                    tokensCol: Column, seqLen: Int): DataFrame = {
    require(seqLen > 0, "seqLen must be positive")
    val w = Window.partitionBy(streamCol).orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offset = coalesce(sum(tokensCol).over(w), lit(0L))
    df.withColumn("token_offset", offset)
      .withColumn("seq_idx", floor(col("token_offset") / seqLen))
      .withColumn("seq_offset", col("token_offset") % seqLen)
  }

  /** Strided sliding-window chunking WITHIN a document: chunk i covers
    * tokens [i·stride, i·stride + size), the `size − stride` token
    * overlap carrying context across boundaries (the standard long-doc
    * treatment for pretraining and retrieval indexing, vs
    * [[packSequences]]'s cross-document concat-and-chunk). Emits the
    * chunk PLAN (doc_id, chunk_idx, tok_start, tok_end); pure per-row
    * explode over an integer sequence — narrow, no shuffle, and the
    * chunk count derives from the token count, so the plan is exact on
    * both engines. Every document emits at least one chunk (an empty
    * doc yields [0, 0) — dropping it silently would desync per-doc
    * bookkeeping downstream). */
  def overlapChunks(df: DataFrame, tokensCol: Column, size: Int,
                    stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      "need 0 < stride <= size")
    val lastIdx = greatest(
      floor((tokensCol.cast("double") - 1.0) / stride).cast("long"), lit(0L))
    df.withColumn("chunk_idx", explode(sequence(lit(0L), lastIdx)))
      .withColumn("tok_start", col("chunk_idx") * stride)
      .withColumn("tok_end",
        least(col("tok_start") + size, tokensCol.cast("bigint")))
  }
}
