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
}
