package graft.streaming

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Apply side of the tokenizer-training family: segment words with a
  * FROZEN learned merge table (the standing learn-batch / apply-stream
  * division — same rule as SamplingStreams.dsirScore).
  *
  * Training (TrainerQueries.mergeRound) uses word-partitioned window
  * algebra, which Structured Streaming cannot run. Application doesn't
  * need it: with the merge list frozen, segmenting ONE word is a pure
  * per-row fold, expressed here as chained `aggregate` higher-order
  * functions — a stateless projection that runs UNCHANGED on a stream
  * (no state store, no watermark). Greedy left-to-right semantics fall
  * out of the fold: a merged symbol is strictly longer than the merge's
  * left symbol, so it can never re-match within the same pass (`aaa` +
  * (a,a) → acc=[aa] then "aa" ≠ "a" → [aa, a] — exactly the training
  * side's run-parity result; StreamingSpec pins the three-way equality
  * stream ≡ batch ≡ window algebra).
  *
  * HOF expressions are CodegenFallback (see the Dedup scaladoc note) —
  * fine for this per-word, bounded-length apply path. */
object TrainerStreams {

  /** Tokenize one word column under a frozen merge list: characters,
    * then each merge applied greedily in learned order. Returns
    * `array<string>` of surviving symbols. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column = {
    val chars = filter(split(word, "(?!^)"), s => s =!= lit(""))
    merges.foldLeft(chars) { case (syms, (l, r)) =>
      aggregate(syms, array().cast("array<string>"),
        (acc, s) =>
          when(size(acc) > 0 &&
              element_at(acc, -1) === lit(l) && s === lit(r),
            concat(slice(acc, lit(1), size(acc) - 1),
              array(concat(element_at(acc, -1), s))))
            .otherwise(concat(acc, array(s))))
    }
  }
}
