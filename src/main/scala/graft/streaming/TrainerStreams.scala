package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
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

  /** The fold form's EXECUTABLE scale bound (round-10 directive 2):
    * [[applyMerges]] folds one `aggregate` HOF per merge, so a table of
    * n merges builds an n-deep CodegenFallback expression tree — fine
    * at fixture scale, plan-size explosion (and per-level interpreted
    * eval) at a production ~30k-entry table. Past this bound,
    * pretokenize the vocabulary once with the training-side algebra
    * ([[graft.queries.TrainerQueries.pretokenizedVocab]]) and serve
    * word→tokens as a lookup join ([[tokenizeViaVocab]]). */
  val MaxFoldMerges = 64

  /** Tokenize one word column under a frozen merge list: characters,
    * then each merge applied greedily in learned order. Returns
    * `array<string>` of surviving symbols. Bounded at [[MaxFoldMerges]]
    * entries — see the bound's scaladoc for the scale form. */
  def applyMerges(word: Column, merges: Seq[(String, String)]): Column = {
    require(merges.size <= MaxFoldMerges,
      s"applyMerges folds one aggregate HOF per merge: ${merges.size} " +
        s"merges would build a ${merges.size}-deep CodegenFallback " +
        s"expression tree (bound $MaxFoldMerges) — pretokenize the " +
        "vocabulary once (TrainerQueries.pretokenizedVocab) and serve " +
        "word->tokens as a lookup join (tokenizeViaVocab) instead")
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

  /** The apply path's SCALE form: tokenize `wordCol` by equi-joining a
    * PRETOKENIZED static vocabulary (word, …, tokens) — on a stream
    * this is a stream-static join, valid in append mode with no state
    * store, no watermark; in batch it is the same plan. Serving cost is
    * independent of merge-table depth (the depth was paid once, at
    * vocabulary build). OOV words — absent from the vocabulary — keep
    * NULL tokens for the caller's policy, and BOTH documented policies
    * are exercised (round-11 directive 5): count-OOV-separately is
    * oracled end-to-end in `bpe4_tokenize_corpus` (vocabulary frozen on
    * yesterday's corpus half, today's whole corpus served — the OOV
    * columns are hash-checked against DuckDB), and the
    * route-stragglers-through-the-bounded-fold fallback is pinned in
    * StreamingSpec ("BPE vocab lookup-join apply": fold(oov) fills
    * exactly the NULL rows and in-vocab tokens are untouched).
    * StreamingSpec also pins stream ≡ batch ≡ fold-form tokens for
    * in-vocabulary words. */
  def tokenizeViaVocab(words: DataFrame, vocab: DataFrame,
                       wordCol: String = "word"): DataFrame =
    words.join(
      vocab.select(col("word").as(wordCol), col("tokens")),
      Seq(wordCol), "left")
}
