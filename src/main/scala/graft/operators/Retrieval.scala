package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-retrieval and language-model scoring over a document corpus —
  * the ranking/filtering layer of a training-data pipeline (reference has
  * no retrieval tier; this extends the documents-table operator family).
  *
  * Both operators are built for the 100 TB shape:
  *  - [[bm25]] is one narrow scan (per-row term counting inside codegen)
  *    plus ONE scalar aggregate broadcast back — no per-document shuffle
  *    at all, so it streams at parquet-scan speed.
  *  - [[unigramSurprisal]] shuffles once on the token for the vocabulary
  *    counts (map-side combined, vocabulary-sized result broadcast back)
  *    and once on the doc id for the per-document sum.
  *
  * Determinism contract (per the oracle harness): every float reduction is
  * either a fixed-order left-associative chain (BM25's per-term sum) or an
  * exact integer sum (surprisal's micro-nat quantization), and every `ln`
  * is quantized to integer micro-nats before further arithmetic — JVM
  * `Math.log` and C libm disagree by 1 ulp on some inputs (probed: they
  * differ on BM25's idf argument at harness scale), and the quantization
  * makes that irrelevant. All remaining ops are correctly-rounded IEEE
  * doubles in a fixed order, so any engine reproduces scores bit-for-bit.
  */
object Retrieval {

  /** Rank-fusion mass unit: 1e12 micro-units distributed as 1/(k+rank). */
  val RrfScale: Long = 1000000000000L

  /** Reciprocal-rank fusion of two rankings: each side is ranked by its
    * own score (descending, id-tiebroken), and a document's fused score
    * is `Σ RrfScale div (k + rank)` — the standard hybrid-retrieval
    * combiner (lexical BM25 + a second signal) that needs no score
    * calibration because only RANKS enter the sum. Integer `div` keeps
    * the fused score engine-exact.
    *
    * Ranking uses [[GlobalRank.withGlobalRowNumber]]'s two-pass range
    * layout — no single-partition exchange, so fusing full-corpus
    * rankings scales; the id join is a plain hash join. A document
    * missing from one side contributes 0 from that side (full-outer
    * semantics). Returns (id, rrf_micro, r_a, r_b). */
  def rrfFuse(a: DataFrame, b: DataFrame, idCol: String,
              aScore: String, bScore: String, k: Int = 60): DataFrame = {
    require(k >= 0, s"k must be nonnegative, got $k")
    val ra = GlobalRank.withGlobalRowNumber(a,
        Seq(col(aScore).desc, col(idCol).asc), out = "r_a")
      .select(col(idCol), col("r_a").cast("bigint").as("r_a"))
    val rb = GlobalRank.withGlobalRowNumber(b,
        Seq(col(bScore).desc, col(idCol).asc), out = "r_b")
      .select(col(idCol), col("r_b").cast("bigint").as("r_b"))
    ra.join(rb, Seq(idCol), "full_outer")
      .select(col(idCol),
        (coalesce(expr(s"$RrfScale div (${k}L + r_a)"), lit(0L)) +
          coalesce(expr(s"$RrfScale div (${k}L + r_b)"), lit(0L)))
          .as("rrf_micro"),
        col("r_a"), col("r_b"))
  }

  /** Okapi BM25 score of every document against a small fixed query-term
    * set (terms are plan-time literals — the realistic shape for corpus
    * curation probes, where the "query" is a handful of topic anchors).
    *
    * Emits per-term term frequencies, the whitespace doc length `dl`, and
    * the summed `bm25` score; documents containing no query term score
    * 0.0 and are retained (filtering is the caller's policy decision).
    *
    * The token array is materialized once in a lower projection and each
    * term's frequency is one array pass over it — the normalize+split work
    * is never repeated per term (CollapseProject keeps a non-cheap alias
    * referenced more than once un-inlined).
    */
  def bm25(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, idCol: String = "doc_id",
           textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size,
      "query terms must be non-empty and distinct")
    def tfCol(t: String) = s"tf_$t"
    val base = docs.select(col(idCol),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("toks"),
      TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val withTf = base.select(col(idCol) +: col("dl") +:
      terms.map(t => size(filter(col("toks"), x => x === lit(t)))
        .cast("bigint").as(tfCol(t))): _*)
      // GRAIN (round-14 audit): DOC-grain and narrow — id + dl + one
      // small int per term, ~40 B/doc ≈ 1e-4 of the scanned corpus bytes
      // at any scale. This is §8's "decide with small rows" proxy table:
      // pinning it once saves a second full corpus tokenize (the stats
      // aggregate AND the scoring pass both consume it), so the pin
      // stays UNCONDITIONAL — the reduction ratio, not the fixture size,
      // is what justifies it.
      .transform(graft.operators.GlobalRank.pinned)
    // one scalar row: corpus size, total tokens, per-term document freq —
    // broadcast back so scoring stays narrow
    val stats = withTf.agg(count(lit(1)).as("n"),
      sum(col("dl")).as("sdl") +: terms.map(t =>
        sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    val lenNorm = lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / avgdl)
    val score = terms.foldLeft(lit(0.0)) { (acc, t) =>
      val tf = col(tfCol(t)).cast("double")
      val df = col(s"df_$t").cast("double")
      // idf quantized to integer micro-nats: ln is the one op where JVM and
      // libm can differ by an ulp; everything after is exact-order IEEE
      val idf = floor(log((col("n").cast("double") - df + 0.5) /
        (df + 0.5) + 1.0) * lit(1e6)).cast("double") / lit(1e6)
      acc + idf * (tf * lit(k1 + 1)) / (tf + lenNorm)
    }
    scored.select(col(idCol) +: col("dl") +:
      terms.map(t => col(tfCol(t))) :+ score.as("bm25"): _*)
  }

  /** Dirichlet-smoothed query-likelihood score (Zhai & Lafferty's QL
    * model): `Σ_t ln((tf_t + μ·cf_t/C) / (dl + μ))`, the third classic
    * lexical ranker alongside [[bm25]] and [[tfidf]] — smoothing pulls
    * every term probability toward its collection frequency, so documents
    * are ranked by how much MORE likely they make the query than the
    * corpus background.
    *
    * Same 100 TB shape as BM25: one narrow codegen scan for per-document
    * term frequencies plus ONE scalar aggregate (collection token count
    * `C` and per-term collection frequencies `cf_t`) broadcast back — no
    * per-document shuffle. Each term's log-probability is quantized to
    * integer micro-nats (floor(ln·1e6)) so the per-document score is an
    * EXACT integer sum; the ln argument is a fixed-order IEEE tree over
    * integer inputs, reproducible bit-for-bit by any engine.
    *
    * Precondition: every query term must occur somewhere in the corpus
    * (cf_t > 0), else its zero-frequency documents hit ln(0). Returns
    * (id, dl, tf_*, qlm_micro). */
  def queryLikelihood(docs: DataFrame, terms: Seq[String],
                      mu: Double = 2000.0, idCol: String = "doc_id",
                      textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size,
      "query terms must be non-empty and distinct")
    require(mu > 0, s"Dirichlet mu must be positive, got $mu")
    def tfCol(t: String) = s"tf_$t"
    val base = docs.select(col(idCol),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("toks"),
      TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val withTf = base.select(col(idCol) +: col("dl") +:
      terms.map(t => size(filter(col("toks"), x => x === lit(t)))
        .cast("bigint").as(tfCol(t))): _*)
      // GRAIN: doc-grain narrow proxy table (~40 B/doc) — unconditional
      // pin; see bm25's grain note.
      .transform(graft.operators.GlobalRank.pinned)
    val stats = withTf.agg(sum(col("dl")).as("ctot"),
      terms.map(t => sum(col(tfCol(t))).as(s"cf_$t")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    // per-term integer micro-nats; the fold is an exact bigint sum.
    // A term with ZERO corpus frequency has p = 0 for every document —
    // ln(0) diverges between engines (Spark null vs DuckDB error), and
    // the term carries no ranking signal anyway, so it contributes 0
    // (the documented convention; this also guards ctot = 0).
    val score = terms.map { t =>
      when(col(s"cf_$t") === 0L, lit(0L)).otherwise(
        floor(log((col(tfCol(t)).cast("double") +
            lit(mu) * (col(s"cf_$t").cast("double") /
              col("ctot").cast("double"))) /
            (col("dl").cast("double") + lit(mu))) * lit(1e6))
          .cast("bigint"))
    }.reduce(_ + _)
    scored.select(col(idCol) +: col("dl") +:
      terms.map(t => col(tfCol(t))) :+ score.as("qlm_micro"): _*)
  }

  /** Log-scaled TF-IDF score of every document against a fixed query-term
    * set — the classic lexical-ranking complement to [[bm25]] (same probe
    * shape, different weighting: `(1 + ln tf) * (ln((N+1)/(df+1)) + 1)`,
    * the ltc scheme with add-one smoothing so df = N terms still carry
    * signal). Same 100 TB shape as BM25: one narrow codegen scan for the
    * term frequencies plus one scalar aggregate broadcast back — no
    * per-document shuffle.
    *
    * Both `ln` applications are quantized to integer micro-nats (see the
    * determinism contract above); the per-term sum is a fixed-order
    * left-associative chain of exact-order IEEE ops.
    */
  def tfidf(docs: DataFrame, terms: Seq[String], idCol: String = "doc_id",
            textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size,
      "query terms must be non-empty and distinct")
    def tfCol(t: String) = s"tf_$t"
    def qln(x: Column): Column =
      floor(log(x) * lit(1e6)).cast("double") / lit(1e6)
    val withTf = docs
      .select(col(idCol),
        split(TextAnalysis.normalizeText(col(textCol)), " ").as("toks"))
      .select(col(idCol) +: terms.map(t =>
        size(filter(col("toks"), x => x === lit(t)))
          .cast("bigint").as(tfCol(t))): _*)
      // GRAIN: doc-grain narrow proxy table — unconditional pin; see
      // bm25's grain note (same stats + scoring fan-out).
      .transform(graft.operators.GlobalRank.pinned)
    val stats = withTf.agg(count(lit(1)).as("n"), terms.map(t =>
      sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val score = terms.foldLeft(lit(0.0)) { (acc, t) =>
      val tf = col(tfCol(t)).cast("double")
      val idf = qln((col("n").cast("double") + 1.0) /
        (col(s"df_$t").cast("double") + 1.0)) + lit(1.0)
      acc + when(col(tfCol(t)) > 0, (qln(tf) + lit(1.0)) * idf)
        .otherwise(lit(0.0))
    }
    scored.select(col(idCol) +:
      terms.map(t => col(tfCol(t))) :+ score.as("tfidf"): _*)
  }

  /** BM25 AND ltc TF-IDF of every document against the SAME query-term
    * set, off ONE tokenized scan (round-14, ir3/ir14's shape: both
    * rankers previously scanned and tokenized the corpus separately).
    * The shared (id, dl, tf_*) proxy table is pinned once (doc-grain
    * narrow — see [[bm25]]'s grain note) and one broadcast stats row
    * carries n, Σdl and the per-term document frequencies — the union
    * of what the two scorers need (their df definitions are identical).
    * Score expressions are copied verbatim from [[bm25]] and [[tfidf]],
    * so both columns are bit-identical to the standalone operators
    * (the ir3/ir14 oracles replay the standalone formulations).
    * Returns (id, dl, tf_*, bm25, tfidf). */
  def bm25AndTfidf(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
                   b: Double = 0.75, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame = {
    require(terms.nonEmpty && terms.toSet.size == terms.size,
      "query terms must be non-empty and distinct")
    def tfCol(t: String) = s"tf_$t"
    def qln(x: Column): Column =
      floor(log(x) * lit(1e6)).cast("double") / lit(1e6)
    val base = docs.select(col(idCol),
      split(TextAnalysis.normalizeText(col(textCol)), " ").as("toks"),
      TextAnalysis.tokenCount(col(textCol)).as("dl"))
    val withTf = base.select(col(idCol) +: col("dl") +:
      terms.map(t => size(filter(col("toks"), x => x === lit(t)))
        .cast("bigint").as(tfCol(t))): _*)
      .transform(graft.operators.GlobalRank.pinned)
    val stats = withTf.agg(count(lit(1)).as("n"),
      sum(col("dl")).as("sdl") +: terms.map(t =>
        sum(when(col(tfCol(t)) > 0, 1L).otherwise(0L)).as(s"df_$t")): _*)
    val scored = withTf.crossJoin(broadcast(stats))
    val avgdl = col("sdl").cast("double") / col("n").cast("double")
    val lenNorm = lit(k1) * (lit(1 - b) + lit(b) * col("dl").cast("double") / avgdl)
    val bm25Score = terms.foldLeft(lit(0.0)) { (acc, t) =>
      val tf = col(tfCol(t)).cast("double")
      val df = col(s"df_$t").cast("double")
      val idf = floor(log((col("n").cast("double") - df + 0.5) /
        (df + 0.5) + 1.0) * lit(1e6)).cast("double") / lit(1e6)
      acc + idf * (tf * lit(k1 + 1)) / (tf + lenNorm)
    }
    val tfidfScore = terms.foldLeft(lit(0.0)) { (acc, t) =>
      val tf = col(tfCol(t)).cast("double")
      val idf = qln((col("n").cast("double") + 1.0) /
        (col(s"df_$t").cast("double") + 1.0)) + lit(1.0)
      acc + when(col(tfCol(t)) > 0, (qln(tf) + lit(1.0)) * idf)
        .otherwise(lit(0.0))
    }
    scored.select(col(idCol) +: col("dl") +: terms.map(t => col(tfCol(t))) :+
      bm25Score.as("bm25") :+ tfidfScore.as("tfidf"): _*)
  }

  /** Mean unigram surprisal (negative log-probability, in nats) of each
    * document under the corpus's own unigram distribution — the
    * perplexity-style quality filter of CCNet/Gopher-like pipelines:
    * out-of-distribution documents (rare-token soup) score high.
    *
    * Per-token `ln p(t)` is quantized to integer micro-nats BEFORE the
    * per-document reduction, so the sum is exact integer arithmetic —
    * order-independent and engine-reproducible. Documents with no tokens
    * have no distribution mass and drop out (callers treat absent = empty).
    */
  def unigramSurprisal(docs: DataFrame, idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
        explode(split(TextAnalysis.normalizeText(col(textCol)), " "))
          .as("token"))
      .filter(length(col("token")) > 0)
      // GRAIN (round-14 audit): token-OCCURRENCE grain — one row per
      // corpus token, bytes ≈ the corpus — so the round-13 pin is
      // size-gated: it feeds the vocabulary rollup AND the scoring join,
      // and above the gate those two consumers re-run the tokenize
      // (scan-parallel) rather than write the exploded corpus through
      // the block manager.
      .transform(graft.operators.GlobalRank.pinnedIfSmall)
    // GRAIN: vocabulary/type grain (≈ millions of rows at 100 TB) —
    // stays unconditionally pinned; it feeds the total AND the LM table.
    val counts = toks.groupBy("token").agg(count(lit(1)).as("cnt"))
      .transform(graft.operators.GlobalRank.pinned)
    val total = counts.agg(sum(col("cnt")).as("tot"))
    // vocabulary-sized (word-level vocab ≈ millions at 100 TB — broadcast
    // comfortably); micro-nats are negative longs
    val probs = broadcast(counts.crossJoin(broadcast(total))
      .select(col("token"),
        floor(log(col("cnt").cast("double") / col("tot").cast("double"))
          * lit(1e6)).cast("bigint").as("micro_nats")))
    toks.join(probs, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_toks"),
        sum(col("micro_nats")).as("sum_micro_nats"))
      .select(col(idCol), col("n_toks"), col("sum_micro_nats"),
        (-col("sum_micro_nats").cast("double") / lit(1e6) /
          col("n_toks").cast("double")).as("mean_surprisal_nats"))
  }
}
