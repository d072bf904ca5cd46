package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One scored candidate entering MMR selection: `qv`/`nrm` are the
  * integer-quantized vector and its squared norm (sim1's exact-dot
  * contract), `cos_sim` the relevance to the query. */
case class MmrCandidate(query_id: Long, corpus_id: Long, cos_sim: Double,
                        qv: Array[Long], nrm: Long)

/** One MMR selection: `step` is the 1-based pick order. */
case class MmrPick(query_id: Long, step: Int, corpus_id: Long,
                   mmr_score: Double)

/** Maximal Marginal Relevance re-ranking: greedily pick the candidate
  * maximizing `lambda * rel(q,d) − mu * max_{s∈selected} sim(d,s)` — the
  * classic diversity selector (diverse training batches, deduped
  * retrieval results, coverage-first sampling).
  *
  * Distribution shape: candidate GENERATION is the distributed part
  * (top-k per query from sim1/sim3's scalable pipelines); the greedy
  * re-rank is inherently sequential in k but local to one query's
  * candidate list (≤ a few dozen rows), so it runs inside
  * `flatMapGroups` — one shuffle on query_id, then per-query O(k²·n)
  * arithmetic on in-memory arrays. This is the production ANN-then-MMR
  * split: never pairwise over the corpus, only over each query's
  * candidates.
  *
  * Determinism: relevance and pairwise similarities are exact integer
  * dots divided by products of correctly-rounded sqrts, and the greedy
  * loop scans candidates in ascending corpus_id with a strict `>` — so
  * ties pick the lowest id, and every score is bit-identical to the
  * oracle's unrolled-CTE replay (pass `lambda`/`mu` as literals parsed
  * identically by both engines; do NOT derive mu as `1 - lambda`, which
  * rounds differently than a decimal literal).
  */
object Mmr {

  def mmrSelect(cands: DataFrame, k: Int = 10, lambda: Double = 0.7,
                mu: Double = 0.3): DataFrame = {
    val spark = cands.sparkSession
    import spark.implicits._
    val ds = cands.select(col("query_id").cast("long"),
        col("corpus_id").cast("long"), col("cos_sim").cast("double"),
        col("qv"), col("nrm").cast("long"))
      .as[MmrCandidate]
    ds.groupByKey(_.query_id).flatMapGroups { (_, it) =>
      val arr = it.toArray.sortBy(_.corpus_id)
      def cos(a: MmrCandidate, b: MmrCandidate): Double = {
        var dot = 0L
        var i = 0
        while (i < a.qv.length) { dot += a.qv(i) * b.qv(i); i += 1 }
        dot.toDouble / (math.sqrt(a.nrm.toDouble) * math.sqrt(b.nrm.toDouble))
      }
      val selected = scala.collection.mutable.ArrayBuffer.empty[MmrCandidate]
      val out = scala.collection.mutable.ArrayBuffer.empty[MmrPick]
      var step = 1
      while (step <= k && selected.size < arr.length) {
        var best: MmrCandidate = null
        var bestScore = Double.NaN
        for (c <- arr if !selected.exists(_.corpus_id == c.corpus_id)) {
          val maxSel =
            if (selected.isEmpty) 0.0
            else selected.iterator.map(s => cos(c, s)).max
          val score = lambda * c.cos_sim - mu * maxSel
          if (best == null || score > bestScore) {
            best = c
            bestScore = score
          }
        }
        out += MmrPick(best.query_id, step, best.corpus_id, bestScore)
        selected += best
        step += 1
      }
      out.iterator
    }.toDF()
  }
}
