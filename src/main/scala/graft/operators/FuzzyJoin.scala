package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy string join (record linkage): match rows across two tables whose
  * string keys are within an edit-distance threshold — entity resolution
  * across sources (the "same supplier, differently spelled" problem of
  * corpus/metadata curation).
  *
  * The naive form is a cross join with `levenshtein() <= d` — quadratic,
  * dead at scale. The standard fix is n-gram BLOCKING: strings sharing at
  * least one (rare) character n-gram are candidates, everything else is
  * never compared. Two scale levers:
  *
  *  - candidates form inside n-gram buckets (an equi-join on the gram),
  *    like LSH bands — never the cross product;
  *  - grams whose document frequency exceeds `maxGramDf` are dropped
  *    BEFORE the candidate join ("stop-gram" pruning): ubiquitous grams
  *    (think "Corp", " Inc") would otherwise bucket everything with
  *    everything — the classic blocking-skew hot key. Rare grams carry
  *    all the linkage signal; a true near-match of distance d shares at
  *    least one unchanged n-gram run for any reasonable string length.
  *
  * Exact `levenshtein` then re-scores candidates only. Deterministic end
  * to end, so the whole pipeline (including the frequency pruning) is
  * reproducible in the DuckDB oracle.
  */
object FuzzyJoin {

  /** Distinct character n-grams of `s` as an array (positions 1-indexed;
    * strings shorter than `n` contribute themselves — substr truncates at
    * the end in both Spark and DuckDB). */
  def charNgrams(s: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(s) - (n - 1), lit(1))),
      i => s.substr(i, lit(n))))

  /** The BLOCKING stage alone: candidate pairs of `left` × `right` that
    * share at least one sub-`maxGramDf` n-gram — no distance verify yet.
    * Exposed separately so the blocking's recall/reduction can be audited
    * (er3) without paying the verify. Output: (lid, lstr, rid, rstr). */
  def candidatePairs(left: DataFrame, leftId: Column, leftStr: Column,
                     right: DataFrame, rightId: Column, rightStr: Column,
                     ngram: Int = 4, maxGramDf: Long = 1000): DataFrame = {
    // GRAIN (round-14 audit): the exploded gram tables are OCCURRENCE-
    // grain (~|string| rows per record — bytes comparable to the input),
    // so the round-13 unconditional pins are size-gated: below the gate
    // each table materializes once and feeds the df rollup AND the
    // candidate join; above it (corpus scale) the explode re-runs per
    // consumer — a scan-parallel recompute instead of writing the
    // exploded corpus through the block manager.
    val lg = left.select(leftId.as("lid"), leftStr.as("lstr"))
      .select(col("lid"), col("lstr"),
        explode(charNgrams(col("lstr"), ngram)).as("g"))
      .transform(graft.operators.GlobalRank.pinnedIfSmall)
    val rg = right.select(rightId.as("rid"), rightStr.as("rstr"))
      .select(col("rid"), col("rstr"),
        explode(charNgrams(col("rstr"), ngram)).as("g"))
      .transform(graft.operators.GlobalRank.pinnedIfSmall)
    // stop-gram pruning: document frequency across BOTH sides
    val keep = lg.select(col("g")).unionAll(rg.select(col("g")))
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxGramDf)
      .select("g")
    // one keep-join suffices: the g equi-join key is already confined to
    // kept grams by the left side
    lg.join(keep, "g").join(rg, "g")
      .select("lid", "lstr", "rid", "rstr").distinct()
  }

  /** SELF-join blocking (er1/er2/er4's record-dedup shape): ONE gram
    * table, exploded and pinned once, serves the df rollup and both join
    * sides — the generic path explodes the same strings four times. The
    * stop-gram gate is unchanged: the union df of a self pair is exactly
    * twice the single-side count, so `2·c(g) <= maxGramDf` keeps the
    * identical gram set (integers — no boundary drift). */
  def selfCandidatePairs(df: DataFrame, id: Column, str: Column,
                         ngram: Int = 4, maxGramDf: Long = 1000)
  : DataFrame = {
    // GRAIN: occurrence-grain gram table — size-gated pin (see
    // candidatePairs); the three consumers (df rollup + both join
    // sides) fall back to explode re-runs above the gate.
    val g = df.select(id.as("lid"), str.as("lstr"))
      .select(col("lid"), col("lstr"),
        explode(charNgrams(col("lstr"), ngram)).as("g"))
      .transform(graft.operators.GlobalRank.pinnedIfSmall)
    val keep = g.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") * 2 <= maxGramDf)
      .select("g")
    val rg = g.select(col("lid").as("rid"), col("lstr").as("rstr"),
      col("g"))
    g.join(keep, "g").join(rg, "g")
      .select("lid", "lstr", "rid", "rstr").distinct()
  }

  /** Exact distances for candidate pairs, verify step shared by
    * [[fuzzyJoin]] / [[fuzzySelfJoin]]: `levenshtein` with the threshold
    * argument — the banded O(len·d) form that abandons a pair as soon as
    * the distance provably exceeds `maxDistance` (returns −1 there,
    * filtered with the in-range rows), instead of filling the full
    * O(len²) matrix and discarding the value. Kept pairs carry the same
    * exact distance as the unbounded form. */
  private def verified(cands: DataFrame, maxDistance: Int): DataFrame =
    cands
      .withColumn("dist",
        levenshtein(col("lstr"), col("rstr"), maxDistance).cast("bigint"))
      .filter(col("dist").between(0, maxDistance))

  /** Candidate pairs and exact distances: rows of `left` and `right`
    * whose strings share a sub-`maxGramDf` n-gram AND are within
    * `maxDistance` edits. Output: (lid, lstr, rid, rstr, dist). */
  def fuzzyJoin(left: DataFrame, leftId: Column, leftStr: Column,
                right: DataFrame, rightId: Column, rightStr: Column,
                maxDistance: Int, ngram: Int = 4, maxGramDf: Long = 1000)
  : DataFrame =
    verified(candidatePairs(left, leftId, leftStr, right, rightId,
      rightStr, ngram, maxGramDf), maxDistance)

  /** [[fuzzyJoin]] of a table against itself (one pinned gram table —
    * see [[selfCandidatePairs]]). Output: (lid, lstr, rid, rstr, dist),
    * both orientations plus the self pairs, exactly like the generic
    * form fed twice with the same table. */
  def fuzzySelfJoin(df: DataFrame, id: Column, str: Column,
                    maxDistance: Int, ngram: Int = 4,
                    maxGramDf: Long = 1000): DataFrame =
    verified(selfCandidatePairs(df, id, str, ngram, maxGramDf),
      maxDistance)
}
