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
    val lg = left.select(leftId.as("lid"), leftStr.as("lstr"))
      .select(col("lid"), col("lstr"),
        explode(charNgrams(col("lstr"), ngram)).as("g"))
    val rg = right.select(rightId.as("rid"), rightStr.as("rstr"))
      .select(col("rid"), col("rstr"),
        explode(charNgrams(col("rstr"), ngram)).as("g"))
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

  /** Candidate pairs and exact distances: rows of `left` and `right`
    * whose strings share a sub-`maxGramDf` n-gram AND are within
    * `maxDistance` edits. Output: (lid, lstr, rid, rstr, dist). */
  def fuzzyJoin(left: DataFrame, leftId: Column, leftStr: Column,
                right: DataFrame, rightId: Column, rightStr: Column,
                maxDistance: Int, ngram: Int = 4, maxGramDf: Long = 1000)
  : DataFrame =
    candidatePairs(left, leftId, leftStr, right, rightId, rightStr,
        ngram, maxGramDf)
      .withColumn("dist",
        levenshtein(col("lstr"), col("rstr")).cast("bigint"))
      .filter(col("dist") <= maxDistance)
}
