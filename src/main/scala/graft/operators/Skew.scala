package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities. AQE's skew-join splitting (enabled in
  * [[graft.core.GraftSession]]) handles most runtime skew; these cover the
  * cases AQE cannot: heavily-skewed AGGREGATION keys, and joins where the
  * skewed key set is known up front.
  */
object Skew {

  /** Two-phase salted aggregation: partial-aggregate on (key, salt), then
    * finalize on key. Breaks a hot key across `saltFactor` reducers.
    * Correct for any decomposable aggregate passed as (partial, merge)
    * pairs — here specialized to the common count/sum shape.
    *
    * Salt is derived from stable row content (`hash` of all columns), not
    * `rand()`, so re-runs are deterministic.
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltFactor: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(count(lit(1)).as("__cnt"), sum(col(valueCol)).as("__sum"))
    partial.groupBy(keyCols.map(col): _*)
      .agg(sum(col("__cnt")).as("n_rows"),
        sum(col("__sum")).as(s"sum_$valueCol"))
  }

  /** Exact hot-key detection: one map-side-combined count pass over the
    * large side; only keys whose row count exceeds `avgMultiple` × the
    * mean per-key count come back to the driver. The driver holds the
    * heavy TAIL (a handful of keys), never the key domain — same
    * plan-time-metadata footprint as [[BloomJoin]]'s sketch literal.
    * The per-key count table is persisted so the mean pass and the
    * threshold filter share one aggregation of the input. */
  def hotKeys(df: DataFrame, key: String,
              avgMultiple: Double = 4.0): Seq[Any] = {
    require(avgMultiple > 1.0, "avgMultiple must exceed 1 (the mean)")
    val counts = df.filter(col(key).isNotNull)
      .groupBy(col(key)).agg(count(lit(1)).as("__n")).persist()
    try {
      val mean = counts.agg(avg(col("__n"))).head().getDouble(0)
      counts.filter(col("__n") >= mean * avgMultiple)
        .select(col(key)).collect().map(_.get(0)).toSeq
    } finally { counts.unpersist(); () }
  }

  /** [[saltedJoin]] with the skewed key set DETECTED rather than given:
    * counts the large side's keys, salts only the heavy tail. With no
    * detected skew this degrades to the plain equi-join (zero overhead
    * beyond the count pass). Inner-join semantics are preserved exactly,
    * including nulls: a null key never matches an equi-join, and the
    * null-valued `isin` gate drops null-keyed rows from both the skew
    * and residual paths — the same rows the plain join drops. */
  def saltedJoinAuto(large: DataFrame, small: DataFrame, key: String,
                     avgMultiple: Double = 4.0,
                     saltFactor: Int = 8): DataFrame = {
    val hot = hotKeys(large, key, avgMultiple)
    if (hot.isEmpty) large.join(small, Seq(key))
    else saltedJoin(large, small, key, hot, saltFactor)
  }

  /** Salted join for a known-skewed key set: replicate the small side
    * `saltFactor` times (explode), salt the large side deterministically,
    * and join on (key, salt). Keys outside `skewedKeys` take the normal
    * path; the union preserves exact join semantics. */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
                 skewedKeys: Seq[Any], saltFactor: Int = 8): DataFrame = {
    val isSkewed = col(key).isin(skewedKeys: _*)

    val largeSkew = large.filter(isSkewed)
      .withColumn("__salt",
        pmod(hash(large.columns.map(col).toIndexedSeq: _*), lit(saltFactor)))
    val smallSkew = small.filter(isSkewed)
      .withColumn("__salt",
        explode(sequence(lit(0), lit(saltFactor - 1))))
    val skewJoined = largeSkew.join(smallSkew, Seq(key, "__salt"))
      .drop("__salt")

    val rest = large.filter(!isSkewed).join(small.filter(!isSkewed),
      Seq(key))
    skewJoined.unionByName(rest)
  }
}
