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
