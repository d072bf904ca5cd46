package graft.io

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** Zero-cost pipeline validation metrics (SURVEY.md §2.D7).
  *
  * The reference validates every transform with `df.count()` gates and
  * recount mismatch checks (`f1_bronze_to_silver_transform.py:442-447`,
  * `silver_readers.py:498-538`, `business_logic.py:669-743` in
  * /root/reference) — each one a full extra Spark job over the data. The
  * Spark-first restatement is `Dataset.observe`/CollectMetrics: the
  * aggregates are computed AS the write job streams past, so row counts
  * and quality counters cost nothing at 100 TB.
  */
object PipelineMetrics {

  /** Attach an [[Observation]] computing row count plus null-counts for
    * `keyCols` (the reference's required-column checks). Read the results
    * from the returned observation AFTER an action has run the frame. */
  def observed(df: DataFrame, name: String, keyCols: Seq[String])
  : (DataFrame, Observation) = {
    val obs = Observation(name)
    val metrics: Seq[Column] =
      count(lit(1)).as("n_rows") +:
        keyCols.map(c =>
          count(when(col(c).isNull, 1)).as(s"null_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** The reference's "points recalculation" style invariant counter: how
    * many rows fail `predicate` — again free, computed in-flight. A row
    * where the predicate evaluates to NULL (e.g. a range check over a null
    * column) is NOT satisfied and counts as a violation — `!predicate`
    * alone would be NULL there and silently pass the gate. */
  def observedInvariant(df: DataFrame, name: String, predicate: Column)
  : (DataFrame, Observation) = {
    val obs = Observation(name)
    (df.observe(obs,
      count(lit(1)).as("n_rows"),
      count(when(!coalesce(predicate, lit(false)), 1)).as("n_violations")), obs)
  }
}
