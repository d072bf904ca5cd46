package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Incremental aggregate maintenance: keep a small per-key STATE table of
  * algebraic aggregate components and fold each new delta batch into it,
  * so the rolled-up view is maintained without ever rescanning the base
  * data — the pattern that turns a daily 100 TB full recompute into a
  * merge of yesterday's state (one fixed-width row per key) with today's
  * delta partial. This is the materialized-view maintenance discipline
  * the reference's weekly incremental mode approximates by reprocessing
  * only the latest Grand Prix (/root/reference
  * `src/jobs/config/job_config.py:186-192`), generalized to any keyed
  * aggregate.
  *
  * Only MERGEABLE (commutative-monoid) components are stored: count, an
  * EXACT decimal sum (order-independent, so partial/merge grouping order
  * is irrelevant — a float sum would drift per merge schedule), min, max.
  * Derived values (avg = sum/cnt) are computed at read time from the
  * merged state, never stored — storing them would make the state
  * non-mergeable. Distinct counts need a sketch state instead
  * ([[Sketches]] HLL union follows the same merge algebra).
  *
  * Scale shape: `partialState` is one map-side-combined groupBy over the
  * delta (shuffles one row per (partition, key)); `merge` is a groupBy
  * over the union of fixed-width state rows — cost proportional to the
  * KEY cardinality, independent of the base-table row count. The state
  * table is the natural bucketing candidate ([[graft.io.ParquetSink
  * .writeBucketed]] on the key) so successive merges co-locate and skip
  * the exchange.
  */
object Incremental {

  /** Exact mergeable state of (count, sum, min, max) over `valueCol`
    * per `keyCol`: one partial-aggregated scan. */
  def partialState(df: DataFrame, keyCol: String, valueCol: String)
  : DataFrame =
    df.groupBy(col(keyCol))
      .agg(count(col(valueCol)).as("cnt"),
        sum(col(valueCol).cast(DecimalType(18, 2))).as("total_dec"),
        min(col(valueCol)).as("mn"),
        max(col(valueCol)).as("mx"))

  /** Fold any number of state tables into one: the monoid merge. Keys
    * absent from one side pass through unchanged (the common case — a
    * daily delta touches a sliver of the key space). */
  def merge(states: Seq[DataFrame]): DataFrame = {
    require(states.nonEmpty, "need at least one state table")
    states.reduce(_ unionByName _)
      .groupBy(col(states.head.columns.head))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("total_dec")).as("total_dec"),
        min(col("mn")).as("mn"),
        max(col("mx")).as("mx"))
  }

  /** Read-time view over a state table: exact decimal sum surfaced as
    * double plus the derived mean (one IEEE division on engine-identical
    * operands, so bit-stable across engines). */
  def readView(state: DataFrame): DataFrame =
    state.select(col(state.columns.head),
      col("cnt"),
      col("total_dec").cast(DoubleType).as("total"),
      col("mn"), col("mx"),
      (col("total_dec").cast(DoubleType) / col("cnt")).as("avg_value"))
}
