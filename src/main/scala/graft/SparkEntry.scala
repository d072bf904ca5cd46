package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates the per-category query maps; every key has matching
  * DuckDB SQL in `oracleSql` unless the operator is not SQL-expressible
  * (then the driver records a rows-only check).
  */
object SparkEntry {

  /** Flagship query (SURVEY §7.2 championship-tracker shape) on sf0.001:
    * 3-way join → per-customer running spend → per-date rank with tie-break
    * → gap to leader. Driver smoke-checks rows>0.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val joined = o
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"),
        col("o_totalprice"), col("n_name"))
    val running = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val perDate = Window.partitionBy(col("o_orderdate"))
    val withTotal = joined.withColumn("season_spend",
      sum(col("o_totalprice").cast(DecimalType(18, 2))).over(running).cast("double"))
    withTotal
      .withColumn("spend_rank", rank().over(
        perDate.orderBy(col("season_spend").desc, col("o_custkey").asc)))
      .withColumn("gap_to_leader",
        max(col("season_spend")).over(perDate) - col("season_spend"))
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.RelationalQueries.queries ++
      graft.queries.WindowQueries.queries ++
      graft.queries.ScalarQueries.queries ++
      graft.queries.EventQueries.queries ++
      graft.queries.TrainingDataQueries.queries ++
      graft.queries.MultimodalQueries.queries ++
      graft.queries.GoldQueries.queries ++
      graft.queries.SqlQueries.queries ++
      graft.queries.ScoringQueries.queries ++
      graft.queries.GraphQueries.queries ++
      graft.queries.ExperimentQueries.queries ++
      graft.queries.PrivacyQueries.queries ++
      graft.queries.TrainerQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.RelationalQueries.oracleSql ++
      graft.queries.WindowQueries.oracleSql ++
      graft.queries.ScalarQueries.oracleSql ++
      graft.queries.EventQueries.oracleSql ++
      graft.queries.TrainingDataQueries.oracleSql ++
      graft.queries.MultimodalQueries.oracleSql ++
      graft.queries.GoldQueries.oracleSql ++
      graft.queries.SqlQueries.oracleSql ++
      graft.queries.ScoringQueries.oracleSql ++
      graft.queries.GraphQueries.oracleSql ++
      graft.queries.ExperimentQueries.oracleSql ++
      graft.queries.PrivacyQueries.oracleSql ++
      graft.queries.TrainerQueries.oracleSql
}
