package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table access over the harness star schema (TESTDATA.md).
  *
  * Mirrors the reference's bronze/silver readers
  * (`src/jobs/utils/data_access/bronze_readers.py:27-158`,
  * `silver_readers.py:146-216` in /root/reference) but Spark-first: we hand
  * Catalyst the base path and declarative filters and let
  * `PruneFileSourcePartitions` / `PushDownPredicates` do the pruning instead
  * of baking predicates into path strings.
  */
object Tables {
  /** Read one table of the harness dataset: `dir/name.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def events(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
