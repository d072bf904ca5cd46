package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Bronze-layer reading (SURVEY.md §2.A3-A5, A12-A13), Spark-first.
  *
  * The reference bakes partition pruning into path strings with glob
  * wildcards (`bronze_readers.py:27-158` in /root/reference) and
  * re-derives missing partition columns by regex over file paths. Here the
  * base path is handed to Spark and filters are declarative — Catalyst's
  * `PruneFileSourcePartitions` turns them into partition pruning, visible
  * as `PartitionFilters` in the scan node — which survives any number of
  * partition values without path-string assembly.
  */
object BronzeReader {

  /** Partition-pruned scan: read the table root, filter on partition
    * columns (A3). `mergeSchema` tolerates drifting JSON-derived schemas
    * (A4). */
  def read(spark: SparkSession, root: String,
           year: Option[Int] = None, grandPrix: Option[String] = None,
           mergeSchema: Boolean = true): DataFrame = {
    val base = spark.read
      .option("mergeSchema", mergeSchema.toString)
      .parquet(root)
    val withYear = year.fold(base)(y => base.filter(col("year") === y))
    grandPrix.fold(withYear)(g =>
      withYear.filter(col("grand_prix") === g))
  }

  /** Partition-column recovery (A5): if a column is missing after read
    * (e.g. data written without Hive-style dirs), re-derive it from the
    * file path via `input_file_name` + `regexp_extract` — the reference's
    * defensive pattern (`sessions_transform.py:115-125`). */
  def recoverPartitionColumn(df: DataFrame, colName: String): DataFrame =
    if (df.columns.contains(colName)) df
    else df.withColumn(colName,
      regexp_extract(input_file_name(), s"$colName=([^/]+)", 1))

  /** Empty typed relation (A13): schema-correct empty frame when a scope
    * matches nothing (`sessions_transform.py:62-64`). */
  def emptyTyped(spark: SparkSession, schema: StructType): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[Row], schema)

  /** DDL-ish table registration (A12): persist as a managed table in the
    * session catalog if absent, mirroring CREATE TABLE IF NOT EXISTS. */
  def ensureTable(spark: SparkSession, df: DataFrame, table: String,
                  partitionCols: Seq[String] = Nil): Unit =
    if (!spark.catalog.tableExists(table)) {
      val w = df.write.format("parquet")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .saveAsTable(table)
    }
}
