package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Ingestion edge (SURVEY.md §2.A1-A2). The reference pulls JSON from a
  * REST API in the Airflow worker, converts via pandas, and lands Snappy
  * Parquet under Hive-style partition paths
  * (`src/dags/services/s3_writer.py:62-147` in /root/reference). In-engine
  * the equivalent is: staged JSON (fixtures stand in for the API) →
  * `spark.read.json` with an optional declared schema → partitioned
  * Parquet append. Schema-on-read plus an explicit landed schema keeps
  * drifting API payloads from corrupting bronze.
  */
object JsonIngest {

  /** Read staged JSON (one object per line). With `schema` declared the
    * scan skips inference (one pass, not two — at 100 TB inference is a
    * full extra read). */
  def readJson(spark: SparkSession, path: String,
               schema: Option[StructType] = None): DataFrame = {
    val r = spark.read
    schema.fold(r.option("inferSchema", "true"))(s => r.schema(s))
      .json(path)
  }

  /** Land a JSON batch as bronze: normalize the partition value the way
    * the reference normalizes GP names for paths (s3_writer.py:39-60),
    * then partitioned Snappy Parquet append. */
  def landBronze(df: DataFrame, root: String,
                 partitionCols: Seq[String]): Unit =
    df.write.mode("append")
      .option("compression", "snappy")
      .partitionBy(partitionCols: _*)
      .parquet(root)
}
