package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.{BronzeReader, JsonIngest}

class SourcesSpec extends SparkSpec {

  test("json ingest: declared-schema read, partitioned snappy landing") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(Paths.get(s"$dir/batch.json"),
      """{"session_key": 101, "grand_prix": "bahrain", "year": 2025, "position": 1}
        |{"session_key": 101, "grand_prix": "bahrain", "year": 2025, "position": 2}
        |{"session_key": 201, "grand_prix": "sao_paulo", "year": 2025, "position": 1}
        |""".stripMargin)
    val schema = StructType(Seq(
      StructField("session_key", LongType),
      StructField("grand_prix", StringType),
      StructField("year", IntegerType),
      StructField("position", IntegerType)))
    val df = JsonIngest.readJson(spark, s"$dir/batch.json", Some(schema))
    assert(df.schema == schema)
    JsonIngest.landBronze(df, s"$dir/bronze", Seq("year", "grand_prix"))
    // partition layout on disk + pruned read-back
    assert(Files.exists(Paths.get(s"$dir/bronze/year=2025/grand_prix=bahrain")))
    val back = BronzeReader.read(spark, s"$dir/bronze",
      grandPrix = Some("bahrain"))
    assert(back.count() == 2)
  }

  test("catalog registration: ensureTable + spark.table scan (A7/A12)") {
    import spark.implicits._
    val tbl = "graft_test_drivers"
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    BronzeReader.ensureTable(spark,
      Seq((1, "Red Bull"), (44, "Ferrari")).toDF("driver_number", "team"),
      tbl)
    assert(spark.catalog.tableExists(tbl))
    assert(spark.table(tbl).count() == 2)
    // idempotent: second call must not fail or duplicate
    BronzeReader.ensureTable(spark,
      Seq((81, "McLaren")).toDF("driver_number", "team"), tbl)
    assert(spark.table(tbl).count() == 2)
    spark.sql(s"DROP TABLE $tbl")
  }
}
