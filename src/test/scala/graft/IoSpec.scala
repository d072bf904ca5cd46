package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.io.ParquetSink

class IoSpec extends SparkSpec {

  test("dynamic partition overwrite replaces only touched partitions") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_dpo").toString + "/t"
    val v1 = Seq((1, "a", 10), (2, "a", 20), (3, "b", 30))
      .toDF("id", "gp", "v")
    ParquetSink.overwrite(v1, dir, Seq("gp"))
    // rewrite only partition a with new content
    val v2 = Seq((9, "a", 99)).toDF("id", "gp", "v")
    ParquetSink.overwritePartitions(v2, dir, Seq("gp"))
    val back = spark.read.parquet(dir).collect()
      .map(r => (r.getAs[Int]("id"), r.getAs[String]("gp"))).toSet
    assert(back == Set((9, "a"), (3, "b")))
    // the dynamic mode must be scoped to the write, not leaked into the
    // shared session conf (would flip later overwrites to dynamic)
    assert(spark.conf.get("spark.sql.sources.partitionOverwriteMode",
      "STATIC").equalsIgnoreCase("static"))
  }

  test("observe metrics ride the action instead of extra count() jobs") {
    import spark.implicits._
    import graft.io.PipelineMetrics
    val df = Seq((1, Some("a")), (2, None), (3, Some("c")))
      .toDF("id", "name")
    val (observed, obs) = PipelineMetrics.observed(df, "silver_gate",
      Seq("name"))
    val dir = Files.createTempDirectory("graft_obs").toString + "/t"
    observed.write.parquet(dir) // the ONLY job; metrics piggyback on it
    assert(obs.get("n_rows") == 3L)
    assert(obs.get("null_name") == 1L)

    val (checked, inv) = PipelineMetrics.observedInvariant(df.toDF(),
      "points_check", col("id") <= 2)
    checked.write.mode("overwrite").format("noop").save()
    assert(inv.get("n_violations") == 1L)
  }

  test("append adds rows; atomicRewrite swaps table derived from itself") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft_ar").toString + "/t"
    ParquetSink.overwrite(Seq((1, 1.0), (2, 2.0)).toDF("id", "v"), dir)
    ParquetSink.append(Seq((3, 3.0)).toDF("id", "v"), dir)
    val t = spark.read.parquet(dir)
    assert(t.count() == 3)
    // derive from the table itself and rewrite in place
    ParquetSink.atomicRewrite(t.filter(col("id") =!= 2), dir)
    val back = spark.read.parquet(dir).select("id").collect()
      .map(_.getInt(0)).toSet
    assert(back == Set(1, 3))
  }

  test("conform reorders columns to declared schema") {
    import spark.implicits._
    val df = Seq((1.0, "x", 5)).toDF("b", "c", "a")
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("a",
        org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("b",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("c",
        org.apache.spark.sql.types.StringType)))
    assert(ParquetSink.conform(df, schema).columns.toSeq ==
      Seq("a", "b", "c"))
  }
}
