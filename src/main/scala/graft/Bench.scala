package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark main: runs every `SparkEntry.queries` entry on
  * `SPARK_GRAFT_SF_DIR` and prints ONE JSON line with per-query and total
  * seconds.
  *
  * Measurement notes:
  *  - results are fully materialized via the `noop` sink (a bare `count()`
  *    lets Catalyst prune projections, which would under-measure);
  *  - a small warm-up action runs first so JVM/classloader/codegen
  *    first-touch cost is not billed to the first query;
  *  - AQE is on, shuffle partitions sized to the core count (local mode).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def materialize(name: String): Unit =
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()

    // Warm-up: exercise scan, shuffle, window, decimal-agg, and
    // array/HOF codegen paths once so first-touch JIT/codegen cost isn't
    // billed to whichever query happens to run first.
    Seq("e6_running_sum", "d6_group_sum", "h2_array_parse").foreach { q =>
      try materialize(q) catch { case _: Throwable => () }
    }

    // min of two runs per query: a single-JVM session running 60+ queries
    // hits occasional multi-second JIT/GC stalls that land on a random
    // query; the min reflects steady-state cost.
    def timeOne(name: String): Double = {
      val t0 = System.nanoTime()
      try materialize(name) catch { case _: Throwable => () }
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.keys.toSeq.sorted.map { name =>
      name -> math.min(timeOne(name), timeOne(name))
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
