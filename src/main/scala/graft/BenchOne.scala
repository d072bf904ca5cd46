package graft

/** Dev helper: time one named query (or a comma list) on a given sf dir.
  * Usage: runMain graft.BenchOne <sfDir> <name>[,<name>...] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, names) = args
    val spark = graft.core.GraftSession.local(appName = "graft-bench-one")
    names.split(",").foreach { name =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      println(f"[benchone] $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
