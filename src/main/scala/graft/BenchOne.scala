package graft

/** Dev helper: time one named query (or a comma list) on a given sf dir,
  * optionally over N runs in this JVM (run 1 warms JIT/codegen; the MIN
  * of the rest is the isolated steady-state number SCALE.md's
  * contention-band triage uses — `tools/bench_isolated.sh` harvests the
  * `min=` field into BENCH_ISOLATED.json).
  * Usage: runMain graft.BenchOne <sfDir> <name>[,<name>...] [runs] */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1)
    val runs = if (args.length > 2) args(2).toInt else 1
    val spark = graft.core.GraftSession.local(appName = "graft-bench-one")
    names.split(",").foreach { name =>
      val times = (1 to runs).map { _ =>
        // this run's layouts live in an owner scope; close is query-
        // BOUNDARY lifecycle cost, not query cost — keep it out of the
        // timed region so minima stay comparable to ScalingAudit's
        val scope = graft.operators.GlobalRank.openScope()
        try {
          val t0 = System.nanoTime()
          SparkEntry.queries(name)(spark, sfDir)
            .write.mode("overwrite").format("noop").save()
          (System.nanoTime() - t0) / 1e9
        } finally scope.close()
      }
      // min over the WARM runs (drop run 1 when there are enough runs
      // to spare it — it pays first-touch JIT/codegen for this query)
      val warm = if (times.length > 1) times.tail else times
      println(f"[benchone] $name ${times.map(t => f"$t%.2f").mkString(" ")}" +
        f" min=${warm.min}%.3f")
    }
    spark.stop()
  }
}
