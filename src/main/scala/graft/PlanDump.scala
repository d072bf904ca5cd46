package graft

/** Dump `.explain("formatted")` output for named queries to files —
  * the before/after plan evidence the optimization rounds commit under
  * `plans/<round>/`. AQE is disabled so the static plan (join strategy,
  * exchange count, PushedFilters/ReadSchema) is what prints; the bench
  * itself still runs with AQE on.
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]
  * writes <outDir>/<query>_<suffix>.txt per query.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(',').map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    val spark = graft.core.GraftSession.local(appName = "graft-plan-dump")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { name =>
      graft.operators.GlobalRank.withScope {
        val df = SparkEntry.queries(name)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(
          java.nio.file.Paths.get(outDir, s"${name}_$suffix.txt"),
          txt.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        println(s"[plandump] wrote $name ($suffix)")
      }
    }
    spark.stop()
  }
}
