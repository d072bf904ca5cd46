package graft

import org.apache.spark.sql.SparkSession

/** Plan-shape audit over the whole query catalog: prints, per query, the
  * number of shuffle exchanges, broadcast exchanges, whole-stage-codegen
  * spans, and whether the scan carries pushed filters — the properties
  * that decide whether a plan survives a 100× scale-up (builder prompt:
  * ".explain the plan and iterate until it's the plan you'd want").
  * Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(appName = "graft-plan-audit")
    // static audit: with AQE on, un-executed plans are AdaptiveSparkPlan
    // shells whose codegen wrapping only appears as stages run
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(f"${"query"}%-22s shuffles bcasts codegen pushed")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition"
          .r.findAllIn(plan).size
        val bcasts = "BroadcastExchange".r.findAllIn(plan).size
        // whole-stage-codegen spans print as "*(n)" node prefixes
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        val pushed = plan.contains("PushedFilters: [") &&
          !plan.contains("PushedFilters: []")
        println(f"$name%-22s $shuffles%8d $bcasts%6d $codegen%7d $pushed%6s")
      } catch {
        case e: Throwable =>
          println(f"$name%-22s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}

/** Print one query's full executed plan: `runMain graft.PlanShow <name> [sfDir]`. */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.GraftSession.local(appName = "graft-plan-show")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
