package graft

import org.apache.spark.sql.SparkSession

/** Dev smoke runner mirroring the driver's t1 check: builds a session,
  * runs `SparkEntry.entry`, prints row count + a few rows. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "graft-smoke")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry rows=$n")
    df.show(5, truncate = false)
    require(n > 0, "entry() returned no rows")
    spark.stop()
  }
}
