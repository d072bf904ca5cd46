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
    // extension-injected expressions resolve in SQL without registration
    val selfDot = spark.sql(
      "SELECT dot_f(array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT)), " +
        "array(CAST(0.6 AS FLOAT), CAST(0.8 AS FLOAT))) AS d").head.getDouble(0)
    println(s"[smoke] extension dot_f unit-vector self-dot=$selfDot")
    require(math.abs(selfDot - 1.0) < 1e-6, "extension function broken")
    spark.stop()
  }
}
