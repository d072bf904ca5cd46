package graft
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
object TopKBench {
  def main(args: Array[String]): Unit = {
    val spark = graft.core.GraftSession.local(appName = "topk-bench")
    val dir = "/root/testdata/sf0.1"
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_extendedprice")
    def time(tag: String)(f: => Unit): Unit = {
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9 }
      println(f"[topkbench] $tag min=${runs.min}%.3f runs=${runs.map(r => f"$r%.2f").mkString(",")}")
    }
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
    time("window_rownumber") {
      li.withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
        .drop("rn").write.mode("overwrite").format("noop").save()
    }
    time("custom_topk") {
      graft.plans.TopKPerKey.topKPerKey(li, Seq(col("l_suppkey")),
        Seq(col("l_extendedprice").desc, col("l_orderkey").asc,
          col("l_linenumber").asc), 5)
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
