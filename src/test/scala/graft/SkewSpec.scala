package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

class SkewSpec extends SparkSpec {

  test("salted aggregation equals direct aggregation") {
    import spark.implicits._
    // 90% of rows share one hot key
    val rows = (1 to 1000).map(i =>
      (if (i <= 900) "hot" else s"k${i % 7}", i.toDouble))
    val df = rows.toDF("k", "v")
    val salted = Skew.saltedSumCount(df, Seq("k"), "v", saltFactor = 8)
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Double]("sum_v"))).toMap
    val direct = df.groupBy("k")
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("n"), r.getAs[Double]("s"))).toMap
    assert(salted == direct)
  }

  test("salted join equals plain join") {
    import spark.implicits._
    val large = ((1 to 500).map(i => ("hot", i)) ++
      (1 to 50).map(i => (s"k$i", i))).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "attr")
    val salted = Skew.saltedJoin(large, small, "k", Seq("hot"))
      .select("k", "v", "attr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val plain = large.join(small, Seq("k"))
      .select("k", "v", "attr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(salted == plain && salted.nonEmpty)
  }

  test("auto-salted join detects the hot key and matches the plain join") {
    import spark.implicits._
    val large = ((1 to 500).map(i => (Option("hot"), i)) ++
      (1 to 50).map(i => (Option(s"k$i"), i)) :+
      (Option.empty[String], 999)).toDF("k", "v")
    val small = (Seq("hot") ++ (1 to 50).map(i => s"k$i"))
      .zipWithIndex.toDF("k", "attr")

    val detected = Skew.hotKeys(large, "k", avgMultiple = 4.0)
    assert(detected == Seq("hot")) // null key never detected

    val auto = Skew.saltedJoinAuto(large, small, "k")
      .select("k", "v", "attr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    val plain = large.join(small, Seq("k"))
      .select("k", "v", "attr").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2))).toSet
    assert(auto == plain && auto.size == 550)
  }

  test("auto-salted join with no detected skew degrades to the plain join") {
    import spark.implicits._
    val large = (1 to 100).map(i => (s"k${i % 10}", i)).toDF("k", "v")
    val small = (0 until 10).map(i => (s"k$i", i)).toDF("k", "attr")
    assert(Skew.hotKeys(large, "k", avgMultiple = 4.0).isEmpty)
    assert(Skew.saltedJoinAuto(large, small, "k").count() == 100)
  }
}
