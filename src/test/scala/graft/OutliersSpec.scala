package graft

import graft.operators.Outliers

class OutliersSpec extends SparkSpec {

  test("robust stats: median, MAD, and 3-MAD outlier count per group") {
    import spark.implicits._
    val df = ((1 to 9).map(v => ("a", v.toLong)) :+ ("a", 1000L))
      .++(Seq(("b", 10L), ("b", 20L), ("b", 30L)))
      .toDF("grp", "v")
    val out = Outliers.robustStats(df, "grp", "v", k = 3.0)
      .as[(String, Double, Double, Long, Long)].collect()
      .map(r => r._1 -> r).toMap

    // group a: sorted 1..9,1000 -> med 5.5; |x-med| median -> 2.5;
    // only 1000 exceeds 5.5 +/- 7.5
    assert(out("a") == ("a", 5.5, 2.5, 10L, 1L))
    // group b: med 20, MAD 10, nothing beyond 20 +/- 30
    assert(out("b") == ("b", 20.0, 10.0, 3L, 0L))
  }

  test("robust stats: sketch path agrees on this scale") {
    import spark.implicits._
    val df = (1 to 101).map(v => ("g", v.toLong)).toDF("grp", "v")
    val approx = Outliers.robustStats(df, "grp", "v", exact = false)
      .as[(String, Double, Double, Long, Long)].head()
    assert(approx == ("g", 51.0, 25.0, 101L, 0L))
  }
}
