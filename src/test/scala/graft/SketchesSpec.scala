package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

class SketchesSpec extends SparkSpec {

  test("heavy hitters: exact top-k counts, sketch estimate in bounds") {
    import spark.implicits._
    // Zipf-ish: item i appears ceil(600/i) times, plus a long tail
    val rows = (1 to 20).flatMap(i =>
      Seq.fill(math.ceil(600.0 / i).toInt)(f"w$i%02d")) ++
      (1 to 500).map(i => s"tail$i")
    val df = rows.toDF("token").repartition(8) // sketch merges 8 partials
    val out = Sketches.heavyHitters(df, "token", k = 5)
      .as[(String, Long, Boolean)].collect()

    assert(out.map(_._1).toSeq == Seq("w01", "w02", "w03", "w04", "w05"))
    assert(out.map(_._2).toSeq == Seq(600L, 300L, 200L, 150L, 120L))
    assert(out.forall(_._3), "every estimate within the CMS contract")
  }

  test("hll union audit: grouped sketches union to the exact distinct") {
    import spark.implicits._
    // values overlap across groups: union must dedupe, not add
    val df = (1 to 300).map(i => (s"g${i % 3}", (i % 120).toLong))
      .toDF("grp", "v").repartition(8)
    val out = Sketches.hllUnionAudit(df, "grp", "v")
      .as[(Long, Boolean)].head()
    assert(out._1 == 120L && out._2,
      "union estimate within bounds of the 120 distinct values")
  }

  test("heavy hitters: k-boundary ties break on item order") {
    import spark.implicits._
    val df = Seq("b", "b", "a", "a", "c", "c", "z").toDF("token")
    val out = Sketches.heavyHitters(df, "token", k = 2)
      .select("token").as[String].collect().toSeq
    assert(out == Seq("a", "b")) // a and b and c tie at 2; item asc wins
  }
}
