package graft

import org.apache.spark.sql.functions._

import graft.operators.{ChangeCapture, Scoring}

class ScoringSpec extends SparkSpec {

  test("hashedLinearScore: score = bias + sum of per-token formula weights") {
    import spark.implicits._
    val docs = Seq((1L, "alpha beta alpha"), (2L, ""), (3L, "alpha"))
      .toDF("doc_id", "text")
    val out = Scoring.hashedLinearScore(docs, dim = 64, bias = -3L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_terms"), r.getAs[Long]("score"),
          r.getAs[Boolean]("keep")))).toMap

    // independently recompute the expected weights via the same kernel
    val w = Seq("alpha", "beta", "").toDF("t")
      .select(col("t"),
        Scoring.formulaWeight(Scoring.tokenBucket(col("t"), 64)).as("w"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out(1L) == ((3L, -3L + 2 * w("alpha") + w("beta"),
      -3L + 2 * w("alpha") + w("beta") >= 0)))
    // empty text normalizes to "" → one empty token, scored consistently
    assert(out(2L)._1 == 1L && out(2L)._2 == -3L + w(""))
    assert(out(3L) == ((1L, -3L + w("alpha"), -3L + w("alpha") >= 0)))
  }

  test("thresholdSweep: cumulative tp/fp and precision/recall per threshold") {
    import spark.implicits._
    // scores: 5(+), 5(-), 3(+), 1(-) → thresholds 5, 3, 1
    val scored = Seq((5L, true), (5L, false), (3L, true), (1L, false))
      .toDF("score", "label")
    val rows = Scoring.thresholdSweep(scored).collect()
      .map(r => r.getAs[Long]("threshold") ->
        ((r.getAs[Long]("pred_pos"), r.getAs[Long]("tp"),
          r.getAs[Long]("fp"), r.getAs[Long]("fn"),
          r.getAs[Double]("precision"), r.getAs[Double]("recall")))).toMap
    assert(rows(5L) == ((2L, 1L, 1L, 1L, 0.5, 0.5)))
    assert(rows(3L) == ((3L, 2L, 1L, 0L, 2.0 / 3.0, 1.0)))
    assert(rows(1L) == ((4L, 2L, 2L, 0L, 0.5, 1.0)))
  }

  test("snapshotDiff classifies insert/delete/update/unchanged; null-safe") {
    import spark.implicits._
    val oldSnap = Seq(
      (1L, Some("a"), Some(10.0)),  // unchanged
      (2L, Some("b"), Some(20.0)),  // value update
      (3L, None: Option[String], Some(30.0)), // null → value update
      (4L, Some("d"), Some(40.0)))  // deleted in new
      .toDF("k", "st", "price")
    val newSnap = Seq(
      (1L, Some("a"), Some(10.0)),
      (2L, Some("bX"), Some(20.0)),
      (3L, Some("c"), Some(30.0)),
      (5L, Some("e"), None: Option[Double])) // inserted
      .toDF("k", "st", "price")
    val out = ChangeCapture
      .snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("st", "price"))
      .collect().map(r => r.getAs[Long]("k") ->
        r.getAs[String]("change_type")).toMap
    assert(out == Map(1L -> "unchanged", 2L -> "update", 3L -> "update",
      4L -> "delete", 5L -> "insert"))
  }

  test("snapshotDiff fingerprint is concatenation-unambiguous") {
    import spark.implicits._
    // ("ab","c") vs ("a","bc") must differ; (null,"x") vs ("","x") must
    // differ (null is not empty-string)
    val oldSnap = Seq((1L, "ab", "c"), (2L, null.asInstanceOf[String], "x"))
      .toDF("k", "u", "v")
    val newSnap = Seq((1L, "a", "bc"), (2L, "", "x")).toDF("k", "u", "v")
    val out = ChangeCapture
      .snapshotDiff(oldSnap, newSnap, Seq("k"), Seq("u", "v"))
      .collect().map(r => r.getAs[Long]("k") ->
        r.getAs[String]("change_type")).toMap
    assert(out == Map(1L -> "update", 2L -> "update"))
  }
}
