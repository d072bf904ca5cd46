package graft

import graft.operators.AsOfJoin

class AsOfJoinSpec extends SparkSpec {

  test("backward as-of: greatest right time <= left time, inner semantics") {
    import spark.implicits._
    val left = Seq(
      (1, 10L, "a"), // matches right t=8
      (1, 20L, "b"), // matches right t=15
      (1, 15L, "c"), // equal time matches (<= semantics)
      (2, 5L, "d"),  // before any right row for key 2 → dropped
      (3, 9L, "e"))  // key absent on right → dropped
      .toDF("k", "t", "v")
    val right = Seq(
      (1, 8L, 100), (1, 15L, 200), (2, 9L, 300))
      .toDF("k", "rt", "price")

    val out = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"))
      .collect().map(r => (r.getAs[Int]("k"), r.getAs[Long]("t"),
        r.getAs[String]("v"), r.getAs[Int]("price"))).toSet
    assert(out == Set((1, 10L, "a", 100), (1, 20L, "b", 200),
      (1, 15L, "c", 200)))
  }

  test("forward as-of: smallest right time >= left time") {
    import spark.implicits._
    val left = Seq(
      (1, 10L, "a"), // next right is t=15
      (1, 15L, "b"), // equal time matches (>= semantics)
      (1, 30L, "c"), // after all right rows for key 1 → dropped
      (2, 5L, "d"))  // key absent on right → dropped
      .toDF("k", "t", "v")
    val right = Seq((1, 8L, 100), (1, 15L, 200), (1, 25L, 300))
      .toDF("k", "rt", "price")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"),
        direction = "forward")
      .collect().map(r => (r.getAs[Int]("k"), r.getAs[Long]("t"),
        r.getAs[String]("v"), r.getAs[Int]("price"))).toSet
    assert(out == Set((1, 10L, "a", 200), (1, 15L, "b", 200)))
  }

  test("tolerance drops too-far nearest matches without falling through") {
    import spark.implicits._
    val left = Seq(
      (1, 10L, "a"),  // nearest right t=8, gap 2 ≤ 5 → kept
      (1, 30L, "b"),  // nearest right t=15, gap 15 > 5 → dropped
      (1, 16L, "c"))  // nearest right t=15, gap 1 ≤ 5 → kept
      .toDF("k", "t", "v")
    val right = Seq((1, 8L, 100), (1, 15L, 200)).toDF("k", "rt", "price")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"),
        tolerance = Some(5L))
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[Int]("price"))).toSet
    // t=30 must NOT fall through to the (even farther) t=8 row.
    assert(out == Set((10L, 100), (16L, 200)))

    val fwd = AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"),
        direction = "forward", tolerance = Some(5L))
      .collect().map(r => (r.getAs[Long]("t"), r.getAs[Int]("price"))).toSet
    // forward: t=10 → rt=15 gap 5 kept; t=16 → none ahead... rt=15 < 16,
    // so no forward match; t=30 → none.
    assert(fwd == Set((10L, 200)))
  }

  test("payload is row-atomic: null fields are not backfilled from older rows") {
    import spark.implicits._
    val left = Seq((1, 10L), (1, 20L)).toDF("k", "t")
    // t=15 row has price=null: the t=20 probe must see (null, "y") from
    // that one row, not mix price=100 from t=8 with qty="y" from t=15 —
    // and the probe must NOT be dropped just because a field is null.
    val right = Seq(
      (1, 8L, Some(100), "x"), (1, 15L, None, "y"))
      .toDF("k", "rt", "price", "qty")
    val out = AsOfJoin.asofJoin(left, right, "k", "t", "rt",
        Seq("price", "qty"))
      .collect().map(r => (r.getAs[Long]("t"),
        Option(r.getAs[Integer]("price")), r.getAs[String]("qty"))).toSet
    assert(out == Set((10L, Some(100: Integer), "x"), (20L, None, "y")))
  }

  test("payload name clashing with a left column is rejected") {
    import spark.implicits._
    val left = Seq((1, 10L, 5)).toDF("k", "t", "price")
    val right = Seq((1, 8L, 100)).toDF("k", "rt", "price")
    intercept[IllegalArgumentException] {
      AsOfJoin.asofJoin(left, right, "k", "t", "rt", Seq("price"))
    }
  }

  test("nearest as-of: closest either side, ties backward, outer fallback") {
    import spark.implicits._
    val left = Seq(
      (10L, 1, 10L), // right 8 (gap 2) vs 15 (gap 5) → backward 8
      (11L, 1, 13L), // right 8 (gap 5) vs 15 (gap 2) → forward 15
      (12L, 1, 12L), // gap 4 vs 3 → forward 15
      (13L, 1, 11L), // gap 3 both sides → TIE → earlier (backward) 8
      (14L, 1, 15L), // exact hit, gap 0 both directions pick t=15
      (15L, 2, 5L),  // key 2 has only a later right row → forward fallback
      (16L, 3, 9L))  // key absent on right → survives with null payload
      .toDF("id", "k", "t")
    val right = Seq((1, 8L, 100), (1, 15L, 200), (2, 9L, 300))
      .toDF("k", "rt", "price")
    val out = AsOfJoin
      .asofNearest(left, right, "k", "t", "rt", Seq("price"), rowId = "id")
      .collect().map(r => (r.getAs[Long]("id"),
        Option(r.getAs[Any]("price")), Option(r.getAs[Any]("rt")))).toSet
    assert(out == Set(
      (10L, Some(100), Some(8L)),
      (11L, Some(200), Some(15L)),
      (12L, Some(200), Some(15L)),
      (13L, Some(100), Some(8L)),
      (14L, Some(200), Some(15L)),
      (15L, Some(300), Some(9L)),
      (16L, None, None)))
  }

  test("dedupeRight keeps one row per (key, time) by tie-break") {
    import spark.implicits._
    val right = Seq((1, 8L, 100, 1), (1, 8L, 200, 2), (1, 9L, 300, 3))
      .toDF("k", "rt", "price", "id")
    val d = AsOfJoin.dedupeRight(right, "k", "rt", "id").collect()
      .map(r => (r.getAs[Long]("rt"), r.getAs[Int]("price"))).toSet
    assert(d == Set((8L, 200), (9L, 300)))
  }
}
