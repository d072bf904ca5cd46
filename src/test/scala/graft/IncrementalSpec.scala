package graft

import org.apache.spark.sql.functions._

import graft.operators.Incremental

class IncrementalSpec extends SparkSpec {

  private def view(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap

  test("merge of split partials equals the full recompute") {
    import spark.implicits._
    val rows = Seq(
      (1L, 10.00, "a"), (1L, 2.50, "b"), (1L, 7.25, "a"),
      (2L, 100.00, "a"), (3L, 0.10, "b"), (3L, 0.20, "b"))
      .toDF("k", "value", "part")
    val full = Incremental.readView(
      Incremental.partialState(rows, "k", "value"))
    val merged = Incremental.readView(Incremental.merge(Seq(
      Incremental.partialState(rows.filter(col("part") === "a"), "k", "value"),
      Incremental.partialState(rows.filter(col("part") === "b"), "k", "value"))))
    assert(view(full) == view(merged))
    // keys present on only one side pass through: 2 is a-only, absent in b.
    assert(view(merged)(2L) == ((1L, 100.00, 100.00, 100.00, 100.00)))
  }

  test("merge is associative across batch groupings") {
    import spark.implicits._
    val mk = (lo: Long, hi: Long) =>
      Incremental.partialState(
        (lo until hi).map(i => (i % 3, i * 1.5)).toDF("k", "value"),
        "k", "value")
    val a = mk(0L, 10L); val b = mk(10L, 25L); val c = mk(25L, 40L)
    val left = Incremental.readView(
      Incremental.merge(Seq(Incremental.merge(Seq(a, b)), c)))
    val right = Incremental.readView(
      Incremental.merge(Seq(a, Incremental.merge(Seq(b, c)))))
    assert(view(left) == view(right))
  }
}
