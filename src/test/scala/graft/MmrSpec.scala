package graft

import graft.operators.Mmr

class MmrSpec extends SparkSpec {

  test("mmr: near-duplicate of the first pick is deferred for diversity") {
    import spark.implicits._
    // A and B are near-identical directions; C is orthogonal. Pure
    // relevance order is A, B, C — MMR must pick A, then C (B's
    // similarity to A wipes out its relevance edge), then B.
    val cands = Seq(
      (1L, 10L, 0.90, Seq(1000000L, 0L), 1000000000000L),         // A
      (1L, 20L, 0.89, Seq(999999L, 1L), 999998000002L),           // B
      (1L, 30L, 0.50, Seq(0L, 1000000L), 1000000000000L))         // C
      .toDF("query_id", "corpus_id", "cos_sim", "qv", "nrm")
    val out = Mmr.mmrSelect(cands, k = 3)
      .orderBy("step").collect()
      .map(r => (r.getAs[Int]("step"), r.getAs[Long]("corpus_id")))
    assert(out.toSeq == Seq((1, 10L), (2, 30L), (3, 20L)))
  }

  test("mmr: k caps picks and ties break to the lowest corpus_id") {
    import spark.implicits._
    val cands = Seq(
      (1L, 7L, 0.5, Seq(1000000L, 0L), 1000000000000L),
      (1L, 3L, 0.5, Seq(0L, 1000000L), 1000000000000L))
      .toDF("query_id", "corpus_id", "cos_sim", "qv", "nrm")
    val out = Mmr.mmrSelect(cands, k = 1).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("corpus_id") == 3L)
  }
}
