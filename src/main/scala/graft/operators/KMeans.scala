package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed Lloyd's k-means over integer-quantized vectors — the
  * "train the codebook" step that [[Similarity.ivfAssign]] and
  * [[ProductQuantization]] reference (their plan-time literal centroids
  * stand in for trained ones; this operator is where trained ones come
  * from).
  *
  * Scale shape (the textbook distributed Lloyd):
  *  - points are quantized ONCE and cached; every iteration re-reads the
  *    cached narrow projection, not the source.
  *  - assignment is a crossJoin against the BROADCAST centroid set
  *    (k × dim longs — bytes, not data) with an exact integer L2 per
  *    pair; argmin ties break to the lowest cluster id.
  *  - the update step is one explode + hash groupBy per iteration whose
  *    shuffle carries ≤ k·dim rows per map partition (map-side partial
  *    sums), and the k·dim result is collected to the DRIVER — centroid
  *    metadata, the same driver-scalar pattern as [[GlobalRank]]'s
  *    partition offsets. Iterations are a fixed driver loop.
  *
  * Determinism (what makes this oracle-able, unlike float k-means):
  * vectors quantize to longs (×1e6, floor), so distances are EXACT
  * integer sums — associativity makes them partition-order-independent —
  * and centroid updates floor-divide exact integer sums (the one double
  * division is correctly rounded from exact inputs, so every engine
  * computes the identical centroid). Initial centroids are the k
  * lowest-id points. Empty clusters die (standard Lloyd caveat; ids keep
  * their round-0 numbering).
  *
  * The reference pipeline has no trainer (its analytics stop at SQL
  * aggregates); this is part of the beyond-reference ANN tier.
  */
object KMeans {

  /** Integer quantization shared with the sim1/sim4 exact baselines:
    * ×scale, floor, long — engine-reproducible. */
  def quantize(vec: Column, scale: Long = 1000000L): Column =
    transform(vec, x => floor(x.cast("double") * scale).cast("long"))

  /** Exact squared L2 between two long-array columns. Integer sums are
    * associative, so any fold order gives the same value. */
  def sqDistL(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Run `iters` Lloyd iterations with k centroids seeded from the k
    * lowest-id points; returns the final assignment
    * (id, cluster, dist — exact integer squared L2) plus the centroid
    * set THAT ASSIGNMENT was computed against (what an index consumer —
    * [[trainedIvfTopK]] — needs to route queries to the same cells). */
  def fitWithCentroids(df: DataFrame, k: Int, iters: Int,
                       idCol: String = "vec_id",
                       vecCol: String = "embedding")
  : (DataFrame, Seq[(Int, Seq[Long])]) = {
    val (full, cents) = fitFull(df, k, iters, idCol, vecCol)
    (full.select(col("id").as(idCol), col("cluster"), col("dist")), cents)
  }

  /** [[fitWithCentroids]] keeping the quantized vector (and any `carry`
    * columns of the input) on the assignment row —
    * (id, qv, carry…, cluster, dist) — so downstream consumers
    * ([[trainedIvfTopK]]'s index side, km3's purity contingency, km4's
    * silhouette) read the assignment directly instead of re-scanning the
    * corpus and hash-joining it back on the id. */
  private[graft] def fitFull(df: DataFrame, k: Int, iters: Int,
                             idCol: String, vecCol: String,
                             carry: Seq[String] = Nil)
  : (DataFrame, Seq[(Int, Seq[Long])]) = {
    require(k > 0 && iters > 0, "k and iters must be positive")

    // Quantized points materialize ONCE and every iteration re-reads the
    // materialized blocks. Round 14: GlobalRank.pinned instead of a bare
    // cache() — same blocks, but the query-boundary owner scope frees
    // them deterministically instead of leaking one point-set per km*
    // query into the block manager for the rest of a catalog run.
    val pts = graft.operators.GlobalRank.pinned(
      df.select(col(idCol).as("id") +: quantize(col(vecCol)).as("qv") +:
        carry.map(col): _*))

    // k × dim longs: driver-side centroid state, updated per round.
    var cents: Seq[(Int, Seq[Long])] = pts.orderBy("id").limit(k).collect()
      .zipWithIndex
      .map { case (r, i) => i -> r.getSeq[Long](1) }.toSeq
    var centsUsed = cents

    // Argmin as a PROJECTION over the k driver-side centroid literals:
    // least() over k (dist, cluster) structs is the same lexicographic
    // argmin (ties to the lowest cluster id) the old
    // crossJoin(broadcast(centroids)) → groupBy(id).min(struct) computed,
    // minus the k-way row fan-out, the id exchange and the two
    // SortAggregates it paid PER ITERATION — assignment now costs zero
    // shuffles at any scale (centroids are plan-time literals, exactly
    // the broadcast bytes the crossJoin shipped).
    def assignExprs(cs: Seq[(Int, Seq[Long])]) = {
      val dcs = cs.map { case (cl, cv) =>
        struct(sqDistL(col("qv"), typedLit(cv)).as("dist"),
          lit(cl).as("cluster"))
      }
      // empty corpus ⇒ empty centroid seed ⇒ pts has no rows either, so
      // only the TYPE matters (the old crossJoin form degraded to an
      // empty frame the same way; the empty-fixture sweep pins this)
      if (dcs.isEmpty) lit(null).cast("struct<dist:bigint,cluster:int>")
      else if (dcs.size == 1) dcs.head
      else least(dcs: _*)
    }

    var assigned: DataFrame = null
    for (_ <- 0 until iters) {
      centsUsed = cents
      val withM = pts.select(col("id") +: col("qv") +:
        (carry.map(col) :+ assignExprs(cents).as("m")): _*)
      assigned = withM.select(col("id") +: col("qv") +: (carry.map(col) :+
        col("m.cluster").as("cluster") :+ col("m.dist").as("dist")): _*)
      // per-cluster per-dim exact integer means, floored — k·dim rows;
      // qv rides the assignment projection, so the old re-join of the
      // assignment back onto the point set is gone too
      val sums = withM
        .select(col("m.cluster").as("cluster"),
          posexplode(col("qv")).as(Seq("dim", "v")))
        .groupBy("cluster", "dim")
        .agg(sum("v").as("s"), count(lit(1)).as("cnt"))
        .select(col("cluster"), col("dim"),
          floor(col("s").cast("double") / col("cnt").cast("double"))
            .cast("long").as("c"))
        .collect()
      cents = sums.groupBy(_.getAs[Int]("cluster")).toSeq
        .map { case (cl, rows) =>
          cl -> rows.sortBy(_.getAs[Int]("dim")).map(_.getAs[Long]("c")).toSeq
        }.sortBy(_._1)
    }
    (assigned, centsUsed)
  }

  /** [[fitWithCentroids]], assignment only. */
  def fit(df: DataFrame, k: Int, iters: Int, idCol: String = "vec_id",
          vecCol: String = "embedding"): DataFrame =
    fitWithCentroids(df, k, iters, idCol, vecCol)._1

  /** IVF ANN over TRAINED cells — the full composition: Lloyd training
    * ([[fitWithCentroids]]) partitions the corpus into k cells, each
    * query probes its `nprobe` nearest trained centroids (exact integer
    * L2, ties to the lowest cell), and quantized-cosine top-k runs over
    * the probed cells only. [[Similarity.ivfTopK]] is the same index
    * shape with plan-time literal cells; this is what production
    * deploys — data-adaptive cells follow the corpus density, so probe
    * recall holds where hash cells would fragment clusters.
    *
    * Scale: training cost is [[fitWithCentroids]]; the probe join
    * broadcasts queries×nprobe rows against the cell-keyed corpus (cell
    * is an ingest partition column at 100 TB, so probing reads
    * nprobe/k of the index, same as sim3). Everything stays
    * integer-exact, so the whole path is engine-reproducible. */
  def trainedIvfTopK(corpus: DataFrame, queries: DataFrame, k: Int = 8,
                     iters: Int = 3, nprobe: Int = 3, topK: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding")
  : DataFrame = {
    import corpus.sparkSession.implicits._
    import graft.functions.VectorExpressions.dotL
    // round 14: the assignment row already carries the quantized vector
    // (fitFull), so the index side is a pure projection of it — the old
    // corpus re-scan + re-quantize + id hash join (two exchanges) is gone
    val (full, cents) = fitFull(corpus, k, iters, idCol, vecCol)
    val corpusSide = full
      .select(col("id").as("corpus_id"), col("qv"),
        col("cluster").as("cell"))
      .withColumn("nrm", dotL(col("qv"), col("qv")))
      // zero-norm (or quantized-to-zero) vectors: cosine undefined —
      // excluded from the scored index, mirrored in the km2 oracle
      .filter(col("nrm") > 0)
    val centDf = broadcast(cents.toDF("cell", "cv"))
    val probeW = Window.partitionBy(col("query_id"))
      .orderBy(col("pdist").asc, col("cell").asc)
    val probes = broadcast(queries
      .select(col(idCol).as("query_id"), quantize(col(vecCol)).as("qqv"))
      .crossJoin(centDf)
      .select(col("query_id"), col("qqv"), col("cell"),
        sqDistL(col("qqv"), col("cv")).as("pdist"))
      .withColumn("rn", row_number().over(probeW))
      .filter(col("rn") <= nprobe)
      .withColumn("qnrm", dotL(col("qqv"), col("qqv")))
      .filter(col("qnrm") > 0)
      .select("query_id", "qqv", "qnrm", "cell"))
    val scored = corpusSide.join(probes, "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"),
        (dotL(col("qqv"), col("qv")).cast("double") /
          (sqrt(col("qnrm").cast("double")) * sqrt(col("nrm").cast("double"))))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select("query_id", "corpus_id", "cos_sim", "rk")
  }
}
