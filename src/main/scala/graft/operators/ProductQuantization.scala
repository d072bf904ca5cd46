package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Product quantization (PQ) — the memory tier of large-scale ANN
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * TPAMI 2011): split each d-dim vector into `m` subvectors, quantize
  * each against its own `k`-centroid codebook, and keep only the code
  * word (m small ints — 8 bytes here vs 256 bytes of floats, a 32×
  * compression). Search runs over CODES with asymmetric distance
  * computation (ADC): the query precomputes one m×k lookup table of
  * exact subvector distances, and each candidate costs m table lookups —
  * no float math per pair at all.
  *
  * At 100 TB this is the difference between an ANN index that fits in
  * cluster memory and one that doesn't: IVF prunes WHICH rows are
  * scanned ([[Similarity.ivfTopK]]), PQ shrinks WHAT each scanned row
  * costs. The two compose (IVF-PQ) by encoding within cells.
  *
  * Codebooks here are plan-time deterministic literals from the same
  * md5 family as [[Similarity.planeComponent]] (production would train
  * them with k-means and broadcast a codebook table — the operator
  * shape is identical; only the literal values change). Everything is
  * fixed-order double arithmetic over literal centroids, so codes and
  * ADC distances are bit-reproducible by any engine — both queries are
  * fully DuckDB-oracled.
  */
object ProductQuantization {

  /** Centroid component j of code word `ki` in subspace `mi` — plan-time
    * deterministic, in [-0.5, 0.5), distinct per (seed, mi, ki, j). */
  private[graft] def centroidComponent(seed: Int, m: Int, k: Int,
                                       mi: Int, ki: Int, j: Int): Double =
    Similarity.planeComponent(seed, mi * k + ki, j)

  /** All k squared L2 distances from `vec`'s subvector `mi` to that
    * subspace's centroids, as ONE fused codegen node
    * ([[graft.functions.PqSubDists]]) returning `array<double>[k]`.
    *
    * The composable equivalent is k literal chains of subDim
    * `element_at` terms each — m×k×subDim ≈ 2,600 Catalyst nodes whose
    * analysis/codegen dominated sim8 (3.4 s warm at sf0.1, nearly all
    * planning). The fused node keeps the tree at m nodes and the same
    * bit-exact accumulation order (per centroid: 0.0, then d² in
    * element order), so the DuckDB oracle chains still match. */
  private def subDists(vec: Column, seed: Int, m: Int, k: Int,
                       subDim: Int, mi: Int): Column =
    graft.functions.VectorExpressions.pqSubDists(
      vec,
      for { ki <- 0 until k; j <- 0 until subDim }
        yield centroidComponent(seed, m, k, mi, ki, j),
      offset = mi * subDim, subDim = subDim, k = k)

  /** Encode every vector: adds `code_0..code_{m-1}` (int, the per-
    * subspace code words) and `pq_code` (all codes packed into one
    * bigint, 8 bits per lane — the 8-byte row an ANN index stores).
    * Ties in the argmin go to the lowest code word, so encoding is
    * order- and engine-independent.
    *
    * The m distance arrays are materialized in a lower projection and
    * the argmin (`array_position` of `array_min`, first match → lowest
    * code word) runs above it (CollapseProject keeps non-cheap aliases
    * referenced twice un-inlined) — each of the m×k distances is
    * computed exactly once per row. */
  def pqEncode(df: DataFrame, m: Int = 8, k: Int = 8, seed: Int = 11,
               vecCol: String = "embedding", dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subvectors")
    require(k <= 128 && m * 8 <= 64,
      "pq_code packs 8-bit lanes into one non-negative bigint")
    val subDim = dim / m
    val reserved = (0 until m).map(mi => s"code_$mi") :+ "pq_code"
    require(!df.columns.exists(reserved.contains),
      s"${reserved.take(3).mkString("/")}… are reserved by pqEncode")
    val dName = (mi: Int) => s"__pq_d_$mi"
    val lower = df.select(col("*") +:
      (0 until m).map(mi =>
        subDists(col(vecCol), seed, m, k, subDim, mi).as(dName(mi))): _*)
    val withCodes = lower.select(col("*") +:
      (0 until m).map { mi =>
        (array_position(col(dName(mi)), array_min(col(dName(mi)))) - 1)
          .cast("int").as(s"code_$mi")
      }: _*)
    val packed = (0 until m).foldLeft(lit(0L)) { (acc, mi) =>
      acc + col(s"code_$mi").cast("bigint") * lit(1L << (8 * mi))
    }
    withCodes.withColumn("pq_code", packed)
      .drop((0 until m).map(dName): _*)
  }

  /** ADC top-k over PQ codes: the corpus side carries ONLY its code
    * words; each query precomputes its m×k distance lookup tables once
    * (in the broadcast projection), and every (query, candidate) pair
    * costs m `element_at` lookups + (m−1) adds — zero float math per
    * pair. Distances are approximate (quantization error), which is the
    * PQ trade; ranking is deterministic (ties broken by corpus id). */
  def pqTopK(corpus: DataFrame, queries: DataFrame, topK: Int = 10,
             m: Int = 8, k: Int = 8, seed: Int = 11,
             idCol: String = "vec_id", vecCol: String = "embedding",
             dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val encoded = pqEncode(corpus, m, k, seed, vecCol, dim)
      .select(col(idCol).as("corpus_id") +:
        (0 until m).map(mi => col(s"code_$mi")): _*)
    val luts = broadcast(queries.select(col(idCol).as("query_id") +:
      (0 until m).map(mi =>
        subDists(col(vecCol), seed, m, k, subDim, mi)
          .as(s"__lut_$mi")): _*))
    val dist = (0 until m).foldLeft(lit(0.0)) { (acc, mi) =>
      acc + element_at(col(s"__lut_$mi"), col(s"code_$mi") + 1)
    }
    val scored = encoded.crossJoin(luts)
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), dist.as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select("query_id", "corpus_id", "adc_dist", "rk")
  }

  /** IVF-PQ: the full composition of a cluster-scale ANN index. IVF
    * prunes WHICH rows a query scans ([[Similarity.ivfAssign]]'s cell is
    * a partition column at ingest — only `nprobe`/`ncells` of the corpus
    * is read); PQ shrinks WHAT each scanned row costs (8 code bytes, m
    * table lookups — no vectors ever leave the scan). At 100 TB the
    * probed slice of the code index is small enough to stay
    * memory-resident on the executors, which is exactly why IVF-PQ
    * (Jégou et al. 2011; FAISS `IndexIVFPQ`) is the standard layout.
    *
    * Probe order and code assignment are bit-identical to [[Similarity
    * .ivfTopK]] / [[pqEncode]] respectively, so the operator composes
    * their oracle texts. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, topK: Int = 10,
                ncells: Int = 8, nprobe: Int = 3, ivfSeed: Int = 7,
                m: Int = 8, k: Int = 8, pqSeed: Int = 11,
                idCol: String = "vec_id", vecCol: String = "embedding",
                dim: Int = 64): DataFrame = {
    val subDim = dim / m
    val encoded = pqEncode(
      Similarity.ivfAssign(corpus, ncells, ivfSeed, vecCol, dim),
      m, k, pqSeed, vecCol, dim)
      .select(col(idCol).as("corpus_id") +: col("cell") +:
        (0 until m).map(mi => col(s"code_$mi")): _*)
    val vec = col(vecCol)
    val probes = broadcast(queries.select(
      col(idCol).as("query_id") +:
        explode(Similarity.probeCells(vec, ncells, nprobe, ivfSeed, dim))
          .as("cell") +:
        (0 until m).map(mi =>
          subDists(vec, pqSeed, m, k, subDim, mi).as(s"__lut_$mi")): _*))
    val dist = (0 until m).foldLeft(lit(0.0)) { (acc, mi) =>
      acc + element_at(col(s"__lut_$mi"), col(s"code_$mi") + 1)
    }
    val scored = encoded.join(probes, "cell")
      .filter(col("query_id") =!= col("corpus_id"))
      .select(col("query_id"), col("corpus_id"), dist.as("adc_dist"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dist").asc, col("corpus_id").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select("query_id", "corpus_id", "adc_dist", "rk")
  }
}
