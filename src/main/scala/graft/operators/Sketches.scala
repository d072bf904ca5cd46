package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches for corpus-scale profiling.
  *
  * The reference exposes no sketching; this extends the engine with the
  * standard heavy-hitters shape a 100 TB token pipeline needs: per-partition
  * Count-Min sketches merged by counter addition (commutative, so partition
  * and shuffle order cannot matter), read out against the exact answer so
  * the sketch's error contract is CHECKED, not assumed — the same
  * estimate-vs-exact bounding d10 (HLL) and d16 (GK quantiles) use.
  */
object Sketches {

  /** Exact top-k frequent items PLUS a Count-Min estimate audit.
    *
    * One pass builds the mergeable CMS (Spark merges the per-partition
    * sketches on the driver — counter matrices add, so the result is
    * independent of row order); one shuffled count-agg produces the exact
    * top-k. Each winner is read out of the sketch and bounded:
    * `exact <= est <= exact + ceil(eps * N)` — the left side is CMS's
    * one-sided guarantee (hash collisions only ever inflate), the right
    * side its epsilon contract over the stream size N.
    *
    * The k-row readout is the RESULT (not a driver-side compute loop);
    * at any scale only k rows and one (eps-width x depth) counter matrix
    * ever reach the driver. Ties at the k boundary break on item order so
    * both engines cut the same set.
    */
  def heavyHitters(items: DataFrame, itemCol: String, k: Int,
                   eps: Double = 1e-4, confidence: Double = 0.99,
                   seed: Int = 42): DataFrame = {
    require(k > 0 && eps > 0 && eps < 1, "need k > 0 and eps in (0,1)")
    val spark = items.sparkSession
    import spark.implicits._
    val cached = items.persist()
    try {
      val cms = cached.stat.countMinSketch(col(itemCol), eps, confidence,
        seed)
      val slack = math.ceil(eps * cms.totalCount()).toLong
      val top = cached.groupBy(col(itemCol))
        .agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col(itemCol).asc)
        .limit(k).as[(String, Long)].collect()
      top.toSeq.map { case (item, exact) =>
        val est = cms.estimateCount(item)
        (item, exact, est >= exact && est <= exact + slack)
      }.toDF(itemCol, "n_exact", "est_in_bounds")
    } finally { cached.unpersist(); () }
  }

  /** HLL sketch ALGEBRA audit: per-group Datasketches HLL sketches
    * (`hll_sketch_agg` — max-register updates, so order- and
    * partitioning-free) unioned into the global distinct estimate
    * (`hll_union_agg`), bounded against the exact global countDistinct.
    *
    * The point is the union step: at warehouse scale you materialize the
    * per-partition/per-day sketch TABLE once and answer any group-combo
    * distinct question by unioning sketches — no re-scan, no re-shuffle
    * of raw data. The audit proves the algebra's error contract on this
    * engine rather than assuming it. */
  def hllUnionAudit(df: DataFrame, groupCol: String, valueCol: String,
                    relErr: Double = 0.05): DataFrame = {
    val perGroup = df.groupBy(col(groupCol))
      .agg(hll_sketch_agg(col(valueCol)).as("__sk"))
    val unioned = perGroup
      .agg(hll_sketch_estimate(hll_union_agg(col("__sk"))).as("__est"))
    val exact = df.agg(countDistinct(col(valueCol)).as("n_exact"))
    exact.crossJoin(unioned).select(col("n_exact"),
      (abs(col("__est") - col("n_exact")) <=
        col("n_exact").cast("double") * relErr).as("union_in_bounds"))
  }
}
