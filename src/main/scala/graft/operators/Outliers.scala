package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier profiling — the quality-filter shape that
  * survives heavy-tailed corpus statistics where mean/stddev gates do not
  * (one pathological document moves a mean; it cannot move a median).
  *
  * Scale contract (exact path): the raw data is touched ONCE — a map-side
  * combined (group, value) histogram — and every median/deviation/count
  * phase runs over the histogram at DISTINCT-VALUE cardinality. That is
  * the 100 TB-safe exact median: Spark's `percentile` buffers every value
  * of a group inside one aggregation buffer (a single straggler task
  * holding a group's entire column — memory-unbounded), while the
  * histogram's interpolated median is two cumulative-count lookups. The
  * histogram is locally checkpointed so the three phases don't re-scan
  * the source. `exact = false` remains the mergeable GK-sketch path
  * (`percentile_approx`, d16's bounded-error shape) for when even the
  * distinct-value histogram is too large to window.
  *
  * Determinism: values must be integer-quantized by the caller — the
  * interpolated median of integers is `(v_lo + v_hi) / 2` with both
  * operands exact in double, so any engine (and any shuffle order)
  * reproduces it bit-for-bit; deviation values are then exact halves and
  * their median exact quarters, still lossless in double.
  */
object Outliers {

  /** Interpolated 0.5-quantile per group from a (group, value, count)
    * histogram — `(v(⌊(n-1)/2⌋) + v(⌊n/2⌋)) / 2`, the same interpolation
    * rule as Spark `percentile` and DuckDB `quantile_cont`. The
    * cumulative pass rides [[GlobalRank.withGroupedPrefixSum]]: when the
    * value DOMAIN itself scales with the corpus (price cents, byte
    * sizes), the histogram is corpus-cardinality and a
    * partitionBy(group) window would funnel it through #groups tasks —
    * the shape the catalog's measured funnel gate (PlanSpec) rejects. */
  private def histMedian(hist: DataFrame, groupCol: String,
                         valCol: String): DataFrame = {
    val cum = GlobalRank.withGroupedPrefixSum(hist, Seq(groupCol),
      Seq(col(valCol)), col("c"), out = "cum", totOut = Some("n"))
    cum.groupBy(col(groupCol)).agg(
      ((min(when(expr("cum >= ((n - 1) div 2) + 1"), col(valCol))) +
        min(when(expr("cum >= (n div 2) + 1"), col(valCol)))) / 2.0)
        .as("med"))
  }

  /** Per-group median, MAD, and |x − med| > k·MAD outlier count over an
    * integer-quantized value column (quantize before calling — see the
    * determinism note above). */
  def robustStats(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0, exact: Boolean = true): DataFrame = {
    val x = col(valueCol)
    if (!exact) {
      // sketch path: mergeable partial aggregation, no buffering
      def pct(c: Column) = percentile_approx(c, lit(0.5), lit(10000))
      val med = df.groupBy(col(groupCol)).agg(pct(x).as("med"))
      val mad = df.join(broadcast(med), Seq(groupCol))
        .groupBy(col(groupCol))
        .agg(pct(abs(x - col("med"))).as("mad"))
      return df.join(broadcast(med), Seq(groupCol))
        .join(broadcast(mad), Seq(groupCol))
        .groupBy(col(groupCol), col("med"), col("mad"))
        .agg(count(lit(1)).as("n_rows"),
          count(when(abs(x - col("med")) > lit(k) * col("mad"), lit(1)))
            .as("n_outliers"))
    }
    // exact path: one pass over raw data, then histogram-sized work only
    val hist = df.groupBy(col(groupCol), x).agg(count(lit(1)).as("c"))
      .localCheckpoint(false)
    val med = histMedian(hist, groupCol, valueCol)
    val devHist = hist.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(x - col("med")).as("dev"), col("c"))
      .groupBy(col(groupCol), col("dev")).agg(sum(col("c")).as("c"))
    val mad = histMedian(devHist, groupCol, "dev")
      .withColumnRenamed("med", "mad")
    hist.join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(sum(col("c")).as("n_rows"),
        sum(when(abs(x - col("med")) > lit(k) * col("mad"), col("c"))
          .otherwise(0L)).as("n_outliers"))
  }
}
