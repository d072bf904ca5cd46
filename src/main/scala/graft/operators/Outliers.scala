package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier profiling — the quality-filter shape that
  * survives heavy-tailed corpus statistics where mean/stddev gates do not
  * (one pathological document moves a mean; it cannot move a median).
  *
  * Scale contract (exact path): each median is a grouped SELECTION —
  * GlobalRank's two-pass row number (range-partitioned layout, ordinals
  * corrected by broadcast pass-1 offsets; parallelism = #partitions,
  * never #groups) picks the two order statistics by conditional min.
  * That is the 100 TB-safe exact median: Spark's `percentile` buffers
  * every value of a group inside one aggregation buffer (a single
  * straggler task holding a group's entire column — memory-unbounded),
  * a `partitionBy(group)` cumulative window caps parallelism at #groups
  * (the funnel shape FunnelSpec rejects), and a distinct-value
  * histogram does not save the profiled columns (price cents, byte
  * sizes — domains that scale with the corpus). `exact = false` remains
  * the mergeable GK-sketch path (`percentile_approx`, d16's
  * bounded-error shape) when an approximate answer is acceptable.
  *
  * Determinism: values must be integer-quantized by the caller — the
  * interpolated median of integers is `(v_lo + v_hi) / 2` with both
  * operands exact in double, so any engine (and any shuffle order)
  * reproduces it bit-for-bit; deviation values are then exact halves and
  * their median exact quarters, still lossless in double.
  */
object Outliers {

  /** Interpolated 0.5-quantile per group at ROW grain —
    * `(v(⌊(n-1)/2⌋) + v(⌊n/2⌋)) / 2`, the same interpolation rule as
    * Spark `percentile` and DuckDB `quantile_cont`. Median is a
    * SELECTION problem, so this rides
    * [[GlobalRank.withGroupedRowNumber]] (zero shuffles beyond its
    * range exchange; group totals off the pass-1 counts) and picks the
    * two order statistics by conditional min — no cumulative window at
    * all. The row number among equal values is layout-dependent, but
    * the VALUE at a given rank is not, so the median is deterministic.
    * A value-domain histogram would not help: for the columns this
    * profiles (price cents, byte sizes) the domain scales with the
    * corpus, and a partitionBy(group) cumulative pass over it is the
    * funnel shape the catalog's measured gate (FunnelSpec) rejects. */
  private def rowMedian(rows: DataFrame, groupCol: String,
                        valCol: String): DataFrame =
    medianFromRn(GlobalRank.withGroupedRowNumber(rows, Seq(groupCol),
      Seq(col(valCol)), out = "__rn", nOut = Some("__n")), groupCol, valCol)

  private def medianFromRn(rn: DataFrame, groupCol: String,
                           valCol: String): DataFrame =
    rn.groupBy(col(groupCol)).agg(
      ((min(when(expr("__rn = ((__n - 1) div 2) + 1"), col(valCol))) +
        min(when(expr("__rn = (__n div 2) + 1"), col(valCol)))) / 2.0)
        .as("med"))

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
    // exact path: two grouped-rank SELECTION passes (values, then
    // absolute deviations — the second depends on the first's median,
    // so they are inherently sequential), then one counting aggregate.
    // PLAN CHOICE, measured at sf0.1 (fresh-JVM warm minima): the
    // d23-style histogram path (groupBy(grp, value).count →
    // withGroupedPrefixSum → crossover interpolation) was tried first
    // and is ~27% SLOWER here (~6.1 s vs ~4.8 s) — the histogram saves
    // nothing because the profiled domains (price cents, byte sizes)
    // are near-distinct per row, so the "histogram" is row-grain plus
    // an extra rollup, and the prefix sum pays a pid-hash exchange the
    // selection form avoids. Both forms are scale-safe; selection wins
    // on cost. Each selection pass feeds a NARROW frame (group + one
    // value column) per GlobalRank's executable width contract.
    // LAYOUT REUSE (round-13): the value-median pass already pins the
    // (group, value) rows in GlobalRank's checkpointed range layout —
    // the deviation pass and the final counting pass re-read THAT
    // instead of re-scanning and re-exchanging the source, so the three
    // phases cost ONE scan + ONE spread of the input. (This differs
    // from the earlier rejected "checkpoint the input" variant, which
    // ADDED a materialization in front of the range exchange — ~25%
    // slower; here the materialization is the one GlobalRank makes
    // anyway.) The MAD pass still pins its own layout: deviations are a
    // different sort key.
    val vals = df.select(col(groupCol), x.as("__val"))
    val layout = GlobalRank.pinGroupedLayout(vals, Seq(groupCol),
      Seq(col("__val")))
    val med = medianFromRn(GlobalRank.withGroupedRowNumberOn(layout,
      Seq(groupCol), Seq(col("__val")), out = "__rn", nOut = Some("__n")),
      groupCol, "__val")
    val pinned = layout.drop("__pid")
    val dev = pinned.join(broadcast(med), Seq(groupCol))
      .select(col(groupCol), abs(col("__val") - col("med")).as("__dev"))
    val mad = rowMedian(dev, groupCol, "__dev")
      .withColumnRenamed("med", "mad")
    pinned.join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_rows"),
        sum(when(abs(col("__val") - col("med")) > lit(k) * col("mad"), 1L)
          .otherwise(0L)).as("n_outliers"))
  }
}
