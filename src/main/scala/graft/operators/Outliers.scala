package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (median/MAD) outlier profiling — the quality-filter shape that
  * survives heavy-tailed corpus statistics where mean/stddev gates do not
  * (one pathological document moves a mean; it cannot move a median).
  *
  * Scale contract: three jobs — group medians, absolute-deviation medians
  * (against the broadcast median table), and the outlier count — each a
  * single shuffled aggregation; the per-group stats tables are broadcast
  * back, never the data. `exact = true` uses Spark's exact `percentile`
  * (buffers each group's values in the agg — fine when groups are few and
  * this feeds an audit/oracle); at corpus scale pass `exact = false` for
  * the mergeable GK sketch (`percentile_approx`, d16's bounded-error path).
  */
object Outliers {

  private def pct(x: Column, exact: Boolean): Column =
    if (exact) percentile(x, lit(0.5))
    else percentile_approx(x, lit(0.5), lit(10000))

  /** Per-group median, MAD, and |x − med| > k·MAD outlier count over an
    * integer-quantized value column (quantize before calling: integer
    * inputs make the interpolated median an exact double, so the result
    * is bit-reproducible across engines and shuffle orders). */
  def robustStats(df: DataFrame, groupCol: String, valueCol: String,
                  k: Double = 3.0, exact: Boolean = true): DataFrame = {
    val x = col(valueCol)
    val med = df.groupBy(col(groupCol)).agg(pct(x, exact).as("med"))
    val mad = df.join(broadcast(med), Seq(groupCol))
      .groupBy(col(groupCol))
      .agg(pct(abs(x - col("med")), exact).as("mad"))
    df.join(broadcast(med), Seq(groupCol))
      .join(broadcast(mad), Seq(groupCol))
      .groupBy(col(groupCol), col("med"), col("mad"))
      .agg(count(lit(1)).as("n_rows"),
        count(when(abs(x - col("med")) > lit(k) * col("mad"), lit(1)))
          .as("n_outliers"))
  }
}
