package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalable GLOBAL ranking: row_number / rank / percent_rank over a whole
  * table without the single-partition window.
  *
  * `Window.orderBy(c)` with no partition key funnels every row through ONE
  * task — the one window shape that cannot scale (fine at 60k rows, dead
  * at 100 TB). The standard fix is two passes over range-partitioned
  * data:
  *
  *  1. range-repartition by the order key (the same exchange any global
  *     sort pays) and count rows per partition — a tiny aggregate whose
  *     result (one long per partition) is DRIVER METADATA, like the range
  *     partitioner's own sample;
  *  2. per-partition row_number (each partition is its own window group —
  *     parallel) plus the partition's global offset.
  *
  * Ties that straddle a partition boundary are healed afterwards: rank =
  * min(row_number) over the VALUE (a hash-partitioned, scalable window),
  * and percent_rank = (rank − 1) / (N − 1) with scalar N. Results are
  * bit-identical to the built-in window functions (oracle-checked), only
  * the plan shape changes.
  */
object GlobalRank {

  /** Global row_number in ascending `(order, tieBreak)` order (columns
    * are plain keys, ranked ascending; the combined order should be total
    * for a deterministic result), as column `out`. */
  def withGlobalRowNumber(df: DataFrame, order: Seq[Column],
                          out: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    require(!df.columns.contains("__pid"),
      "__pid is reserved by GlobalRank")
    val parts = spark.sparkContext.defaultParallelism
    // Materialize the ranged layout ONCE with the partition id baked into
    // the rows: both passes must see the SAME partitioning, and without
    // the checkpoint each job re-plans the exchange (AQE may coalesce the
    // two jobs differently, skewing the offsets).
    val ranged = df
      .repartitionByRange(parts, order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    // pass 1: per-partition counts -> prefix-sum offsets (driver metadata)
    val counts = ranged.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets: Map[Int, Long] = {
      var acc = 0L
      counts.map { case (pid, n) => val off = acc; acc += n; pid -> off }
        .toMap
    }
    // pass 2: within-partition ordinal + offset. Partitioning the window
    // by __pid keeps every group parallel; __pid is computed BEFORE the
    // window exchange (nondeterministic exprs pin their evaluation point).
    val w = Window.partitionBy(col("__pid")).orderBy(order: _*)
    ranged
      .withColumn(out,
        row_number().over(w).cast("bigint") +
          element_at(typedLit(offsets), col("__pid")))
      .drop("__pid")
  }

  /** Global rank over `order` (ties share the smallest row number;
    * `tieBreak` must extend `order` to a total order for determinism of
    * the underlying pass, rank itself only depends on `order`). */
  def withGlobalRank(df: DataFrame, order: Seq[Column],
                     tieBreak: Seq[Column], out: String = "rnk")
  : DataFrame = {
    val rn = withGlobalRowNumber(df, order ++ tieBreak, "__rn")
    // heal boundary-straddling ties: rank = min row_number per VALUE —
    // a hash-partitioned (scalable) window over the order key
    val byValue = Window.partitionBy(order: _*)
    rn.withColumn(out, min(col("__rn")).over(byValue)).drop("__rn")
  }

  /** Global percent_rank = (rank − 1) / (N − 1), N scalar. */
  def withGlobalPercentRank(df: DataFrame, order: Seq[Column],
                            tieBreak: Seq[Column], out: String = "pr")
  : DataFrame = {
    val n = df.count()
    val ranked = withGlobalRank(df, order, tieBreak, "__rnk")
    ranked
      .withColumn(out,
        (col("__rnk") - 1).cast("double") / math.max(n - 1L, 1L))
      .drop("__rnk")
  }
}
