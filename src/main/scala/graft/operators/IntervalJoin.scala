package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join: the shuffle-scalable form of a range
  * join when NEITHER side fits in a broadcast.
  *
  * A raw `points.join(intervals, lo <= x && x <= hi)` plans as a nested-
  * loop join — broadcastable only while one side is small ([[graft.queries
  * .RelationalQueries]] `j1` covers that tier). At 100 TB both sides are
  * huge, and the standard fix is to discretize the range dimension:
  * intervals explode into the fixed-width buckets they overlap, points map
  * into the ONE bucket they fall in, and the join becomes an ordinary
  * hash-partitioned equi-join on (bucket [, key]) with the exact predicate
  * re-applied behind it. A (point, interval) pair can only meet in the
  * point's single bucket, so no dedup pass is needed.
  *
  * Cost model: shuffle volume is |points| + Σ(interval span / bucketWidth)
  * — pick `bucketWidth` near the TYPICAL interval length so each interval
  * lands in O(1) buckets. The bucket function uses one consistent
  * floor-division formula on both sides; it is monotone, so a point inside
  * [lo, hi] always lands between the interval's bucket endpoints and no
  * pair is missed.
  */
object IntervalJoin {

  private def bucketOf(c: Column, width: Long): Column =
    floor(c.cast("double") / width).cast("long")

  /** Join `points` (at `pointCol`) to `intervals` ([`loCol`, `hiCol`],
    * inclusive both ends) with an optional extra equality predicate
    * (e.g. a shared user key — it joins the bucket key, tightening the
    * shuffle). Output: all columns of both inputs. */
  def pointInInterval(points: DataFrame, pointCol: Column,
                      intervals: DataFrame, loCol: Column, hiCol: Column,
                      bucketWidth: Long,
                      extraCond: Option[Column] = None): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    require(!(points.columns ++ intervals.columns).contains("__bucket"),
      "__bucket is reserved by IntervalJoin")
    val exploded = intervals.withColumn("__bucket",
      explode(sequence(bucketOf(loCol, bucketWidth),
        bucketOf(hiCol, bucketWidth))))
    val bucketed = points.withColumn("__bucket",
      bucketOf(pointCol, bucketWidth))
    val cond = bucketed("__bucket") === exploded("__bucket") &&
      pointCol >= loCol && pointCol <= hiCol
    bucketed.join(exploded, extraCond.map(cond && _).getOrElse(cond))
      .drop("__bucket")
  }
}
