package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for every left row, attach the right row with the greatest
  * right-time ≤ left-time within the same key (the classic
  * point-in-time/backward as-of join; Spark has no built-in).
  *
  * SURVEY §7.3 preference order (a): composed from existing operators —
  * a tagged union plus one `last(..., ignoreNulls)` running window —
  * rather than a custom physical operator. Cost model: ONE shuffle of
  * (|L|+|R|) rows on the key, then a sorted window pass per partition;
  * no range-explode, no per-row binary search, and skew handling comes
  * free from AQE. This is the plan a custom SparkPlan would produce
  * anyway, so tier (c) machinery isn't warranted.
  *
  * Contract: right must be unique per (key, time) — pre-dedupe with
  * [[dedupeRight]] (ambiguous ties are the classic as-of footgun; the
  * API forces the choice to be explicit). Inner semantics: left rows
  * with no matching right row are dropped.
  */
object AsOfJoin {

  /** Keep one right row per (key, time): the one with the greatest
    * `tieBreak`. */
  def dedupeRight(right: DataFrame, keyCol: String, timeCol: String,
                  tieBreak: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol), col(timeCol))
      .orderBy(col(tieBreak).desc)
    right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** @param left       probe side
    * @param right      build side, unique per (key, time)
    * @param keyCol     equi-key present on both sides
    * @param leftTime   left event-time column name
    * @param rightTime  right event-time column name
    * @param payload    right columns to carry onto matches
    * @param direction  "backward" (greatest right-time ≤ left-time, the
    *                   default point-in-time lookup) or "forward"
    *                   (smallest right-time ≥ left-time — "what happened
    *                   next": next order after a click, next error after
    *                   a deploy). Same one-shuffle sorted-window plan,
    *                   scanned in the opposite time order.
    * @param tolerance  optional max |left-time − right-time| (same unit
    *                   as the NUMERIC time columns — epoch-µs in this
    *                   catalog). The nearest match is found first, then
    *                   dropped if it is farther than the tolerance —
    *                   pandas merge_asof semantics: a too-far nearest
    *                   match does NOT fall through to the next-nearest.
    *                   A post-window filter, so the plan is unchanged.
    */
  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String,
               leftTime: String, rightTime: String,
               payload: Seq[String],
               direction: String = "backward",
               tolerance: Option[Long] = None): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    // A payload name already present on the left would poison the running
    // fill (left values would be picked up by the window) — reject early.
    val clash = payload.filter(leftCols.contains)
    require(clash.isEmpty,
      s"payload columns ${clash.mkString(",")} already exist on the left")

    val taggedLeft = left
      .withColumn("__t", col(leftTime)).withColumn("__side", lit(0))
    // The whole payload rides in ONE struct so every carried field comes
    // from the same right row (no per-column backfill mixing rows), and a
    // matched row with null fields still counts as a match: the struct
    // itself is non-null even when all its fields are null.
    // The matched right time rides in the struct as __rt so the tolerance
    // gate can measure the gap to the row that actually matched.
    val taggedRight = right
      .select((keyCol +: rightTime +: payload).distinct.map(col): _*)
      .withColumn("__t", col(rightTime)).withColumn("__side", lit(1))
      .withColumn("__p",
        struct(payload.map(col) :+ col(rightTime).as("__rt"): _*))
      .select(col(keyCol), col("__t"), col("__side"), col("__p"))

    // right rows sort before left rows at equal time, so t_left == t_right
    // matches (the ≤/≥ semantics); left rows carry __p = null and are
    // skipped by ignoreNulls, so they never feed the fill. Forward = the
    // identical running fill scanned in descending time order.
    val tOrder =
      if (direction == "backward") col("__t").asc else col("__t").desc
    val order = Window.partitionBy(col(keyCol))
      .orderBy(tOrder, col("__side").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = taggedLeft
      .unionByName(taggedRight, allowMissingColumns = true)
      .withColumn("__p", last(col("__p"), ignoreNulls = true).over(order))
      .filter(col("__side") === 0 && col("__p").isNotNull)
    val gated = tolerance match {
      case Some(tol) =>
        // The gap is nonnegative by construction in either direction.
        val gap =
          if (direction == "backward")
            col("__t") - col("__p").getField("__rt")
          else col("__p").getField("__rt") - col("__t")
        matched.filter(gap <= tol)
      case None => matched
    }
    gated.select(leftCols.map(col) ++
      payload.map(p => col("__p").getField(p).as(p)): _*)
  }

  /** NEAREST as-of (pandas merge_asof direction='nearest'): for each left
    * row, the right row minimizing |leftTime − rightTime| within the key;
    * equal distances go to the EARLIER right time (the backward
    * candidate). Composed from one backward and one forward pass re-joined
    * on `rowId` (a unique left row key), so the cost is 2× a
    * one-directional as-of — independent of how many right rows a key has,
    * never a per-key fan-out join. Unlike the one-directional passes this
    * is LEFT-OUTER: a row matched on only one side falls back to it, and a
    * row matched on neither survives with null payload (the honest-
    * denominator contract, cf. ev15). Output: every left column, then
    * `payload` and the matched right time, null when unmatched. */
  def asofNearest(left: DataFrame, right: DataFrame, keyCol: String,
                  leftTime: String, rightTime: String,
                  payload: Seq[String], rowId: String): DataFrame = {
    val probe = left.select(col(rowId), col(keyCol), col(leftTime))
    val carry = (payload :+ rightTime).distinct
    def pass(dir: String, tag: String): DataFrame =
      asofJoin(probe, right, keyCol, leftTime, rightTime, carry,
          direction = dir)
        .select(col(rowId) +:
          carry.map(p => col(p).as(s"__${tag}_$p")): _*)
    val joined = left
      .join(pass("backward", "b"), Seq(rowId), "left")
      .join(pass("forward", "f"), Seq(rowId), "left")
    val bt = col(s"__b_$rightTime")
    val ft = col(s"__f_$rightTime")
    // ft null → backward branch (itself null when both missed)
    val useBackward = ft.isNull ||
      (bt.isNotNull && (col(leftTime) - bt <= ft - col(leftTime)))
    joined.select(left.columns.map(col) ++ carry.map(p =>
      when(useBackward, col(s"__b_$p")).otherwise(col(s"__f_$p")).as(p)): _*)
  }
}
