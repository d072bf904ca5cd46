package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Structured Streaming extension (beyond reference parity — the
  * reference's "incremental" mode is a weekly batch re-run, SURVEY.md
  * §2.I). These re-state the engine's event operations as streaming
  * transforms so the same semantics run on unbounded input:
  *
  *  - watermarked tumbling/session windows bound state for late data;
  *  - the gap-sessionization mirrors the batch `ev2_sessionize` query via
  *    `session_window` (state merges as events arrive, emits on
  *    watermark passage);
  *  - all transforms are DataFrame → DataFrame and work identically on a
  *    batch frame (Spark's unified semantics), which is how the specs
  *    drive them with MemoryStream.
  *
  * Input contract: an events frame with `ts: timestamp`, `user_id`,
  * `event_type`, `value`.
  */
object EventStreams {

  /** Per-window, per-type event counts with a late-data watermark.
    * At scale: state is bounded by (watermark horizon × distinct keys);
    * partial aggregation happens map-side before the state-store shuffle.
    */
  def windowedTypeCounts(events: DataFrame,
                         windowLen: String = "10 minutes",
                         watermark: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n_events"), col("total_value"))

  /** Gap-based sessionization: a session closes after `gap` of silence per
    * user — the streaming twin of the batch lag/running-sum variant.
    * `session_window` keeps one merging state entry per open session. */
  def sessionize(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("session_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("session_value"))

  /** Running per-user event totals (complete-mode style aggregate). */
  def userTotals(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))

  /** Stream-stream interval join (ad-attribution shape): each click joins
    * the impressions of the same user at most `withinMinutes` earlier.
    * Both sides carry watermarks and the join condition bounds event time
    * in BOTH directions, so Spark can size the join state and drop
    * expired rows — the requirements for unbounded-input joins.
    * Contract: impressions(ts, user_id, value), clicks(click_ts, user_id).
    */
  def attributeClicks(impressions: DataFrame, clicks: DataFrame,
                      withinMinutes: Int = 30,
                      joinType: String = "inner"): DataFrame = {
    val i = impressions.withWatermark("ts", s"$withinMinutes minutes")
      .select(col("ts").as("imp_ts"), col("user_id"),
        col("value").as("imp_value"))
    val c = clicks.withWatermark("click_ts", s"$withinMinutes minutes")
    i.join(c,
      i("user_id") === c("user_id") &&
        c("click_ts") >= i("imp_ts") &&
        c("click_ts") <= i("imp_ts") + expr(s"INTERVAL $withinMinutes MINUTES"),
      joinType)
      // coalesce: for inner/left the impression side is always bound; a
      // full-outer's click-only rows carry the user only on the click side
      .select(coalesce(i("user_id"), c("user_id")).as("user_id"),
        col("imp_ts"), col("click_ts"), col("imp_value"))
  }

  /** Left-outer variant: impressions with no click inside the window
    * emit null-extended once the watermark proves no match can arrive —
    * the "unconverted impressions" feed. Same bounded state as the inner
    * join; the outer row is held only until the time bound expires. */
  def attributeClicksLeftOuter(impressions: DataFrame, clicks: DataFrame,
                               withinMinutes: Int = 30): DataFrame =
    attributeClicks(impressions, clicks, withinMinutes, "left_outer")

  /** Full-outer variant: unconverted impressions AND orphan clicks (no
    * impression inside the window — broken tracking, bot traffic) each
    * emit null-extended when their side's watermark expires. State stays
    * bounded exactly as in the inner join: both sides are watermarked and
    * the join condition bounds event time in both directions. */
  def attributeClicksFullOuter(impressions: DataFrame, clicks: DataFrame,
                               withinMinutes: Int = 30): DataFrame =
    attributeClicks(impressions, clicks, withinMinutes, "full_outer")

  /** Watermark-bounded exact dedup: duplicates arriving within the
    * watermark horizon are dropped, and state for an id is freed once the
    * watermark passes — the streaming twin of the batch exact-dedup
    * operator with O(ids-in-horizon) state instead of O(all-time ids). */
  def dedupeWithinWatermark(events: DataFrame, idCol: String,
                            watermark: String = "30 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  case class TimedEvent(ts: Timestamp, user_id: Long, value: Double)
  // NOT private: the state Encoder's generated code invokes the accessors
  // reflectively from synthesized Java, which can't see private members.
  case class OpenSession(start_ms: Long, last_ms: Long,
      n_events: Long, total_value: Double)
  case class ClosedSession(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, session_value: Double)

  /** Gap sessionization as an explicit state machine via
    * `flatMapGroupsWithState` + event-time timeout — the fully-custom
    * tier below [[sessionize]]'s `session_window`. Within a batch, a gap
    * larger than `gapMs` closes the open session immediately; the LAST
    * open session per user closes when the watermark passes
    * last-event + gap (`setTimeoutTimestamp`, so idle users emit without
    * new data — Spark schedules a no-data micro-batch on watermark
    * advance). State is one small record per active user, store-backed
    * and bounded by the timeout. `session_end` = last event + gap,
    * matching `session_window` semantics.
    */
  def gapSessionsCustom(events: Dataset[TimedEvent],
                        gapMs: Long = 10L * 60 * 1000,
                        watermark: String = "10 minutes")
  : Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    def close(user: Long, s: OpenSession) = ClosedSession(user,
      new Timestamp(s.start_ms), new Timestamp(s.last_ms + gapMs),
      s.n_events, s.total_value)
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user, batch, state) =>
          if (state.hasTimedOut) {
            val out = state.getOption.map(close(user, _)).iterator
            state.remove()
            out
          } else {
            // micro-batch order is not event order — sort the (small)
            // per-user slice before folding it through the state machine
            val evs = batch.toIndexedSeq.sortBy(_.ts.getTime)
            val closed = Vector.newBuilder[ClosedSession]
            var open = state.getOption
            evs.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last_ms > gapMs =>
                  closed += close(user, s)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case Some(s) =>
                  open = Some(s.copy(last_ms = math.max(s.last_ms, t),
                    n_events = s.n_events + 1,
                    total_value = s.total_value + e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }

  case class UserEvent(user_id: Long, event_type: String, value: Double)
  case class UserProfile(user_id: Long, n_events: Long,
      total_value: Double, n_purchases: Long, vip: Boolean)

  /** Custom keyed state via `mapGroupsWithState`: a per-user profile that
    * survives across micro-batches (event/purchase counters + a VIP flag
    * once lifetime spend crosses `vipThreshold`). This is the escape hatch
    * for state machines `session_window`/aggregates can't express; state
    * volume is one small record per active user, store-backed and
    * checkpointed. Emit mode: updated profiles each batch (Update). */
  def userProfiles(events: Dataset[UserEvent],
                   vipThreshold: Double = 100.0): Dataset[UserProfile] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[UserEvent],
         state: org.apache.spark.sql.streaming.GroupState[UserProfile]) =>
          val prev = state.getOption.getOrElse(
            UserProfile(user, 0L, 0.0, 0L, vip = false))
          val updated = batch.foldLeft(prev) { (acc, e) =>
            acc.copy(
              n_events = acc.n_events + 1,
              total_value = acc.total_value + e.value,
              n_purchases = acc.n_purchases +
                (if (e.event_type == "purchase") 1 else 0))
          }
          val finalP = updated.copy(vip = updated.total_value >= vipThreshold)
          state.update(finalP)
          finalP
      }
  }
}
