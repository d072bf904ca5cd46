package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
