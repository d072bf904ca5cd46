package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming ONE-STEP-AHEAD anomaly detector — the streaming twin of the
  * batch z-score tier (ts1/ts9): each series keeps exact integer
  * sufficient statistics (n, Σx, Σx²) in a ValueState and tests every
  * arriving observation against the state BEFORE admitting it (the honest
  * online formulation — a batch z-score lets the anomaly inflate the very
  * variance it is tested against).
  *
  * The |z| > 2.5 test is the cross-multiplied integer inequality
  * 4·(x·n − S)² > 25·(n·Σx² − S²) evaluated in BigInt, so the flag
  * sequence is a pure function of the OBSERVATION ORDER — replaying the
  * same per-series sequence through any micro-batch split yields
  * identical flags (in-batch rows are ordered by the total (t, x) key,
  * so equal-timestamp ties cannot flip with the batch split). State
  * is three longs per series regardless of stream length; TTL and store
  * come from the transformWithState runtime like [[StatefulTopK]].
  */
object StatefulAnomaly {

  /** One observation of a keyed series at time `t`. */
  case class Obs(series: String, t: Long, x: Long)

  /** Flag for `x` at `t`, tested against `nPrior` prior observations
    * (false while nPrior < 3 — no variance to test against yet). */
  case class Flag(series: String, t: Long, x: Long, nPrior: Long,
                  isAnomaly: Boolean)

  /** Exact running sufficient statistics (fits long far beyond any
    * realistic daily-count magnitude; the test itself runs in BigInt). */
  case class Stats(n: Long, s: Long, ss: Long)

  class Processor extends StatefulProcessor[String, Obs, Flag] {
    @transient private var state: ValueState[Stats] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[Stats]("stats",
        Encoders.product[Stats], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[Flag] = {
      var st = Option(state.get()).getOrElse(Stats(0L, 0L, 0L))
      // Sort by the TOTAL key (t, x): ordering by t alone leaves rows
      // with equal timestamps in arrival order, so re-ordering WITHIN a
      // micro-batch could flip flags — the total key makes processing
      // deterministic GIVEN a batch split. Residual caveat: two
      // equal-timestamp rows landing in DIFFERENT micro-batches still
      // process in stream-arrival order, which can differ from the
      // in-batch (t, x) sort; only distinct-timestamp data is fully
      // split-invariant.
      val out = rows.toSeq.sortBy(o => (o.t, o.x)).map { o =>
        val flagged = st.n >= 3 && {
          val dev = BigInt(o.x) * st.n - st.s
          dev * dev * 4 > BigInt(25) *
            (BigInt(st.n) * st.ss - BigInt(st.s) * st.s)
        }
        val f = Flag(o.series, o.t, o.x, st.n, flagged)
        st = Stats(st.n + 1, st.s + o.x, st.ss + o.x * o.x)
        f
      }
      state.update(st)
      out.iterator
    }
  }

  /** Wire a keyed observation stream into the online anomaly test. */
  def flagAnomalies(input: Dataset[Obs]): Dataset[Flag] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.series)
      .transformWithState(new Processor, TimeMode.None(),
        OutputMode.Append())
  }
}
