package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the ab22 SPRT monitor — sequential testing's
  * natural habitat: events arrive, each arm's log-likelihood ratio
  * accumulates, and the monitor emits a decision record the moment a
  * Wald boundary is crossed (the always-valid "peek daily, stop early"
  * workflow that fixed-horizon tests forbid).
  *
  * Division of labor mirrors the batch query: the hypotheses are FROZEN
  * micro-nat literals (ln(p1/p0), ln(q1/q0) — planning-pass constants),
  * the boundaries ±ln((1−β)/α); the stream side is a per-arm running
  * integer sum in `flatMapGroupsWithState` — state is TWO longs per arm
  * (the LLR and a decided flag), O(arms) total, never corpus-sized.
  * Batch ≡ stream: replaying the same per-day (n, c) increments in day
  * order produces the same crossing day and the same final LLR as the
  * batch cumulative (StreamingSpec pins it).
  */
object ExperimentStreams {

  /** One day's rollup for one arm arriving at the monitor. */
  case class ArmDay(arm: Long, day: Long, n: Long, c: Long)
  /** Monitor state: cumulative LLR and whether a boundary already
    * fired (SPRT decisions are one-shot — later data must not
    * un-decide). */
  case class SprtState(llr: Long, decided: Boolean)
  /** Emitted per processed day: running LLR plus the decision label
    * the first time a boundary is crossed ("accept_h1" / "accept_h0",
    * null while running). */
  case class SprtUpdate(arm: Long, day: Long, llr_micro: Long,
                        decision: String)

  /** `lnLr1` = micro-nats per conversion (ln p1/p0), `lnLr0` = per
    * non-conversion (ln q1/q0), `bound` = ln((1−β)/α) in micro. Days
    * must arrive in order per arm across batches; within a batch the
    * iterator is sorted (micro-batches may reorder). */
  def sprtMonitor(updates: Dataset[ArmDay], lnLr1: Long, lnLr0: Long,
                  bound: Long): Dataset[SprtUpdate] = {
    import updates.sparkSession.implicits._
    updates.groupByKey(_.arm)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout) {
        (arm: Long, it: Iterator[ArmDay], state: GroupState[SprtState]) =>
          var st = state.getOption.getOrElse(SprtState(0L, decided = false))
          val out = it.toSeq.sortBy(_.day).map { d =>
            st = st.copy(llr = st.llr + d.c * lnLr1 + (d.n - d.c) * lnLr0)
            val decision =
              if (st.decided) null
              else if (st.llr >= bound) { st = st.copy(decided = true)
                "accept_h1" }
              else if (st.llr <= -bound) { st = st.copy(decided = true)
                "accept_h0" }
              else null
            SprtUpdate(arm, d.day, st.llr, decision)
          }
          state.update(st)
          out.iterator
      }
  }
}
