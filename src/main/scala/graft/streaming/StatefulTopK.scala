package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming running top-k per key on the Spark 4 `transformWithState`
  * API — the streaming twin of [[graft.plans.TopKPerKey]]: each key keeps
  * its current top-k values in a bounded ValueState and re-emits them
  * whenever a batch touches the key.
  *
  * Why transformWithState (vs the older mapGroupsWithState used by
  * [[EventStreams.gapSessionsCustom]]): typed state handles (Value/List/
  * Map) with per-state TTL, timers decoupled from data arrival, and the
  * RocksDB state store — the API built for exactly this kind of
  * incrementally-maintained per-key structure. State is O(k) per key by
  * construction, never a buffer of raw events.
  */
object StatefulTopK {

  /** (key, value) input row. */
  case class KV(key: Long, value: Double)

  /** Per-key current top-k, re-emitted on every update. */
  case class TopK(key: Long, topk: Array[Double])

  /** Bounded per-key top-k maintainer. State: ONE value — the sorted
    * top-k array (never the inputs), so admission is a merge-and-truncate
    * and state size is fixed. */
  class Processor(k: Int) extends StatefulProcessor[Long, KV, TopK] {
    @transient private var state: ValueState[TopK] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[TopK]("topk",
        Encoders.product[TopK], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[KV],
                                 timerValues: TimerValues): Iterator[TopK] = {
      val cur = Option(state.get()).map(_.topk).getOrElse(Array.empty[Double])
      val merged = (cur ++ rows.map(_.value))
        .sorted(Ordering[Double].reverse).take(k)
      val out = TopK(key, merged)
      state.update(out)
      Iterator.single(out)
    }
  }

  /** Wire a keyed stream of (key, value) into the running top-k. */
  def topKPerKey(input: Dataset[KV], k: Int): Dataset[TopK] = {
    import input.sparkSession.implicits._
    input.groupByKey(_.key)
      .transformWithState(new Processor(k), TimeMode.None(),
        OutputMode.Update())
  }
}
