package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming heavy hitters with FIXED memory — a sharded Count-Min sketch
  * plus a bounded candidate set on the Spark 4 `transformWithState` API:
  * the streaming twin of [[graft.operators.Sketches.heavyHitters]].
  *
  * Tokens hash-partition into `nShards` keys, so every occurrence of a
  * token lands on the same shard and state spreads across executors. Each
  * shard keeps one depth×width Count-Min counter matrix (counter ADDITION
  * is commutative, so the matrix is independent of arrival order) and the
  * current top-`k` candidate tokens by estimated count. State per shard is
  * `depth·width` longs + `k` (token, est) pairs — CONSTANT in stream
  * length; raw tokens are never buffered.
  *
  * Contract (the standard CMS+heap one): estimates are one-sided
  * (`est >= true count`, hash collisions only inflate); the candidate set
  * holds the tokens whose estimate was among the shard's top-k when they
  * were LAST seen — a token only ever missing from it if it stopped
  * arriving before its count grew competitive. In-batch rows process in
  * token order, so replaying the same per-shard batches yields identical
  * candidate sets under ties.
  */
object StreamingCms {

  case class Tok(token: String)

  /** Per-shard state: flattened counter matrix + parallel candidate
    * arrays (token, estimate at last admission). */
  case class ShardState(counters: Array[Long], cands: Array[String],
                        ests: Array[Long])

  /** One current candidate of one shard, re-emitted on every update. */
  case class HeavyHitter(shard: Int, token: String, est: Long)

  /** Deterministic row hash: MD5 of "r:token", first 8 bytes, folded to
    * [0, width). Pure JVM, identical on every executor/JVM. */
  private[streaming] def cell(token: String, r: Int, width: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$r:$token".getBytes("UTF-8"))
    val v = java.nio.ByteBuffer.wrap(d).getLong
    (((v % width) + width) % width).toInt
  }

  /** Stable shard of a token (r = -1 lane of the same hash family). */
  private[streaming] def shard(token: String, nShards: Int): Int =
    cell(token, -1, nShards)

  class Processor(depth: Int, width: Int, k: Int)
    extends StatefulProcessor[Int, Tok, HeavyHitter] {
    @transient private var state: ValueState[ShardState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[ShardState]("cms",
        Encoders.product[ShardState], TTLConfig.NONE)

    override def handleInputRows(key: Int, rows: Iterator[Tok],
                                 timerValues: TimerValues)
    : Iterator[HeavyHitter] = {
      val st = Option(state.get()).getOrElse(
        ShardState(new Array[Long](depth * width),
          Array.empty[String], Array.empty[Long]))
      val counters = st.counters
      val cands = scala.collection.mutable.LinkedHashMap(
        st.cands.zip(st.ests).toSeq: _*)
      // canonical in-batch order: determinism under any micro-batch split
      rows.toSeq.map(_.token).sorted.foreach { tok =>
        var est = Long.MaxValue
        var r = 0
        while (r < depth) {
          val c = r * width + cell(tok, r, width)
          counters(c) += 1
          if (counters(c) < est) est = counters(c)
          r += 1
        }
        cands(tok) = est
        if (cands.size > k) {
          // evict the weakest candidate; ties break on token order
          val weakest = cands.minBy { case (t, e) => (e, t) }._1
          cands.remove(weakest)
        }
      }
      val sorted = cands.toSeq.sortBy { case (t, e) => (-e, t) }
      state.update(ShardState(counters,
        sorted.map(_._1).toArray, sorted.map(_._2).toArray))
      sorted.iterator.map { case (t, e) => HeavyHitter(key, t, e) }
    }
  }

  /** Wire a token stream into the sharded sketch. Output mode Update:
    * each batch re-emits the touched shards' current candidates. */
  def heavyHitters(input: Dataset[Tok], nShards: Int = 8, depth: Int = 4,
                   width: Int = 256, k: Int = 5): Dataset[HeavyHitter] = {
    import input.sparkSession.implicits._
    input.groupByKey(t => shard(t.token, nShards))
      .transformWithState(new Processor(depth, width, k), TimeMode.None(),
        OutputMode.Update())
  }
}
