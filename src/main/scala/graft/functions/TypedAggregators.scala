package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`s — the typed-UDAF tier (SURVEY.md §2.J notes the
  * reference needs none; these are "beyond reference" API-surface
  * coverage). Unlike `mapGroups`, an Aggregator participates in partial
  * aggregation: partial buffers reduce map-side and merge after the
  * shuffle, so the exchange carries one buffer per (key, partition) —
  * the same scaling argument as [[graft.plans.TopKPerKey]].
  */
object TypedAggregators {

  /** Input row for [[TopOrder]]. */
  final case class OrderObs(o_orderkey: Long, o_totalprice: Double)

  /** Argmax buffer: the best (price desc, orderkey asc) observation so
    * far; `valid=false` is the zero element. */
  final case class TopBuf(valid: Boolean, o_orderkey: Long,
                          o_totalprice: Double)

  /** Deterministic argmax: the order with the highest total price, ties
    * broken by the smaller order key. Associative and commutative, so
    * partial/merge order never changes the result. */
  object TopOrder extends Aggregator[OrderObs, TopBuf, TopBuf] {
    override def zero: TopBuf = TopBuf(valid = false, 0L, 0.0)

    private def better(a: TopBuf, b: TopBuf): TopBuf =
      if (!a.valid) b
      else if (!b.valid) a
      else if (a.o_totalprice > b.o_totalprice) a
      else if (a.o_totalprice < b.o_totalprice) b
      else if (a.o_orderkey <= b.o_orderkey) a
      else b

    override def reduce(buf: TopBuf, in: OrderObs): TopBuf =
      better(buf, TopBuf(valid = true, in.o_orderkey, in.o_totalprice))
    override def merge(a: TopBuf, b: TopBuf): TopBuf = better(a, b)
    override def finish(r: TopBuf): TopBuf = r
    override def bufferEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
    override def outputEncoder: Encoder[TopBuf] = Encoders.product[TopBuf]
  }
}
