package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter join pruning: drop probe-side rows whose key cannot exist
  * on the build side BEFORE the join shuffle.
  *
  * The at-scale gap this fills: a broadcast semi-join needs the build
  * side's exact key set small enough to broadcast; when the build side has
  * tens of millions of keys that's gigabytes — but its Bloom sketch at 1%
  * fpp is ~1.2 bytes/key, megabytes. Pruning the 100 TB fact with the
  * sketch map-side (no false negatives → join result provably unchanged;
  * false positives just ride the normal join) means the shuffle carries
  * only plausibly-matching rows — for selective joins, orders of magnitude
  * less exchange traffic. This is exactly the plan shape Spark's own
  * runtime row-level filtering (`spark.sql.optimizer.runtime.bloomFilter
  * .enabled`) injects; the explicit operator makes it available
  * unconditionally — e.g. across separately-planned stages or persisted
  * intermediate tables, where the optimizer cannot see both sides.
  *
  * Keys are hashed with `xxhash64` on BOTH sides (build items and probe
  * values), so any key type works and the probe predicate is the
  * codegen'd [[BloomFilterMightContain]] — the same expression the
  * injected runtime filter uses.
  */
object BloomJoin {

  /** A probe-side predicate testing `probeKey` against a Bloom sketch of
    * `buildKey` over `build`. The sketch is built by a distributed
    * aggregate (one pass over `build`) and embedded as a binary literal,
    * sized `expectedItems` keys at `fpp`. */
  def keyMightExist(build: DataFrame, buildKey: Column, probeKey: Column,
                    expectedItems: Long, fpp: Double = 0.01): Column = {
    val sketch = build.stat.bloomFilter(xxhash64(buildKey), expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    sketch.writeTo(bos)
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bos.toByteArray, BinaryType),
      ColumnBridge.expr(xxhash64(probeKey))))
  }

  /** `probe` reduced to rows whose key might appear in `build.buildKey`.
    * Semantically transparent for a subsequent equi-join on those keys:
    * the sketch has no false negatives. */
  def prune(probe: DataFrame, probeKey: Column, build: DataFrame,
            buildKey: Column, expectedItems: Long, fpp: Double = 0.01)
  : DataFrame =
    probe.filter(keyMightExist(build, buildKey, probeKey, expectedItems, fpp))

  /** Inner equi-join with the probe side Bloom-pruned first. Result is
    * identical to `probe.join(build, probeKey === buildKey)` — only the
    * shuffle volume changes. */
  def bloomJoin(probe: DataFrame, probeKey: Column, build: DataFrame,
                buildKey: Column, expectedItems: Long, fpp: Double = 0.01)
  : DataFrame =
    prune(probe, probeKey, build, buildKey, expectedItems, fpp)
      .join(build, probeKey === buildKey)
}
