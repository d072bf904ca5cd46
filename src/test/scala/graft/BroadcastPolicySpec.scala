package graft

import org.apache.spark.sql.functions._

import graft.gold.BroadcastPolicy
import graft.gold.BroadcastPolicy.reference

/** Decision-table coverage for the config-driven broadcast policy
  * (reference: utils/analytics/broadcast_utils.py:35-182). */
class BroadcastPolicySpec extends SparkSpec {

  test("rule precedence: force > always > never > context-aware > default") {
    // force override wins over everything
    assert(!reference.shouldBroadcast("drivers_silver", "historical",
      force = Some(false)))
    assert(reference.shouldBroadcast("laps_silver", "historical",
      force = Some(true)))
    // always / never
    assert(reference.shouldBroadcast("drivers_silver", "historical"))
    assert(reference.shouldBroadcast("sessions_silver", "incremental"))
    assert(!reference.shouldBroadcast("laps_silver", "incremental"))
    // unknown tables: safe default no-broadcast
    assert(!reference.shouldBroadcast("mystery_table", "incremental"))
  }

  test("context-aware: thresholds per mode, mode heuristic without count") {
    val t = "race_results_silver"
    assert(reference.shouldBroadcast(t, "historical", Some(100L)))
    assert(!reference.shouldBroadcast(t, "historical", Some(101L)))
    assert(reference.shouldBroadcast(t, "incremental", Some(1000L)))
    assert(!reference.shouldBroadcast(t, "incremental", Some(1001L)))
    // unknown mode falls back to the conservative threshold
    assert(reference.shouldBroadcast(t, "backfill", Some(100L)))
    assert(!reference.shouldBroadcast(t, "backfill", Some(101L)))
    // no count available: incremental broadcasts, historical does not
    assert(reference.shouldBroadcast(t, "incremental"))
    assert(!reference.shouldBroadcast(t, "historical"))
  }

  test("apply() plants a broadcast hint that survives to the join plan") {
    import spark.implicits._
    val facts = (1 to 1000).map(i => (i.toLong % 30 + 1, i * 1.0))
      .toDF("driver_number", "v")
    val dim = (1L to 30L).map(d => (d, s"Driver $d"))
      .toDF("driver_number", "full_name")

    val hinted = reference.apply(dim, "drivers_silver", "historical")
    val joined = facts.join(hinted, "driver_number")
    assert(joined.queryExecution.executedPlan.toString
      .contains("BroadcastHashJoin"))

    // never-broadcast table passes through without a hint node
    val unhinted = reference.apply(dim, "laps_silver", "historical")
    assert(unhinted.queryExecution.logical ==
      dim.queryExecution.logical)
  }
}
