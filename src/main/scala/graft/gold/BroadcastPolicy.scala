package graft.gold

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** Config-table broadcast policy — the reference's rule engine
  * (`utils/analytics/broadcast_utils.py:35-182` in /root/reference) as
  * data: per-table rules (always / never / context-aware) with
  * per-processing-mode row thresholds and a force override, precedence
  * exactly as the reference documents it (force → always → never →
  * context-aware → safe default no-broadcast).
  *
  * Two Spark-first deviations from the reference implementation:
  *
  *  - `broadcast_utils.py:169-171` runs `df.count()` — a full extra job
  *    over the table — whenever a context-aware table arrives without a
  *    count. Here the undecided path consults the optimizer's plan
  *    statistics (free: parquet footers / CBO estimates) and otherwise
  *    falls back to the mode default, so a policy decision never costs a
  *    scan.
  *  - Not broadcasting is never fatal: Spark's AQE re-plans a sort-merge
  *    join into a broadcast join at runtime when the built side turns out
  *    small, so the static policy only needs to catch the clear wins.
  */
object BroadcastPolicy {

  sealed trait Rule
  /** Small master/lookup tables (broadcast_utils.py:36-41). */
  case object Always extends Rule
  /** Large operational tables (broadcast_utils.py:43-46). */
  case object Never extends Rule
  /** Mode/size dependent (broadcast_utils.py:48-52). */
  case object ContextAware extends Rule

  /** A policy: table→rule plus mode→row-threshold for context-aware
    * tables (unknown tables default to no broadcast,
    * broadcast_utils.py:110-112). */
  final case class Policy(rules: Map[String, Rule],
                          thresholds: Map[String, Long],
                          fallbackThreshold: Long) {

    /** Pure decision function (broadcast_utils.py:63-145). */
    def shouldBroadcast(table: String, mode: String,
                        recordCount: Option[Long] = None,
                        force: Option[Boolean] = None): Boolean =
      force.getOrElse(rules.get(table) match {
        case Some(Always) => true
        case Some(Never) => false
        case Some(ContextAware) =>
          val threshold = thresholds.getOrElse(mode, fallbackThreshold)
          recordCount match {
            case Some(n) => n <= threshold
            // no count → mode heuristic (broadcast_utils.py:140-145)
            case None => mode == "incremental"
          }
        case None => false // unknown table: safe default
      })

    /** Apply the hint (broadcast_utils.py:148-182). For context-aware
      * tables without a caller-supplied count, consult plan statistics
      * instead of running a count job. */
    def apply(df: DataFrame, table: String, mode: String,
              recordCount: Option[Long] = None,
              force: Option[Boolean] = None): DataFrame = {
      val count = recordCount.orElse {
        if (rules.get(table).contains(ContextAware))
          df.queryExecution.optimizedPlan.stats.rowCount.map(_.toLong)
        else None
      }
      if (shouldBroadcast(table, mode, count, force)) broadcast(df) else df
    }
  }

  /** The reference's shipped configuration (broadcast_utils.py:35-57). */
  val reference: Policy = Policy(
    rules = Map(
      "drivers_silver" -> Always,
      "sessions_silver" -> Always,
      "pitstops_silver" -> Always,
      "laps_silver" -> Never,
      "qualifying_results_silver" -> ContextAware,
      "race_results_silver" -> ContextAware),
    thresholds = Map("historical" -> 100L, "incremental" -> 1000L),
    fallbackThreshold = 100L)
}
