package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cluster-quality audit for entity-resolution output (er4 and kin):
  * transitive closure can chain A~B~C into one entity even when A and C
  * are far apart; per-cluster size + the maximum intra-cluster edit
  * distance is the table that catches runaway chains before the merged
  * entities ship.
  *
  * The member CAP is load-bearing: the uncapped size² pair fan IS the
  * runaway the audit detects (measured 335.9 s at sf0.1 where
  * sequential fixture names chain into one giant component; capped at
  * 20: 3.4 s, and the sampled diameter still flags the chain). Pair
  * work is bounded at C(cap, 2) per cluster — 190 comparisons at the
  * default — regardless of cluster size, so the audit stays an audit
  * even when the pathology it hunts is present. The reported max is a
  * LOWER bound for clusters above the cap — exactly the right direction
  * for an alarm (a capped sample of a chain still shows a large
  * diameter; OperatorsSpec pins both properties).
  */
object EntityAudit {

  /** Per-cluster `n_members` (exact, over ALL members) and
    * `max_intra_dist` (max pairwise Levenshtein over the first `cap`
    * members by id — exact below the cap, a lower bound above it).
    * Clusters with a single member have no pairs and are omitted, same
    * as the er4 contract. The cap window partitions by component:
    * cluster sizes are bounded by entity multiplicity (and the capped
    * output by `cap`), never corpus size, so the window is admissible
    * under the SCALE.md review rule — with one spelled caveat: the
    * row_number sorts ALL members of a component through one task
    * BEFORE the cap filter, so the pathological chained mega-cluster
    * this audit exists to surface pays an O(n log n) single-task sort
    * of that one component (vs the O(n²) pair fan the cap removes).
    * That is the accepted bound: the sort is per-component, spills,
    * and terminates; the alarm (huge `n_members`, large capped
    * diameter) still fires. Pre-sampling members by hash before the
    * window would cut it to O(cap) but loses the "first `cap` by id"
    * determinism the oracle pins. */
  def clusterAudit(members: DataFrame, component: Column, id: Column,
                   name: Column, cap: Int = 20): DataFrame = {
    val m = members.select(component.as("component"), id.as("id"),
      name.as("nm"))
    val w = Window.partitionBy(col("component")).orderBy(col("id"))
    val capped = m.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= cap).select("component", "id", "nm")
    val intra = capped.as("a").join(capped.as("b"),
        col("a.component") === col("b.component") &&
          col("a.id") < col("b.id"))
      .select(col("a.component").as("component"),
        levenshtein(col("a.nm"), col("b.nm")).cast("bigint").as("dist"))
    m.groupBy("component").agg(count(lit(1)).as("n_members"))
      .join(intra.groupBy("component")
        .agg(max(col("dist")).as("max_intra_dist")), Seq("component"))
  }
}
