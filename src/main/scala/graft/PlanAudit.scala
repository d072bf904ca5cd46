package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, DatasetBridge}

/** Plan-shape audit over the whole query catalog: prints, per query, the
  * number of shuffle exchanges, broadcast exchanges, whole-stage-codegen
  * spans, and whether the scan carries pushed filters — the properties
  * that decide whether a plan survives a 100× scale-up (builder prompt:
  * ".explain the plan and iterate until it's the plan you'd want").
  * Run: `sbt "runMain graft.PlanAudit [sfDir]"`.
  */
object PlanAudit {

  /** One window's measured shape: partition-key SQL, the distinct key
    * count (= the window's parallelism ceiling — an unpartitioned window
    * counts as 1), and its input row count. */
  case class WindowShape(keys: Seq[String], groups: Long, rows: Long) {
    def describe: String =
      s"partitionBy(${keys.mkString(", ")}) groups=$groups rows=$rows"
  }

  /** MEASURED window-funnel audit — the executable form of SCALE.md's
    * single-partition-window review rule. A window partitioned by a
    * low-cardinality key (3 return flags, 2 experiment arms) over a
    * corpus-sized frame is correct today and dead at 100×: parallelism
    * = #groups no matter how many executors exist — and the shape is
    * invisible to a static plan check because key cardinality is a DATA
    * property. So measure it: collect every logical [[Window]] in the
    * plan, wrap its child back into a DataFrame, and count input rows
    * and distinct partition-key values. Flag when the parallelism
    * ceiling is below `minGroups` AND the input exceeds
    * `groups × rowsPerGroup` (i.e. the funnel is fed more than a
    * bounded-domain frame). Windows over domain-bounded frames (score
    * sweeps, calendar days, decile tables) stay under the row bound and
    * pass; anything flagged must either move to
    * [[graft.operators.GlobalRank]] or be added to the audited
    * exception list that PlanSpec pins against SCALE.md's table. */
  def windowFunnels(df: DataFrame, minGroups: Long, rowsPerGroup: Long)
  : Seq[WindowShape] = {
    import org.apache.spark.sql.catalyst.plans.logical.{Window => LWindow}
    val wins = df.queryExecution.optimizedPlan.collect {
      case w: LWindow => w
    }
    val shapes = wins.flatMap { w =>
      // GlobalRank's running-sum pass windows by its reserved `__pid`
      // (= spark_partition_id of the pinned range layout): cardinality
      // is the session's parallelism BY CONSTRUCTION — it scales with
      // the cluster, which is exactly what this gate is measuring for.
      // The name is safe to key on: GlobalRank require()s it absent
      // from user frames.
      if (w.partitionSpec.exists(_.references.exists(_.name == "__pid")))
        None
      else windowShape(df, w, minGroups, rowsPerGroup)
    }
    // Layout lifecycle: this helper executes per-window counting
    // queries against frames whose GlobalRank layouts were pinned at
    // the CALLER's query construction — the caller owns the query
    // boundary and must wrap construction + this measurement in
    // GlobalRank.withScope (every caller does: PreflightSweep,
    // AllowlistedSweep.run, the specs). The global releaseLayouts()
    // drain that used to sit here was a no-op for scoped callers and
    // a trap for a concurrent unscoped one — a library helper must
    // never free layouts it does not own (round-11 directive 6).
    shapes
  }

  private def windowShape(
      df: DataFrame,
      w: org.apache.spark.sql.catalyst.plans.logical.Window,
      minGroups: Long, rowsPerGroup: Long): Option[WindowShape] = {
      val child = DatasetBridge.ofRows(df, w.child)
      val (groups, rows) =
        if (w.partitionSpec.isEmpty) (1L, child.count())
        else {
          val r = child.select(
            count_distinct(
              struct(w.partitionSpec.map(ColumnBridge.column): _*))
              .as("g"),
            count(lit(1)).as("n")).head()
          (r.getLong(0), r.getLong(1))
        }
      if (groups < minGroups && rows > groups * rowsPerGroup)
        Some(WindowShape(w.partitionSpec.map(_.sql), groups, rows))
      else None
  }

  /** One measured plan hazard: the scale-killer class, the MEASURED row
    * count feeding it, and where it sat in the plan. */
  case class Hazard(kind: String, rows: Long, detail: String) {
    def describe: String = s"$kind rows=$rows $detail"
  }

  /** MEASURED scale-hazard sweep — the FunnelSpec pattern generalized
    * from windows to the other plan shapes that are correct at test SF
    * and dead at 100× (round-8 directive 1). Three classes, each gated
    * on MEASURED row counts (read from the executed plan's SQL metrics
    * after running the query once), because boundedness is a DATA
    * property invisible to static plan checks:
    *
    *  - `single-partition-exchange`: a shuffle whose output partitioning
    *    is `SinglePartition` funnels its whole input through one task.
    *    Legit at any scale when the input is already reduced (a global
    *    agg's partial rows: ≤ #partitions); fatal when a corpus-sized
    *    frame flows in. Gate: records written > `singlePartBound`.
    *  - `cartesian-product`: a non-broadcast nested-loop join shuffles
    *    nothing but computes |L|·|R| partition pairs — admissible only
    *    when one side is domain-bounded (and then it should have been
    *    broadcast). Gate: min(side rows) > `loopBound`.
    *  - `nested-loop-broadcast`: a BroadcastNestedLoopJoin re-scans its
    *    broadcast side per streamed row AND ships it to every executor —
    *    fine for scalar stats frames and ≤64-row query sets, fatal for a
    *    corpus-proportional side (150 customers at sf0.001 is 150M at
    *    petabyte SF). Gate: build-side rows > `loopBound`.
    *
    * Metrics require the plan to have EXECUTED: callers run with AQE off
    * (so the executed plan is the static shape, with no runtime skew
    * rescue flattering the audit) and this method drives the plan's own
    * RDD once before reading. A MISSING metric key reports -1 and FLAGS.
    * A metric that exists but never fired reads as its 0 init value —
    * indistinguishable from a fired zero (`SQLMetric` is created with
    * initValue 0 and `isZero` compares against it), so an exchange in a
    * short-circuited subtree passes like any zero-row exchange. That is
    * the measured truth at this fixture (zero rows flowed); growth that
    * would wake such a subtree is what the sf0.01 preflight sweep and
    * the cross-SF timing gate ([[graft.ScalingAudit]]) exist to catch. */
  def scaleHazards(df: DataFrame, singlePartBound: Long, loopBound: Long)
  : Seq[Hazard] = scaleHazardsTimed(df, singlePartBound, loopBound)._1

  /** [[scaleHazards]] plus the wall seconds of the plan's execution
    * (metric traversal excluded) — lets [[PreflightSweep]] reuse ONE
    * sf-B execution as both the hazard measurement and the scaling
    * gate's t_B, instead of executing the catalog twice. */
  def scaleHazardsTimed(df: DataFrame, singlePartBound: Long,
                        loopBound: Long): (Seq[Hazard], Double) = {
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

    val qe = df.queryExecution
    // execute THIS plan instance so its metrics populate (df.count()
    // would build and run a different plan)
    val t0 = System.nanoTime()
    qe.executedPlan.execute().count()
    val execSec = (System.nanoTime() - t0) / 1e9
    // layout lifecycle: the caller owns the query boundary and wraps
    // construction + this execution in GlobalRank.withScope (see the
    // windowFunnels note — same contract, round-11 directive 6)

    def metricOf(p: SparkPlan, key: String): Long =
      p.metrics.get(key).map(_.value).getOrElse(-1L)
    // a node's produced row count = first pre-order descendant exposing
    // numOutputRows (codegen wrappers don't; their head operator does)
    def outRows(p: SparkPlan): Long =
      p.collectFirst {
        case n if n.metrics.contains("numOutputRows") =>
          n.metrics("numOutputRows").value
      }.getOrElse(-1L)
    def buildRows(p: SparkPlan): Long =
      p.collectFirst {
        case b: BroadcastExchangeExec => metricOf(b, "numOutputRows")
        case r: ReusedExchangeExec => metricOf(r.child, "numOutputRows")
      }.getOrElse(outRows(p))

    val roots = qe.executedPlan +: qe.executedPlan.subqueriesAll
    val hazards = roots.flatMap { root =>
      root.collect {
        case e: ShuffleExchangeExec
            if e.outputPartitioning == SinglePartition =>
          // records WRITTEN to this exchange is the exact funnel input;
          // the child's numOutputRows over-reports it (rows counted
          // before a local limit, or accumulated across subtree
          // re-executions), so it is only the absent-metric fallback
          val w = metricOf(e, "shuffleRecordsWritten")
          val rows = if (w >= 0) w else outRows(e.child)
          if (rows > singlePartBound || rows < 0)
            Some(Hazard("single-partition-exchange", rows,
              s"into ${e.child.nodeName}"))
          else None
        case c: CartesianProductExec =>
          val l = outRows(c.left); val r = outRows(c.right)
          val mn = math.min(l, r)
          if (mn > loopBound || mn < 0)
            Some(Hazard("cartesian-product", mn, s"left=$l right=$r"))
          else None
        case j: BroadcastNestedLoopJoinExec =>
          val side = j.buildSide match {
            case BuildLeft => j.left
            case BuildRight => j.right
          }
          val b = buildRows(side)
          if (b > loopBound || b < 0)
            Some(Hazard("nested-loop-broadcast", b,
              s"build=${j.buildSide} ${j.joinType}"))
          else None
      }.flatten
    }
    (hazards, execSec)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = graft.core.GraftSession.local(appName = "graft-plan-audit")
    // static audit: with AQE on, un-executed plans are AdaptiveSparkPlan
    // shells whose codegen wrapping only appears as stages run
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(f"${"query"}%-22s shuffles bcasts codegen pushed")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        val shuffles = "Exchange hashpartitioning|Exchange rangepartitioning|Exchange SinglePartition"
          .r.findAllIn(plan).size
        val bcasts = "BroadcastExchange".r.findAllIn(plan).size
        // whole-stage-codegen spans print as "*(n)" node prefixes
        val codegen = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan)
          .map(_.group(1)).toSet.size
        val pushed = plan.contains("PushedFilters: [") &&
          !plan.contains("PushedFilters: []")
        println(f"$name%-22s $shuffles%8d $bcasts%6d $codegen%7d $pushed%6s")
      } catch {
        case e: Throwable =>
          println(f"$name%-22s ERROR ${e.getMessage.take(60)}")
      }
    }
    spark.stop()
  }
}

/** Shared driver for the allowlisted catalog sweeps (FunnelAudit /
  * ScaleAudit): runs `sweep` over every query, prints each flag, and
  * gates — exit 1 on any UNEXPECTED flag, and ALSO on any STALE
  * allowlist entry (an allowlisted query that no longer flags would
  * otherwise keep its exemption forever, silently masking a future
  * regression of that query — the same allowlist-can-only-shrink
  * honesty rule FunnelSpec/ScaleGateSpec assert in CI). `allowCsv`
  * semantics: absent → report-only (ad-hoc runs); `-` → gate with an
  * EMPTY allowlist (any flag fails); otherwise gate with the named
  * exemptions. */
private[graft] object AllowlistedSweep {

  /** Warm-up set shared by every timed/measured sweep: one scan +
    * shuffle + window + array/HOF codegen first-touch apiece, so JIT/
    * codegen cost is never billed to whichever query runs first (the
    * Bench rule). One list — a divergent copy per sweep would let a
    * warm-up fix silently miss the path preflight actually gates on. */
  val WarmupQueries = Seq("e6_running_sum", "d6_group_sum", "h2_array_parse")

  /** SPARK_GRAFT_ONLY-filtered catalog selection plus the unmissable
    * partial-sweep banner — a stale filter left exported in a shell
    * would silently turn a gating sweep into a near-empty pass, so
    * every sweep that honors the variable announces it the same way. */
  def selectWithBanner()
  : Seq[(String, (SparkSession, String) => org.apache.spark.sql.DataFrame)] = {
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
    only.foreach { o =>
      println(s"### PARTIAL SWEEP (SPARK_GRAFT_ONLY=${
        o.toSeq.sorted.mkString(",")}): ${selected.size}/${
        SparkEntry.queries.size} queries — NOT a full-catalog gate ###")
    }
    selected
  }

  /** The stale-allowlist honesty rule, shared verbatim by every gating
    * sweep: an entry is stale iff it was allowlisted, RAN, did not
    * flag, and did not ERROR (a query that threw tells us nothing
    * about its flag status — "remove the exemption" would be wrong
    * advice). Prints each entry with `prefix` ("" or "TAG ") and
    * returns them. */
  def staleEntries(prefix: String, allowed: Set[String],
                   ran: Set[String], flagged: collection.Set[String],
                   errored: collection.Set[String]): Seq[String] = {
    val stale = ((allowed & ran) -- flagged -- errored).toSeq.sorted
    stale.foreach(n => println(
      s"STALE-ALLOWLIST $prefix$n no longer flags — remove it from the " +
        "allowlist (a stale exemption masks future regressions)"))
    stale
  }

  def run(tag: String, allowArg: Option[String],
          sweep: (SparkSession, String) => Seq[String],
          appName: String): Unit = {
    val gating = allowArg.isDefined
    val allowed = allowArg
      .map(_.split(',').map(_.trim).filter(a => a.nonEmpty && a != "-")
        .toSet)
      .getOrElse(Set.empty[String])
    val spark = graft.core.GraftSession.local(appName = appName)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    var flagged = 0
    var unexpected = 0
    val flaggedNames = scala.collection.mutable.Set.empty[String]
    val erroredNames = scala.collection.mutable.Set.empty[String]
    // SPARK_GRAFT_ONLY (same contract as Verify): comma-separated query
    // names for a fast partial sweep while iterating. The stale-allowlist
    // honesty check below is restricted to the filtered set — an
    // allowlisted query that wasn't RUN can't be called stale.
    val selected = selectWithBanner()
    selected.foreach { case (name, _) =>
      try {
        // per-query owner scope: the sweep constructs (and often
        // executes) the query, so its GlobalRank layouts free here at
        // the boundary without touching any other owner's
        graft.operators.GlobalRank.withScope {
          sweep(spark, name)
        }.foreach { detail =>
          flagged += 1
          flaggedNames += name
          if (!allowed(name)) unexpected += 1
          println(s"$tag $name $detail")
        }
      } catch {
        case e: Throwable =>
          unexpected += 1
          erroredNames += name
          println(s"ERROR $name ${String.valueOf(e.getMessage).take(100)}")
      }
    }
    val ranNames = selected.map(_._1).toSet
    val stale = staleEntries("", allowed, ranNames,
      flaggedNames, erroredNames)
    println(s"flagged: $flagged (unexpected: $unexpected, " +
      s"stale allowlist: ${stale.size}, " +
      s"ran: ${selected.size}/${SparkEntry.queries.size})")
    spark.stop()
    if (gating && (unexpected > 0 || stale.nonEmpty)) sys.exit(1)
  }
}

/** Catalog-wide measured window-funnel sweep. FunnelSpec runs the same
  * check as the CI gate at sf0.001; preflight ALSO runs this main at
  * sf0.01, where a corpus-growing funnel separates cleanly from a
  * domain/span-bounded frame (round 9: the sf0.01 sweep caught
  * e4/e12/e14 — 3/5/7-group windows over the 15 000-row orders table —
  * which hid under the sf0.001 bound at 1 500 rows).
  * `runMain graft.FunnelAudit [sfDir] [minGroups] [rowsPerGroup]
  * [allowCsv]` — with an allowlist (`-` = empty), exits 1 on any
  * unexpected flag OR stale allowlist entry, so the sweep gates shell
  * pipelines. */
object FunnelAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val minGroups = if (args.length > 1) args(1).toLong else 32L
    val rowsPerGroup = if (args.length > 2) args(2).toLong else 512L
    AllowlistedSweep.run("FUNNEL", args.lift(3),
      (spark, name) => PlanAudit.windowFunnels(
        SparkEntry.queries(name)(spark, sfDir), minGroups, rowsPerGroup)
        .map(_.describe),
      appName = "graft-funnel-audit")
  }
}

/** Catalog-wide measured scale-hazard sweep (ScaleGateSpec runs the
  * same check as a CI gate at sf0.001; preflight ALSO runs this main at
  * sf0.01 — round 9 proved fixture scale is the separating variable for
  * the funnel gate, and the same asymmetry argument applies here):
  * `runMain graft.ScaleAudit [sfDir] [singlePartBound] [loopBound]
  * [allowCsv]` — with an allowlist (`-` = empty), exits 1 on any
  * unexpected flag OR stale allowlist entry, so the sweep gates shell
  * pipelines (preflight). */
object ScaleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val singlePartBound = if (args.length > 1) args(1).toLong else 512L
    val loopBound = if (args.length > 2) args(2).toLong else 64L
    AllowlistedSweep.run("HAZARD", args.lift(3),
      (spark, name) => PlanAudit.scaleHazards(
        SparkEntry.queries(name)(spark, sfDir), singlePartBound, loopBound)
        .map(_.describe),
      appName = "graft-scale-audit")
  }
}

/** Cross-SF SCALING gate (round-9 directive 4): the two plan-shape
  * gates (FunnelSpec/ScaleGateSpec and their preflight sweeps) measure
  * SHAPE — a superlinear runtime expressed through a legitimately-shaped
  * plan (join fan-out on a skewed key is the classic) passes both. So
  * measure growth directly: run every query at `sfA` (default sf0.001)
  * and `sfB` (default sf0.01, 10× the data) in ONE JVM with the same
  * config as the hazard sweeps (AQE off — no runtime rescue flattering
  * the audit), record wall seconds, and flag ratio outliers.
  *
  * The gate needs a JIT/fixed-cost floor to be honest: at these
  * fixtures a healthy query's time is dominated by fixed planning/JIT
  * cost, so ratios on sub-second times are noise. A query is flagged
  * only when t_B > `floorSec` AND t_B / max(t_A, 0.05) > `ratioBound`
  * (data grew 10×, so >`ratioBound`≈10× wall growth through the fixed-
  * cost floor means the per-row cost itself grew — superlinear). A
  * first-measurement flag is re-timed once on both SFs (min of two —
  * the Bench stall discipline) before it counts, so one GC pause can't
  * fail preflight.
  *
  * `runMain graft.ScalingAudit [sfA] [sfB] [ratioBound] [floorSec]
  * [allowCsv]` — allowlist semantics as the other sweeps (`-` = gate
  * with none; stale entries fail). Results print per query; flags ride
  * [[AllowlistedSweep]]'s exit-code gate for preflight. */
object ScalingAudit {
  def main(args: Array[String]): Unit = {
    val sfA = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sfB = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val ratioBound = if (args.length > 2) args(2).toDouble else 10.0
    val floorSec = if (args.length > 3) args(3).toDouble else 2.0
    // clock-shape marker (construction + noop-sink materialization):
    // distinct from PreflightSweep's construction+execute_count, so
    // tools/scaling_baseline.py refuses to min-merge a spot-sweep log
    // from this main into a PreflightSweep-harvested baseline unless
    // told so explicitly
    println("TIMING_PROTOCOL construction+noop_sink")
    var warmed = false
    def timeOne(spark: SparkSession, name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      // per-run owner scope (nested inside AllowlistedSweep's per-query
      // scope): frees exactly this run's layouts
      graft.operators.GlobalRank.withScope {
        SparkEntry.queries(name)(spark, dir)
          .write.mode("overwrite").format("noop").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    AllowlistedSweep.run("SUPERLINEAR", args.lift(4), (spark, name) => {
      if (!warmed) {
        Seq(sfA, sfB).foreach { dir =>
          AllowlistedSweep.WarmupQueries
            .foreach(q => try timeOne(spark, q, dir)
            catch { case _: Throwable => () })
        }
        warmed = true
      }
      def measure(): (Double, Double) =
        (timeOne(spark, name, sfA), timeOne(spark, name, sfB))
      var (ta, tb) = measure()
      def ratio = tb / math.max(ta, 0.05)
      if (tb > floorSec && ratio > ratioBound) {
        // re-time both before flagging: min of two runs per SF
        val (ta2, tb2) = measure()
        ta = math.min(ta, ta2); tb = math.min(tb, tb2)
      }
      // every query's growth profile prints (not only flags): the sweep's
      // raw data is what argues a bound or an allowlist entry in SCALE.md
      println(f"TIMING $name tA=$ta%.3f tB=$tb%.3f ratio=${ratio}%.1f")
      if (tb > floorSec && ratio > ratioBound)
        Seq(f"tA=$ta%.2fs tB=$tb%.2fs ratio=${ratio}%.1fx " +
          f"(bound ${ratioBound}%.0fx above ${floorSec}%.1fs floor)")
      else Seq.empty
    }, appName = "graft-scaling-audit")
  }
}

/** ONE-JVM full-gate sweep (round-10 directive 8): the preflight gates
  * previously ran as three separate mains — FunnelAudit(sfB),
  * ScaleAudit(sfB), ScalingAudit(sfA, sfB) — paying three JVM/session
  * startups, three query-construction passes, and TWO full sf-B catalog
  * executions (the hazard sweep's and the timing gate's). This main
  * runs all three checks per query in one pass: timed construction +
  * execution at sfA (t_A), then ONE timed sf-B construction + execution
  * that populates the hazard metrics AND serves as t_B, then the
  * (untimed) window-funnel measurement on the SAME sf-B frame. Bounds
  * are the preflight constants (funnel 32/512, hazard 512/64, scaling
  * ratio 10 above a 2 s floor — the standalone mains keep flexible CLIs
  * for spot use); allowlists are per-check with AllowlistedSweep's
  * flag/stale/exit semantics (always gating). A first-measurement
  * scaling flag is re-timed on both SFs (min of two) before it counts.
  * Prints the same `TIMING name tA=… tB=… ratio=…` lines, so
  * tools/scaling_baseline.py harvests this sweep unchanged (timing
  * protocol: query construction + executedPlan.execute().count(), AQE
  * off — construction must stay inside the clock, see timedRun;
  * recorded in the baseline's protocol field).
  *
  * `runMain graft.PreflightSweep <sfA> <sfB> <funnelAllowCsv>
  * <hazardAllowCsv> <scalingAllowCsv> [noscaling]` (`-` = empty
  * allowlist; `noscaling` skips the cross-SF timing gate — the
  * filtered fast path). */
object PreflightSweep {
  def main(args: Array[String]): Unit = {
    import scala.collection.mutable
    val sfA = args(0); val sfB = args(1)
    def parse(a: String): Set[String] =
      a.split(',').map(_.trim).filter(x => x.nonEmpty && x != "-").toSet
    val allow = Map("FUNNEL" -> parse(args(2)), "HAZARD" -> parse(args(3)),
      "SUPERLINEAR" -> parse(args(4)))
    val doScaling = !args.lift(5).contains("noscaling")
    val (minGroups, rowsPerGroup) = (32L, 512L)
    val (singlePartBound, loopBound) = (512L, 64L)
    val (ratioBound, floorSec) = (10.0, 2.0)

    val spark =
      graft.core.GraftSession.local(appName = "graft-preflight-sweep")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.sparkContext.setLogLevel("WARN")
    // clock-shape marker: tools/scaling_baseline.py refuses to
    // min-merge logs whose markers mismatch (mixing an execution-only
    // log with construction-inclusive ones would silently drag
    // eager-construction queries' minima toward zero — the lr1-class
    // blindness round 11 fixed)
    if (doScaling) println("TIMING_PROTOCOL construction+execute_count")

    val selected = AllowlistedSweep.selectWithBanner()

    // Construction is INSIDE the clock — the protocol of the
    // ScalingAudit.timeOne this sweep replaced. Eager-construction
    // queries (trainer collect loops, graph/dedup localCheckpoint
    // chains) do their dominant, SF-dependent work while the frame is
    // BUILT; a clock that starts at execute() reads them near-zero and
    // the superlinear gate goes blind to the entire class (lr1's
    // 3-step training loop "measured" 0.015 s that way in the first
    // harvest). Returns the constructed frame so the funnel check
    // reuses it instead of paying construction a second time.
    def timedRun(name: String, dir: String)
    : (org.apache.spark.sql.DataFrame, Seq[PlanAudit.Hazard], Double) = {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, dir)
      val constructSec = (System.nanoTime() - t0) / 1e9
      val (haz, execSec) =
        PlanAudit.scaleHazardsTimed(df, singlePartBound, loopBound)
      (df, haz, constructSec + execSec)
    }

    // warm-up (the Bench/ScalingAudit rule): first-touch JIT/codegen
    // cost must not be billed to whichever query runs first. sfA frames
    // are only ever timed on the scaling path — in noscaling mode the
    // sfA warm-up would feed nothing, so skip it.
    val warmDirs = if (doScaling) Seq(sfA, sfB) else Seq(sfB)
    warmDirs.foreach { dir =>
      AllowlistedSweep.WarmupQueries.foreach { q =>
        try graft.operators.GlobalRank.withScope(timedRun(q, dir))
        catch { case _: Throwable => () }
      }
    }

    var flagged = 0
    var unexpected = 0
    val flaggedBy = Map("FUNNEL" -> mutable.Set.empty[String],
      "HAZARD" -> mutable.Set.empty[String],
      "SUPERLINEAR" -> mutable.Set.empty[String])
    val erroredNames = mutable.Set.empty[String]
    def flag(tag: String, name: String, detail: String): Unit = {
      flagged += 1
      flaggedBy(tag) += name
      if (!allow(tag)(name)) unexpected += 1
      println(s"$tag $name $detail")
    }

    selected.foreach { case (name, _) =>
      try graft.operators.GlobalRank.withScope {
        val tA = if (doScaling) timedRun(name, sfA)._3 else 0.0
        // ONE sf-B construction + execution: hazard metrics + t_B +
        // the funnel check's frame
        val (dfB, hazB, tB) = timedRun(name, sfB)
        hazB.foreach(h => flag("HAZARD", name, h.describe))
        if (doScaling) {
          var ta = tA; var tb = tB
          def ratio = tb / math.max(ta, 0.05)
          if (tb > floorSec && ratio > ratioBound) {
            // re-time both before flagging: min of two runs per SF
            val ta2 = timedRun(name, sfA)._3
            val tb2 = timedRun(name, sfB)._3
            ta = math.min(ta, ta2); tb = math.min(tb, tb2)
          }
          println(f"TIMING $name tA=$ta%.3f tB=$tb%.3f ratio=${ratio}%.1f")
          if (tb > floorSec && ratio > ratioBound)
            flag("SUPERLINEAR", name,
              f"tA=$ta%.2fs tB=$tb%.2fs ratio=${ratio}%.1fx " +
                f"(bound ${ratioBound}%.0fx above ${floorSec}%.1fs floor)")
        }
        // funnel measurement on the SAME sf-B frame (its GlobalRank
        // layouts stay live until this scope closes; windowFunnels
        // executes per-window counting queries; deliberately untimed) —
        // re-constructing here would pay the whole eager chain again
        PlanAudit.windowFunnels(dfB, minGroups, rowsPerGroup)
          .foreach(s => flag("FUNNEL", name, s.describe))
      } catch {
        case e: Throwable =>
          unexpected += 1
          erroredNames += name
          println(s"ERROR $name ${String.valueOf(e.getMessage).take(100)}")
      }
    }

    val ranNames = selected.map(_._1).toSet
    val checks = if (doScaling) allow.keys.toSeq.sorted
                 else Seq("FUNNEL", "HAZARD")
    val stale = checks.flatMap { tag =>
      AllowlistedSweep.staleEntries(s"$tag ", allow(tag), ranNames,
        flaggedBy(tag), erroredNames).map(tag -> _)
    }
    println(s"flagged: $flagged (unexpected: $unexpected, " +
      s"stale allowlist: ${stale.size}, " +
      s"ran: ${selected.size}/${SparkEntry.queries.size})")
    spark.stop()
    if (unexpected > 0 || stale.nonEmpty) sys.exit(1)
  }
}

/** Execute one query (AQE off) and print every exchange / nested-loop
  * node with its measured SQL metrics — the drill-down companion to
  * ScaleAudit: `runMain graft.HazardShow <name> [sfDir]`. */
object HazardShow {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.GraftSession.local(appName = "graft-hazard-show")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val qe = SparkEntry.queries(name)(spark, sfDir).queryExecution
    qe.executedPlan.execute().count()
    def fmt(p: org.apache.spark.sql.execution.SparkPlan): String =
      p.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(" ")
    (qe.executedPlan +: qe.executedPlan.subqueriesAll).foreach {
      _.foreach {
        case e: ShuffleExchangeExec =>
          println(s"SHUFFLE ${e.outputPartitioning} <- ${e.child.nodeName}: ${fmt(e)}")
        case b: BroadcastExchangeExec =>
          println(s"BCAST <- ${b.child.nodeName}: ${fmt(b)}")
        case j: BroadcastNestedLoopJoinExec =>
          println(s"BNLJ ${j.buildSide} ${j.joinType}")
        case c: CartesianProductExec =>
          println(s"CARTESIAN")
        case _ => ()
      }
    }
    println(qe.executedPlan.toString.take(8000))
    spark.stop()
  }
}

/** Print one query's full executed plan: `runMain graft.PlanShow <name> [sfDir]`. */
object PlanShow {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = graft.core.GraftSession.local(appName = "graft-plan-show")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    println(SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
