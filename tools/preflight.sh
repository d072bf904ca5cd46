#!/usr/bin/env bash
# Round-exit gate: run before EVERY end-of-round (or milestone) commit.
#
# Round 4 shipped a snapshot that did not compile — one undefined val zeroed
# the driver's entire correctness+bench signal for the round. This script
# makes that impossible to repeat: it refuses success unless the tree
# compiles, every ScalaTest passes, the measured sf0.01 sweeps are clean,
# and the full sf0.01 + edge-fixture DuckDB oracle differentials are green.
#
# Usage:
#   tools/preflight.sh                 # full gate (compile + test + sweeps
#                                      # + oracle + edge fixture)
#   tools/preflight.sh q1_agg,q2_x     # gate, with Verify/oracle filtered to
#                                      # the named queries (faster iteration;
#                                      # still compiles + runs all ScalaTests
#                                      # + both sf0.01 shape sweeps; the
#                                      # cross-SF timing gate and the edge-
#                                      # fixture sweep run only in the FULL
#                                      # gate — run it before the milestone
#                                      # commit)
set -euo pipefail
cd "$(dirname "$0")/.."

ONLY="${1:-}"
OUT=/tmp/preflight_verify
SF=/root/testdata/sf0.01

# A stale SPARK_GRAFT_ONLY exported in the calling shell would silently
# restrict the gating sweeps AND the oracle differential to a near-empty
# set (exit 0, "flagged: 0") — the full gate must never inherit it.
if [ -z "$ONLY" ]; then
  unset SPARK_GRAFT_ONLY
fi

echo "== preflight: compile + test (incl. measured scale gates) =="
# `sbt test` includes the two MEASURED plan gates at sf0.001:
#  - FunnelSpec: every logical window in every catalog query, flagged
#    when a corpus-sized frame funnels through a low-cardinality key;
#  - ScaleGateSpec: every query EXECUTED once, flagged on measured
#    single-partition exchanges / cartesian products / oversized
#    nested-loop broadcast sides.
sbt -batch compile test

# The audit mains below run in plain fresh JVMs (tools/run_main.sh) against
# the classes sbt just compiled — same JVM options, no per-main sbt startup.

echo "== preflight: sf0.01 funnel sweep (the scale that separates) =="
# Round-9 lesson: a 3-7-group window over the 1 500-row sf0.001 orders
# table hides under groups×512, but at sf0.01 (15 000 rows) it flags
# unambiguously while domain/span-bounded frames (202-row score sweeps,
# day-pair tables) stay constant — so the sf0.01 sweep separates
# corpus-growing funnels from bounded frames with zero false positives.
# This caught e4/e12/e14 in round 9 after the sf0.001 gate passed them.
# Allowlist: ev26's day-grain sweep shard (span-keyed by design; its
# scaladoc documents the hour-grain drop at corpus scale). The main
# exits 1 on any other flag OR any stale allowlist entry.
tools/run_main.sh graft.FunnelAudit /root/testdata/sf0.01 32 512 \
  ev26_peak_concurrency

echo "== preflight: sf0.01 scale-hazard sweep (round-10: symmetric with the funnel sweep) =="
# Round 9 proved fixture scale is the separating variable for the funnel
# gate (e4/e12/e14 hid under sf0.001); the same asymmetry argument applies
# to the hazard sweep, so it gates at sf0.01 too. Every query EXECUTES
# once with AQE off; measured single-partition exchange inputs, cartesian
# sides, and nested-loop broadcast sides are checked against the same
# 512/64 bounds as ScaleGateSpec (the bounds are per-class row floors, not
# fixture-tuned: global-agg partials stay ≤ #partitions at any SF while
# corpus frames grow 10×, so the gap WIDENS at sf0.01). Allowlist: sim4's
# deliberate O(n²) exact all-pairs baseline (its contract; see
# ScaleGateSpec's audited map).
tools/run_main.sh graft.ScaleAudit /root/testdata/sf0.01 512 64 \
  sim4_neardup_exact

if [ -z "$ONLY" ]; then
  echo "== preflight: cross-SF scaling gate (superlinear runtime, shape gates can't see) =="
  # Round-9 directive 4: both shape gates pass a superlinear runtime
  # expressed through a legitimately-shaped plan (skewed-key join fan-out).
  # ScalingAudit times every query at sf0.001 AND sf0.01 (10× data) in one
  # JVM, AQE off, and flags t(sf0.01) > 2 s with >10× growth — above the
  # JIT/fixed-cost floor, 10× data driving >10× wall time means the
  # per-row cost itself grew. Flags are re-timed (min of two) before they
  # count, so one GC pause can't fail the gate. Empty allowlist: the
  # first sweep (round 10) flagged nothing.
  tools/run_main.sh graft.ScalingAudit \
    /root/testdata/sf0.001 /root/testdata/sf0.01 10 2.0 -
fi

echo "== preflight: Verify -> DuckDB differential (sf0.01) =="
rm -rf "$OUT"
VLOG=/tmp/preflight_verify.log
# Exported (not per-command) so check_oracle.py also sees it: since round 6
# it treats a missing output dir in an UNfiltered run as a hard FAIL.
if [ -n "$ONLY" ]; then
  export SPARK_GRAFT_ONLY="$ONLY"
fi
tools/run_main.sh graft.Verify "$SF" "$OUT" 2>&1 | tee "$VLOG"
# A query that THROWS inside Verify writes no output dir, and the filtered
# oracle check would silently skip it (this bit once: ts5's ambiguous
# self-join error "passed" a filtered gate). Fail hard on any verify error.
if grep -q "\[verify\].*failed" "$VLOG"; then
  echo "== preflight: FAIL — Verify reported query errors:" >&2
  grep "\[verify\].*failed" "$VLOG" >&2
  exit 1
fi
python3 tools/check_oracle.py "$SF" "$OUT"

if [ -z "$ONLY" ]; then
  echo "== preflight: edge-fixture divergence sweep (round-10: was manual since round 7) =="
  # Pathological inputs (empty/whitespace docs, zero vectors, equal-
  # timestamp ties, single-event users) expose silent engine divergences —
  # sequence() stepping down, div-vs-// truncation, ln(0) — that no SF
  # fixture reaches. The manual form of this sweep found 25 real
  # divergences in round 7; a new query skipping it would ship exactly the
  # ts5-class silent divergence. Full catalog, hard gate.
  EDGE_SF=/tmp/edge_sf
  EDGE_OUT=/tmp/edge_out
  ELOG=/tmp/preflight_edge.log
  rm -rf "$EDGE_SF" "$EDGE_OUT"
  python3 tools/make_edge_fixture.py /root/testdata/sf0.01 "$EDGE_SF"
  tools/run_main.sh graft.Verify "$EDGE_SF" "$EDGE_OUT" 2>&1 | tee "$ELOG"
  if grep -q "\[verify\].*failed" "$ELOG"; then
    echo "== preflight: FAIL — edge-fixture Verify reported query errors:" >&2
    grep "\[verify\].*failed" "$ELOG" >&2
    exit 1
  fi
  python3 tools/check_oracle.py "$EDGE_SF" "$EDGE_OUT"

  echo "== preflight: empty-fixture sweep (zero-row tables) =="
  # The --empty variant exercises the same guard paths at the limit input
  # (zero-row documents/events/embeddings). Its marginal catch rate since
  # round 8 has been zero, but the round-9 verdict's argument against
  # manual sweeps ("a new query skipping the sweep ships the silent
  # divergence") applies to it equally — so it gates too.
  EMPTY_SF=/tmp/empty_sf
  EMPTY_OUT=/tmp/empty_out
  MLOG=/tmp/preflight_empty.log
  rm -rf "$EMPTY_SF" "$EMPTY_OUT"
  python3 tools/make_edge_fixture.py --empty /root/testdata/sf0.01 "$EMPTY_SF"
  tools/run_main.sh graft.Verify "$EMPTY_SF" "$EMPTY_OUT" 2>&1 | tee "$MLOG"
  if grep -q "\[verify\].*failed" "$MLOG"; then
    echo "== preflight: FAIL — empty-fixture Verify reported query errors:" >&2
    grep "\[verify\].*failed" "$MLOG" >&2
    exit 1
  fi
  python3 tools/check_oracle.py "$EMPTY_SF" "$EMPTY_OUT"
fi

echo "== preflight: PASS — safe to commit =="
