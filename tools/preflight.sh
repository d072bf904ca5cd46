#!/usr/bin/env bash
# Round-exit gate: run before EVERY end-of-round (or milestone) commit.
#
# Round 4 shipped a snapshot that did not compile — one undefined val zeroed
# the driver's entire correctness+bench signal for the round. This script
# makes that impossible to repeat: it refuses success unless the tree
# compiles, every ScalaTest passes, and the full sf0.01 DuckDB oracle
# differential is green.
#
# Usage:
#   tools/preflight.sh                 # full gate (compile + test + oracle)
#   tools/preflight.sh q1_agg,q2_x     # gate, with Verify/oracle filtered to
#                                      # the named queries (faster iteration;
#                                      # still compiles + runs all ScalaTests)
set -euo pipefail
cd "$(dirname "$0")/.."

ONLY="${1:-}"
OUT=/tmp/preflight_verify
SF=/root/testdata/sf0.01

echo "== preflight: compile + test (incl. measured scale gates) =="
# `sbt test` includes the two MEASURED plan gates at sf0.001:
#  - FunnelSpec: every logical window in every catalog query, flagged
#    when a corpus-sized frame funnels through a low-cardinality key;
#  - ScaleGateSpec: every query EXECUTED once, flagged on measured
#    single-partition exchanges / cartesian products / oversized
#    nested-loop broadcast sides.
sbt -batch compile test

echo "== preflight: sf0.01 funnel sweep (the scale that separates) =="
# Round-9 lesson: a 3-7-group window over the 1 500-row sf0.001 orders
# table hides under groups×512, but at sf0.01 (15 000 rows) it flags
# unambiguously while domain/span-bounded frames (202-row score sweeps,
# day-pair tables) stay constant — so the sf0.01 sweep separates
# corpus-growing funnels from bounded frames with zero false positives.
# This caught e4/e12/e14 in round 9 after the sf0.001 gate passed them.
# Allowlist: ev26's day-grain sweep shard (span-keyed by design; its
# scaladoc documents the hour-grain drop at corpus scale). The main
# exits 1 on any other flag.
sbt -batch "runMain graft.FunnelAudit /root/testdata/sf0.01 32 512 ev26_peak_concurrency"

echo "== preflight: Verify -> DuckDB differential (sf0.01) =="
rm -rf "$OUT"
VLOG=/tmp/preflight_verify.log
# Exported (not per-command) so check_oracle.py also sees it: since round 6
# it treats a missing output dir in an UNfiltered run as a hard FAIL.
if [ -n "$ONLY" ]; then
  export SPARK_GRAFT_ONLY="$ONLY"
fi
sbt -batch "runMain graft.Verify $SF $OUT" 2>&1 | tee "$VLOG"
# A query that THROWS inside Verify writes no output dir, and the filtered
# oracle check would silently skip it (this bit once: ts5's ambiguous
# self-join error "passed" a filtered gate). Fail hard on any verify error.
if grep -q "\[verify\].*failed" "$VLOG"; then
  echo "== preflight: FAIL — Verify reported query errors:" >&2
  grep "\[verify\].*failed" "$VLOG" >&2
  exit 1
fi
python3 tools/check_oracle.py "$SF" "$OUT"

echo "== preflight: PASS — safe to commit =="
