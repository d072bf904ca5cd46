#!/usr/bin/env bash
# Publish ISOLATED bench minima as a machine-readable artifact
# (round-9 directive 5): the contention-band triage — "does a driver-run
# mover reproduce in a fresh JVM?" — previously lived as SCALE.md prose,
# so every round re-argued ±7% shared-machine noise by hand. This script
# runs each selected query in its OWN fresh JVM (min over 3 runs; run 1
# warms JIT/codegen and is dropped) and writes BENCH_ISOLATED.json for
# the next round's mover analysis to diff against.
#
# Selection: the top-N slowest queries from BENCH_DETAIL.json (the
# committed full per-query map from the last full bench) plus any extras
# passed as $3 — so flagged movers outside the top-N get isolated
# numbers too, the round-9 gap.
#
# Usage: tools/bench_isolated.sh [sfDir] [topN] [extraCsv] [out]
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
TOPN="${2:-20}"
EXTRA="${3:-}"
OUT="${4:-BENCH_ISOLATED.json}"
RUNS=3

QUERIES=$(python3 - "$TOPN" "$EXTRA" <<'EOF'
import json, sys
top_n, extra = int(sys.argv[1]), sys.argv[2]
detail = json.load(open("BENCH_DETAIL.json"))
ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
names = [k for k, _ in ranked[:top_n]]
for e in filter(None, extra.split(",")):
    if e not in names:
        names.append(e)
print(" ".join(names))
EOF
)

echo "== bench_isolated: $(echo $QUERIES | wc -w) queries, $RUNS runs each, fresh JVM per query =="
TMP=$(mktemp)
for q in $QUERIES; do
  # one fresh JVM per query (plain java via run_main.sh — no cross-query
  # JIT/GC/cache interference, and no 40 s sbt startup per query)
  # stderr carries Spark INFO noise, but ALSO run_main's stale-bytecode
  # warning — capture it and surface that warning instead of silently
  # timing the wrong code (the guard exists for exactly this script)
  ERRLOG=$(mktemp)
  LINE=$(tools/run_main.sh graft.BenchOne "$SF" "$q" "$RUNS" 2>"$ERRLOG" \
    | grep "\[benchone\] $q " || true)
  # fail HARD on stale bytecode: publishing timings from classes older
  # than the sources isn't a warning condition — it's the wrong artifact
  if grep -qi "STALE" "$ERRLOG"; then
    grep -i "STALE" "$ERRLOG" >&2 || true
    echo "FAILED $q (stale bytecode — run 'sbt compile' first)" >&2
    rm -f "$ERRLOG"
    exit 1
  fi
  rm -f "$ERRLOG"
  if [ -z "$LINE" ]; then
    echo "FAILED $q" >&2
    exit 1
  fi
  echo "$LINE"
  MIN=$(echo "$LINE" | sed 's/.*min=//')
  echo "$q $MIN" >> "$TMP"
done

python3 - "$TMP" "$SF" "$RUNS" "$OUT" <<'EOF'
import json, subprocess, sys
tmp, sf, runs, out = sys.argv[1:5]
minima = {}
with open(tmp) as f:
    for line in f:
        name, sec = line.split()
        minima[name] = float(sec)
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
doc = {
    "sf": sf,
    "runs_per_query": int(runs),
    "protocol": "fresh JVM per query; min over warm runs (run 1 dropped)",
    "commit": head,
    "minima_sec": dict(sorted(minima.items(), key=lambda kv: -kv[1])),
}
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: {len(minima)} queries")
EOF
rm -f "$TMP"
