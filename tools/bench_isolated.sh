#!/usr/bin/env bash
# Publish ISOLATED bench minima as a machine-readable artifact
# (round-9 directive 5): the contention-band triage — "does a driver-run
# mover reproduce in a fresh JVM?" — previously lived as SCALE.md prose,
# so every round re-argued ±7% shared-machine noise by hand. This script
# runs each selected query in its OWN fresh JVM and records the
# converged warm minimum in BENCH_ISOLATED.json for the next round's
# mover analysis to diff against.
#
# Round-12 protocol (round-11 directive 2): runs are ADAPTIVE — BenchOne
# drops run 1 (JIT/codegen warm-up) and keeps running until the latest
# run is within 15% of the running warm minimum (>=2 warm runs, cap
# $RUNS) — a fixed 3-run protocol floored ev14 at 1.39 s when its
# converged floor is 0.60 s, a 2.3x artifact.
#
# Selection ($2): `topN` (the N slowest from BENCH_DETAIL.json), or
# `thr:SEC` (every query whose catalog time exceeds SEC — the round-11
# directive-1 seeding mode that retires the weak prev-catalog fallback).
# $3 adds extra comma-separated queries either way.
#
# Merge semantics: confirmed floors are the best EVER observed for
# unchanged code, so the writer MIN-merges with the existing artifact's
# minima_sec. Queries whose SEMANTICS changed this round must reset —
# list them in $BENCH_ISOLATED_RESET (csv): their old floors are
# dropped and the fresh measurement stands alone. A fresh CONVERGED
# measurement clears any provisional_sec entry for its query (this run
# IS the re-confirmation); a regressed_sec entry clears only when the
# converged fresh time is back within the triage regression bound of
# the floor — otherwise the entry is refreshed with the new evidence
# (the regression is still live).
#
# Usage: [BENCH_ISOLATED_RESET=q1,q2] \
#        tools/bench_isolated.sh [sfDir] [topN|thr:SEC] [extraCsv] [out]
set -euo pipefail
cd "$(dirname "$0")/.."

SF="${1:-/root/testdata/sf0.1}"
SELECT="${2:-20}"
EXTRA="${3:-}"
OUT="${4:-BENCH_ISOLATED.json}"
RUNS=8

QUERIES=$(python3 - "$SELECT" "$EXTRA" <<'EOF'
import json, sys
select, extra = sys.argv[1], sys.argv[2]
detail = json.load(open("BENCH_DETAIL.json"))
ranked = sorted(detail["queries"].items(), key=lambda kv: -kv[1])
if select.startswith("thr:"):
    thr = float(select[4:])
    names = [k for k, v in ranked if v > thr]
else:
    names = [k for k, _ in ranked[:int(select)]]
for e in filter(None, extra.split(",")):
    if e not in names:
        names.append(e)
print(" ".join(names))
EOF
)

echo "== bench_isolated: $(echo $QUERIES | wc -w) queries, adaptive runs (cap $RUNS), fresh JVM per query =="
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
  MIN=$(echo "$LINE" | sed 's/.*min=\([0-9.]*\).*/\1/')
  CONV=$(echo "$LINE" | sed -n 's/.*converged=\([a-z]*\).*/\1/p')
  NRUNS=$(echo "$LINE" | sed -n 's/.*runs=\([0-9]*\).*/\1/p')
  echo "$q $MIN ${CONV:-true} ${NRUNS:-0}" >> "$TMP"
done

python3 - "$TMP" "$SF" "$RUNS" "$OUT" <<'EOF'
import json, os, subprocess, sys
tmp, sf, runs, out = sys.argv[1:5]
fresh = {}
with open(tmp) as f:
    for line in f:
        name, sec, conv, nruns = line.split()
        fresh[name] = (float(sec), conv == "true", int(nruns))
reset = set(filter(None,
    os.environ.get("BENCH_ISOLATED_RESET", "").split(",")))
head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                      capture_output=True, text=True).stdout.strip()
try:
    old = json.load(open(out))
except FileNotFoundError:
    old = {}
# scale-factor guard: floors are monotone-min, so min-merging a run
# measured at a different (smaller) SF would permanently corrupt the
# committed floors with ~10x-faster times — refuse instead
if old.get("sf") and old["sf"] != sf:
    raise SystemExit(
        f"{out} records sf={old['sf']} but this run measured {sf} — "
        "refusing to min-merge floors across scale factors; write to a "
        "different --out (or delete the artifact to rebase it)")
minima = dict(old.get("minima_sec", {}))
provisional = dict(old.get("provisional_sec", {}))
regressed = dict(old.get("regressed_sec", {}))
refreshed_at = dict(old.get("refreshed_at", {}))
capped = sorted(q for q, (_, c, _n) in fresh.items() if not c)
# a pending regression is CLEARED only when a converged fresh run is
# back inside the regression bound of the trusted floor (the triage
# default --ratio); a converged run that is still far above the floor
# means the regression persists — min-merge keeps the old floor, so
# silently popping would discard the stashed evidence while the
# slowdown is still live (round-12 advice)
TRIAGE_RATIO = 1.5
for q, (v, conv, nruns) in fresh.items():
    if not conv:
        # a cap-out is NOT a confirmation: park it as provisional (the
        # next converged run or triage pass judges it) and leave any
        # pending regressed_sec signal alone
        provisional[q] = round(v, 3)
        continue
    prior = None if q in reset else minima.get(q)
    new = round(v if prior is None else min(v, prior), 3)
    if minima.get(q) != new:
        refreshed_at[q] = head
    minima[q] = new
    provisional.pop(q, None)  # a fresh converged run IS a confirmation
    if q in regressed:
        if v <= minima[q] * TRIAGE_RATIO:
            regressed.pop(q)  # converged back at the floor: healed
        else:
            regressed[q] = {"sec": round(v, 3), "commit": head,
                            "runs": nruns or None}
if capped:
    print(f"warning: {len(capped)} queries hit the run cap without "
          f"converging — recorded as provisional, not floors: {capped}")
doc = {
    "sf": sf,
    "protocol": "fresh JVM per query; adaptive warm runs (run 1 "
                "dropped; converge when the latest warm run is within "
                "the 15% band around the MINIMUM OF THE EARLIER warm "
                "runs — both sides, so a still-falling floor keeps "
                f"running; >=2 warm runs, cap {runs}); min over warm "
                "runs; min-merged with prior floors except "
                "explicitly-reset queries; covers the full catalog "
                "since round 13",
    "commit": head,
    "minima_sec": dict(sorted(minima.items(), key=lambda kv: -kv[1])),
}
if provisional:
    doc["provisional_sec"] = dict(sorted(provisional.items()))
if regressed:
    doc["regressed_sec"] = dict(sorted(regressed.items()))
if refreshed_at:
    doc["refreshed_at"] = refreshed_at
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: {len(fresh)} measured this run, "
      f"{len(minima)} floors total"
      + (f" (reset: {sorted(reset & set(fresh))})" if reset else ""))
EOF
rm -f "$TMP"
