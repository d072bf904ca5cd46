#!/usr/bin/env python3
"""Mechanize the round-exit bench-mover triage (round-10 directive).

The established rule (SCALE.md, applied by hand in rounds 8-10): a
driver-run per-query delta only matters if it REPRODUCES in a fresh JVM
— in-catalog deltas under ~1.5x carry no information (shared-host
contention bands of 0.63x-1.56x were measured while totals agreed to
1%), and the single-JVM catalog session amortizes JIT/codegen that an
isolated run repays. This script applies the rule end to end:

 1. diff two per-query maps (current vs previous round), flagging only
    common-set slowdowns > --ratio with base > --base seconds;
 2. re-run each flagged query in its own fresh JVM (graft.BenchOne via
    tools/run_main.sh, min over warm runs);
 3. verdict against BENCH_ISOLATED.json's recorded minimum: a mover
    whose fresh-JVM minimum sits at-band vs the isolated baseline is
    NOT-REPRODUCED (the dd13 lucky-min pattern); only a fresh-JVM
    minimum that itself grew > --ratio counts as REGRESSION;
 4. refresh BENCH_ISOLATED.json's entries for the flagged queries with
    the new fresh-JVM minima (artifact tracks current code), and emit
    the markdown table SCALE.md's mover section used to hand-write.

Inputs CUR and PREV are each one of:
  - a BENCH_DETAIL-style file ({"queries": {name: sec}}),
  - a driver BENCH_r{N}.json (auto-detected via its "parsed" wrapper;
    NOTE: its query dict is budget-capped to the slowest ~60 — prefer
    the full detail file when available),
  - git:REV[:PATH] — read PATH (default BENCH_DETAIL.json) from a git
    revision, e.g. git:HEAD~1 for the previous round's committed detail.

Usage:
  tools/triage_movers.py CUR PREV [--ratio 1.5] [--base 1.0]
      [--sf /root/testdata/sf0.1] [--runs 3] [--no-rerun]
      [--isolated BENCH_ISOLATED.json]

Exit code: 0 when no flagged mover is a reproduced regression, 1
otherwise (so a shell pipeline can gate on it).
"""
import argparse
import json
import os
import re
import subprocess
import sys

# repo-root cwd like the sibling tools (relative tools/run_main.sh,
# git show, and the BENCH_ISOLATED.json default all assume it)
os.chdir(os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def load_map(spec):
    """Return (label, {query: seconds}) for a CUR/PREV spec."""
    if spec.startswith("git:"):
        parts = spec.split(":", 2)
        rev, path = parts[1], (parts[2] if len(parts) > 2 else "BENCH_DETAIL.json")
        raw = subprocess.run(["git", "show", f"{rev}:{path}"],
                             capture_output=True, text=True, check=True).stdout
        doc = json.loads(raw)
        label = f"{path}@{rev}"
    else:
        doc = json.load(open(spec))
        label = spec
    if "parsed" in doc:  # driver BENCH_r{N}.json wrapper
        doc = doc["parsed"]
        print(f"note: {label} is a driver round file — its query dict is "
              "budget-capped to the slowest entries; deltas for fast "
              "queries are invisible here", file=sys.stderr)
    return label, {k: float(v) for k, v in doc["queries"].items()}


def bench_one(query, sf, runs):
    """Fresh-JVM isolated minimum via graft.BenchOne; None on failure."""
    r = subprocess.run(["tools/run_main.sh", "graft.BenchOne", sf, query,
                        str(runs)], capture_output=True, text=True)
    if "STALE" in (r.stderr or "").upper():
        sys.exit("stale bytecode — run 'sbt compile' first "
                 "(refusing to time the wrong classes)")
    m = re.search(rf"\[benchone\] {re.escape(query)} .*min=([\d.]+)", r.stdout)
    return float(m.group(1)) if m else None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cur")
    ap.add_argument("prev")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--base", type=float, default=1.0)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--isolated", default="BENCH_ISOLATED.json")
    ap.add_argument("--no-rerun", action="store_true",
                    help="flag only; skip the fresh-JVM re-isolation "
                         "(every flag reports UNTRIAGED)")
    args = ap.parse_args()

    cur_label, cur = load_map(args.cur)
    prev_label, prev = load_map(args.prev)
    common = sorted(set(cur) & set(prev))
    try:
        iso = json.load(open(args.isolated))
    except FileNotFoundError:
        # seed the provenance fields a fresh artifact must carry (the
        # committed file records them; a refresh-created one must too)
        iso = {"sf": args.sf, "runs_per_query": args.runs,
               "protocol": "fresh JVM per query; min over warm runs "
                           "(run 1 dropped)",
               "commit": subprocess.run(
                   ["git", "rev-parse", "--short", "HEAD"],
                   capture_output=True, text=True).stdout.strip(),
               "minima_sec": {}}
    iso_min = iso.get("minima_sec", {})

    # base-gate on max(prev, cur): gating on prev alone would hide a
    # regression that GROWS a sub-base query past the base (prev 0.9s ->
    # cur 9s reads prev<=base, never flagged); the intent is only to
    # ignore small-ABSOLUTE deltas, which max() preserves symmetrically
    # for the gains list
    movers = [(q, prev[q], cur[q], cur[q] / prev[q]) for q in common
              if max(prev[q], cur[q]) > args.base
              and cur[q] / prev[q] > args.ratio]
    movers.sort(key=lambda t: -t[3])
    gains = sorted(((q, prev[q], cur[q], cur[q] / prev[q]) for q in common
                    if max(prev[q], cur[q]) > args.base
                    and cur[q] / prev[q] < 1 / args.ratio),
                   key=lambda t: t[3])

    print(f"triage: {len(common)} common queries "
          f"({cur_label} vs {prev_label}), rule: ratio>{args.ratio} "
          f"with base>{args.base}s; {len(movers)} flagged, "
          f"{len(gains)} improved past the same band\n")

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    rows, regressions, refreshed = [], 0, {}
    for q, p, c, r in movers:
        iso_base = iso_min.get(q)
        if args.no_rerun:
            rows.append((q, p, c, r, iso_base, None, "UNTRIAGED (--no-rerun)"))
            continue
        fresh = bench_one(q, args.sf, args.runs)
        if fresh is None:
            rows.append((q, p, c, r, iso_base, None, "ERROR (BenchOne failed)"))
            regressions += 1
            continue
        # the isolated baseline is the reference when it exists; the
        # previous driver number is the (weaker) fallback — the fresh-JVM
        # protocol runs ~1.3-1.8x the in-catalog numbers, so a
        # prev-catalog comparison must absorb that inflation or a
        # healthy query with no isolated entry reads as REGRESSION at
        # 1.6x purely from protocol (measured band, SCALE.md)
        PROTOCOL_INFLATION = 1.8
        if iso_base is not None:
            ref, ref_kind, bound = iso_base, "iso", args.ratio
        else:
            ref, ref_kind = p, "prev-catalog"
            bound = args.ratio * PROTOCOL_INFLATION
        rr = fresh / ref
        if rr > bound:
            verdict = (f"REGRESSION (fresh {fresh:.2f}s = {rr:.2f}x "
                       f"{ref_kind} {ref:.2f}s)")
            regressions += 1
            # reproduced: the code's floor really moved — overwrite
            refreshed[q] = fresh
        elif ref_kind == "prev-catalog" and rr > args.ratio:
            # inside the inflation allowance a real regression up to
            # ~(bound/ratio)x is indistinguishable from protocol
            # inflation — say so instead of overclaiming NOT-REPRODUCED;
            # the seeded floor below makes the NEXT triage protocol-clean
            verdict = (f"UNCONFIRMED (fresh {fresh:.2f}s = {rr:.2f}x "
                       f"prev-catalog {ref:.2f}s — within the 1.3-1.8x "
                       "fresh-JVM protocol-inflation band; no isolated "
                       "baseline to separate inflation from code. Floor "
                       "seeded; next triage judges at the iso bound)")
            refreshed[q] = fresh
        else:
            verdict = (f"NOT-REPRODUCED (fresh {fresh:.2f}s vs "
                       f"{ref_kind} {ref:.2f}s = {rr:.2f}x — "
                       "contention/lucky-min, not code)")
            # not reproduced = code unchanged: the floor is the best
            # EVER observed — min with the recorded baseline, or a
            # contention-era re-run drifts the reference upward and
            # future regressions hide under the softened floor
            refreshed[q] = (min(fresh, iso_base) if iso_base is not None
                            else fresh)
        rows.append((q, p, c, r, iso_base, fresh, verdict))

    print("| query | prev s | cur s | driver ratio | iso base s | "
          "fresh min s | verdict |")
    print("|---|---|---|---|---|---|---|")
    for q, p, c, r, ib, f, v in rows:
        print(f"| {q} | {p:.2f} | {c:.2f} | {r:.2f}x | "
              f"{'-' if ib is None else f'{ib:.2f}'} | "
              f"{'-' if f is None else f'{f:.2f}'} | {v} |")
    if not rows:
        print("| (none flagged) | | | | | | |")
    if gains:
        print("\nimprovements past the same band (informational): "
              + ", ".join(f"{q} {p:.2f}->{c:.2f}s ({r:.2f}x)"
                          for q, p, c, r in gains))

    # stamp only entries whose STORED value actually changed — stamping
    # a monotone-min no-op would claim the floor was measured at a
    # commit it was not
    changed = {q: round(v, 3) for q, v in refreshed.items()
               if round(v, 3) != iso_min.get(q)}
    if changed:
        iso_min.update(changed)
        iso["minima_sec"] = dict(sorted(iso_min.items(), key=lambda kv: -kv[1]))
        iso.setdefault("refreshed_at", {}).update(
            {q: head for q in changed})
        json.dump(iso, open(args.isolated, "w"), indent=1)
        print(f"\nrefreshed {args.isolated}: "
              f"{sorted(changed)} at commit {head}")

    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
