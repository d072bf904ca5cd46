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
    tools/run_main.sh — ADAPTIVE warm runs until the floor converges,
    round-11 directive 2: a fixed 3-run protocol floored ev14 at 1.39 s
    when its converged floor is 0.60 s, a 2.3x artifact that printed a
    false REGRESSION);
 3. verdict against BENCH_ISOLATED.json's recorded minimum: a mover
    whose fresh-JVM minimum sits at-band vs the isolated baseline is
    NOT-REPRODUCED (the dd13 lucky-min pattern); only a fresh-JVM
    minimum that itself grew > --ratio counts as REGRESSION;
 4. maintain BENCH_ISOLATED.json with three-tier floor semantics
    (round-11 advice): `minima_sec` holds only CONFIRMED floors and is
    monotone-min on NOT-REPRODUCED; an UNCONFIRMED verdict (no isolated
    baseline, fresh/prev-catalog ratio inside the protocol-inflation
    band) writes `provisional_sec`, which the NEXT triage re-confirms
    at the strict iso bound before promoting; a REGRESSION leaves the
    old floor in place (re-running before a fix re-fires the exit-1
    signal) and stashes the measurement in `regressed_sec` — promote it
    to `minima_sec` by hand only when the regression is explicitly
    ACCEPTED.

Inputs CUR and PREV are each one of:
  - a BENCH_DETAIL-style file ({"queries": {name: sec}}),
  - a driver BENCH_r{N}.json (auto-detected via its "parsed" wrapper;
    NOTE: its query dict is budget-capped to the slowest ~60 — prefer
    the full detail file when available),
  - git:REV[:PATH] — read PATH (default BENCH_DETAIL.json) from a git
    revision, e.g. git:HEAD~1 for the previous round's committed detail.

Usage:
  tools/triage_movers.py CUR PREV [--ratio 1.5] [--base 1.0]
      [--sf /root/testdata/sf0.1] [--max-runs 8] [--no-rerun]
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

# repo root for the relative tools/run_main.sh, git show, and the
# BENCH_ISOLATED.json default — but user-supplied relative paths must
# resolve against the CALLER's cwd, so the chdir happens in main()
# AFTER those are absolutized (round-11 advice: a module-level chdir
# silently rebound them).
REPO_ROOT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")


def _abs_unless_git(spec):
    """Absolutize a CUR/PREV/--isolated path against the caller's cwd;
    git:REV[:PATH] specs resolve inside the repo and pass through."""
    return spec if spec.startswith("git:") else os.path.abspath(spec)


def load_map(spec):
    """Return (label, {query: seconds}, full-doc) for a CUR/PREV spec."""
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
    return label, {k: float(v) for k, v in doc["queries"].items()}, doc


def bench_one(query, sf, max_runs):
    """Fresh-JVM isolated minimum via graft.BenchOne (adaptive warm
    runs). Returns (min_sec, runs, converged) or None on failure."""
    r = subprocess.run(["tools/run_main.sh", "graft.BenchOne", sf, query,
                        str(max_runs)], capture_output=True, text=True)
    if "STALE" in (r.stderr or "").upper():
        sys.exit("stale bytecode — run 'sbt compile' first "
                 "(refusing to time the wrong classes)")
    m = re.search(rf"\[benchone\] {re.escape(query)} .*min=([\d.]+)"
                  r"(?: runs=(\d+) converged=(\w+))?", r.stdout)
    if not m:
        return None
    runs = int(m.group(2)) if m.group(2) else None
    conv = (m.group(3) == "true") if m.group(3) else None
    return float(m.group(1)), runs, conv


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cur")
    ap.add_argument("prev")
    ap.add_argument("--ratio", type=float, default=1.5)
    ap.add_argument("--base", type=float, default=1.0)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--max-runs", "--runs", dest="max_runs", type=int,
                    default=8, help="BenchOne warm-run cap (adaptive "
                    "convergence stops earlier when the floor settles)")
    ap.add_argument("--isolated", default=None,
                    help="isolated-floor artifact (default: the repo's "
                         "BENCH_ISOLATED.json; a USER-SUPPLIED relative "
                         "path resolves against the caller's cwd)")
    ap.add_argument("--no-rerun", action="store_true",
                    help="flag only; skip the fresh-JVM re-isolation "
                         "(every flag reports UNTRIAGED)")
    args = ap.parse_args()

    cur_spec = _abs_unless_git(args.cur)
    prev_spec = _abs_unless_git(args.prev)
    # the DEFAULT artifact lives at the repo root — absolutizing it
    # against a foreign caller cwd would silently seed a fresh
    # empty-floor artifact there (every mover falls to the weak
    # prev-catalog fallback) and write the refresh to the wrong file
    iso_path = (_abs_unless_git(args.isolated) if args.isolated
                else os.path.join(os.path.abspath(REPO_ROOT),
                                  "BENCH_ISOLATED.json"))
    os.chdir(REPO_ROOT)

    cur_label, cur, cur_doc = load_map(cur_spec)
    prev_label, prev, _ = load_map(prev_spec)
    common = sorted(set(cur) & set(prev))
    try:
        iso = json.load(open(iso_path))
    except FileNotFoundError:
        # seed the provenance fields a fresh artifact must carry (the
        # committed file records them; a refresh-created one must too)
        iso = {"sf": args.sf,
               "protocol": "fresh JVM per query; adaptive warm runs "
                           "(run 1 dropped; converge when the last run "
                           "is within 15% of the running min, >=2 warm "
                           f"runs, cap {args.max_runs}); min over warm "
                           "runs",
               "commit": subprocess.run(
                   ["git", "rev-parse", "--short", "HEAD"],
                   capture_output=True, text=True).stdout.strip(),
               "minima_sec": {}}
    iso_min = iso.get("minima_sec", {})
    provisional = iso.get("provisional_sec", {})
    regressed = iso.get("regressed_sec", {})

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
          f"{len(gains)} improved past the same band")
    # per-query noise floor, stamped on the bench artifact itself
    # (round-11 directive 3) — repeat it here so a table reader sees it
    noise = cur_doc.get("stable_above_sec")
    if noise is not None:
        print(f"note: per-query times below {noise}s are in-catalog "
              "order/JIT noise (artifact's stable_above_sec) — only the "
              "fresh-JVM verdicts below carry signal for those")
    print()

    head = subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                          capture_output=True, text=True).stdout.strip()
    rows, regressions = [], 0
    changed = False
    for q, p, c, r in movers:
        iso_base = iso_min.get(q)
        prov = provisional.get(q)
        if args.no_rerun:
            rows.append((q, p, c, r, iso_base, None, None,
                         "UNTRIAGED (--no-rerun)"))
            continue
        res = bench_one(q, args.sf, args.max_runs)
        if res is None:
            rows.append((q, p, c, r, iso_base, None, None,
                         "ERROR (BenchOne failed)"))
            regressions += 1
            continue
        fresh, nruns, conv = res
        runs_note = (f"{nruns}{'' if conv else '!'}" if nruns else "-")
        # reference precedence: a CONFIRMED isolated floor, else a
        # PROVISIONAL floor from a previous UNCONFIRMED verdict (same
        # fresh-JVM protocol, so the strict bound applies and a pass
        # promotes it), else the previous driver number — the weakest
        # fallback: the fresh-JVM protocol runs ~1.3-1.8x the in-catalog
        # numbers, so a prev-catalog comparison must absorb that
        # inflation or a healthy query with no isolated entry reads as
        # REGRESSION at 1.6x purely from protocol (measured band,
        # SCALE.md)
        PROTOCOL_INFLATION = 1.8
        if iso_base is not None:
            ref, ref_kind, bound = iso_base, "iso", args.ratio
        elif prov is not None:
            ref, ref_kind, bound = prov, "provisional", args.ratio
        else:
            ref, ref_kind = p, "prev-catalog"
            bound = args.ratio * PROTOCOL_INFLATION
        rr = fresh / ref
        if rr > bound and conv is False:
            # over-bound but the fresh floor never converged (hit the
            # run cap while still falling): an inflated unconverged
            # reading must not fire exit-1 — that is exactly the
            # ev14-class false REGRESSION the adaptive protocol exists
            # to kill (round-12 advice). Park it as provisional; the
            # next triage re-judges it from a converged run.
            verdict = (f"CAP-OUT (fresh {fresh:.2f}s = {rr:.2f}x "
                       f"{ref_kind} {ref:.2f}s but the floor hit the "
                       "run cap without converging — recorded as "
                       "provisional, not a regression; re-run to "
                       "converge)")
            provisional[q] = round(fresh, 3)
            changed = True
        elif rr > bound:
            verdict = (f"REGRESSION (fresh {fresh:.2f}s = {rr:.2f}x "
                       f"{ref_kind} {ref:.2f}s)")
            regressions += 1
            # keep the trusted floor: overwriting it with the regressed
            # time would make a pre-fix re-run read NOT-REPRODUCED
            # (one-shot signal). The measurement lands in regressed_sec
            # for the fix (or an explicit acceptance) to consume.
            regressed[q] = {"sec": round(fresh, 3), "commit": head,
                            "runs": nruns}
            changed = True
        elif ref_kind == "prev-catalog" and rr > args.ratio:
            # inside the inflation allowance a real regression up to
            # ~(bound/ratio)x is indistinguishable from protocol
            # inflation — say so instead of overclaiming NOT-REPRODUCED.
            # The measurement is PROVISIONAL: the next triage judges it
            # at the strict iso bound and only then promotes it.
            verdict = (f"UNCONFIRMED (fresh {fresh:.2f}s = {rr:.2f}x "
                       f"prev-catalog {ref:.2f}s — within the 1.3-1.8x "
                       "fresh-JVM protocol-inflation band; no isolated "
                       "baseline to separate inflation from code. "
                       "Recorded as provisional; next triage re-confirms "
                       "at the iso bound)")
            provisional[q] = round(fresh, 3)
            changed = True
        elif conv is False:
            # at-band but the fresh floor never converged (hit the run
            # cap): the reading clears the mover, but it is NOT a
            # confirmation — park it as provisional so the pending
            # regressed/provisional state survives until a converged run
            verdict = (f"NOT-REPRODUCED (fresh {fresh:.2f}s vs "
                       f"{ref_kind} {ref:.2f}s = {rr:.2f}x — but the "
                       "fresh floor hit the run cap without converging; "
                       "recorded as provisional, not confirmed)")
            provisional[q] = round(fresh, 3)
            changed = True
        else:
            verdict = (f"NOT-REPRODUCED (fresh {fresh:.2f}s vs "
                       f"{ref_kind} {ref:.2f}s = {rr:.2f}x — "
                       "contention/lucky-min, not code)")
            # not reproduced = code unchanged: the CONFIRMED floor is
            # the best EVER observed — min across the fresh run and any
            # recorded baseline(s); a provisional entry that passed the
            # strict bound is hereby confirmed and promoted
            cands = [fresh] + [v for v in (iso_base, prov) if v is not None]
            new_floor = round(min(cands), 3)
            if iso_min.get(q) != new_floor:
                iso_min[q] = new_floor
                iso.setdefault("refreshed_at", {})[q] = head
            provisional.pop(q, None)
            regressed.pop(q, None)
            changed = True
        rows.append((q, p, c, r, iso_base if iso_base is not None else prov,
                     fresh, runs_note, verdict))

    print("| query | prev s | cur s | driver ratio | floor s | "
          "fresh min s | runs | verdict |")
    print("|---|---|---|---|---|---|---|---|")
    for q, p, c, r, ib, f, rn, v in rows:
        print(f"| {q} | {p:.2f} | {c:.2f} | {r:.2f}x | "
              f"{'-' if ib is None else f'{ib:.2f}'} | "
              f"{'-' if f is None else f'{f:.2f}'} | "
              f"{rn or '-'} | {v} |")
    if not rows:
        print("| (none flagged) | | | | | | | |")
    if gains:
        print("\nimprovements past the same band (informational): "
              + ", ".join(f"{q} {p:.2f}->{c:.2f}s ({r:.2f}x)"
                          for q, p, c, r in gains))

    if changed:
        iso["minima_sec"] = dict(sorted(iso_min.items(),
                                        key=lambda kv: -kv[1]))
        for key, val in (("provisional_sec", provisional),
                         ("regressed_sec", regressed)):
            if val:
                iso[key] = dict(sorted(val.items()))
            else:
                iso.pop(key, None)
        json.dump(iso, open(iso_path, "w"), indent=1)
        print(f"\nrefreshed {iso_path} at commit {head} "
              f"(confirmed floors: {len(iso_min)}, "
              f"provisional: {len(provisional)}, "
              f"regressed: {len(regressed)})")

    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
