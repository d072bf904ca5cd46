#!/usr/bin/env python3
"""Regenerate SCALING_BASELINE.json from a ScalingAudit log.

The cross-SF sweep prints one `TIMING <name> tA=<s> tB=<s> ratio=<r>`
line per query (plus `SUPERLINEAR <name> ...` flags). Preflight keeps
its full log at /tmp/preflight_full*.log; this script harvests the
newest sweep into the committed baseline artifact so next round's
ratio diffs compare files, not prose.

Usage: python3 tools/scaling_baseline.py <sweep-log> [out.json] \
           [sfA] [sfB] [ratioBound] [floorSec]

The provenance fields (sfA/sfB/bound) default to ScalingAudit's
defaults — pass them explicitly when harvesting a non-default sweep,
or the artifact records fixtures the timings did not come from. The
commit field records HEAD at harvest time; regenerate at the commit
you are publishing.
"""
import json
import re
import subprocess
import sys

log = sys.argv[1]
out = sys.argv[2] if len(sys.argv) > 2 else "SCALING_BASELINE.json"

rows, flags = {}, []
for line in open(log):
    m = re.match(r"TIMING (\S+) tA=([\d.]+) tB=([\d.]+) ratio=([\d.]+)", line)
    if m:
        rows[m.group(1)] = {
            "tA_sec": float(m.group(2)),
            "tB_sec": float(m.group(3)),
            "ratio": float(m.group(4)),
        }
    f = re.match(r"SUPERLINEAR (\S+) (.*)", line)
    if f:
        flags.append({"query": f.group(1), "detail": f.group(2)})

if not rows:
    sys.exit(f"no TIMING lines found in {log}")

doc = {
    "sfA": sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001",
    "sfB": sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.01",
    "protocol": "one JVM, AQE off, 3 warm-up queries per SF; noop-sink "
                "materialization; timings are SINGLE samples (spike noise "
                "possible — diff ratios with tolerance); flags re-timed "
                "min-of-two before counting",
    "bound": {"ratio": float(sys.argv[5]) if len(sys.argv) > 5 else 10.0,
              "floor_sec": float(sys.argv[6]) if len(sys.argv) > 6 else 2.0},
    "commit": subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                             capture_output=True, text=True).stdout.strip(),
    "flags": flags,
    "timings": dict(sorted(rows.items(), key=lambda kv: -kv[1]["ratio"])),
}
json.dump(doc, open(out, "w"), indent=1)
print(f"wrote {out}: {len(rows)} queries, {len(flags)} flags")
