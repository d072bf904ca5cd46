#!/usr/bin/env python3
"""Build the EDGE-CASE fixture: a documents table of pathological texts
(empty, whitespace-only, shorter than one shingle/chunk/window) with the
other tables copied from a source sf dir, for a full-catalog divergence
sweep:

    python3 tools/make_edge_fixture.py /root/testdata/sf0.01 /tmp/edge_sf
    sbt -batch "runMain graft.Verify /tmp/edge_sf /tmp/edge_out"
    python3 tools/check_oracle.py /tmp/edge_sf /tmp/edge_out

Why: Spark's sequence(a, b) steps DOWN when b < a, integer `div`
truncates while DuckDB's `//` floors, ANSI division throws where DuckDB
errors differently — the class of silent engine divergences that only
pathological inputs expose. The round-7 sweep over this fixture found
(and fixed) dd15/pk7/tx28 descending-sequence bugs, ml4/ml10
single-class divide-by-zero, gr5 dropping isolated nodes, and ir6's
ln(0) on corpus-absent probe terms. Expected residual: gr20 requires a
non-empty seed set (doc_id % 50 == 0 matches nothing in 7 docs) — a
documented API contract, not a divergence.

Dev tooling only (pyarrow is driver-side, not part of the Scala build).
"""
import glob
import os
import shutil
import sys

import pyarrow as pa
import pyarrow.parquet as pq

TEXTS = [
    "",                      # empty
    "   ",                   # whitespace-only (normalizes to empty)
    "ab",                    # shorter than any shingle
    "abcdefg",               # one char short of the 8-gram CDC window
    "abcdefgh",              # exactly one 8-gram
    "hello world this is a slightly longer doc with some repeated "
    "repeated words words",  # short but tokenizable
    "x" * 200,               # one giant token
]


def main(src: str, dst: str) -> None:
    os.makedirs(dst, exist_ok=True)
    rows = {
        "doc_id": list(range(1, len(TEXTS) + 1)),
        "text": TEXTS,
        "lang": ["en"] * len(TEXTS),
        "source": ["edge"] * len(TEXTS),
        "n_chars": [len(t) for t in TEXTS],
    }
    pq.write_table(pa.table(rows), os.path.join(dst, "documents.parquet"))
    for f in glob.glob(os.path.join(src, "*.parquet")):
        if os.path.basename(f) != "documents.parquet":
            shutil.copy(f, os.path.join(dst, os.path.basename(f)))
    print(f"edge fixture at {dst}: {len(TEXTS)} pathological docs, "
          f"other tables from {src}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/edge_sf")
