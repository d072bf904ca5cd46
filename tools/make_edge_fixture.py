#!/usr/bin/env python3
"""Build the EDGE-CASE fixture: pathological documents (empty,
whitespace-only, shorter than one shingle/chunk/window), pathological
events (a lone single-event user, EQUAL-timestamp ties, a one-day-only
user, zero/negative values), and pathological embeddings (the ZERO
vector, duplicates, tiny magnitudes) — other tables copied from a
source sf dir — for a full-catalog divergence sweep:

    python3 tools/make_edge_fixture.py /root/testdata/sf0.01 /tmp/edge_sf
    sbt -batch "runMain graft.Verify /tmp/edge_sf /tmp/edge_out"
    python3 tools/check_oracle.py /tmp/edge_sf /tmp/edge_out

Why: Spark's sequence(a, b) steps DOWN when b < a, integer `div`
truncates while DuckDB's `//` floors, ANSI arithmetic throws where
DuckDB errors differently — the class of silent engine divergences that
only pathological inputs expose. The round-7 sweeps over this fixture
found (and fixed) 25 latent issues: dd15/pk7/tx28 descending-sequence
bugs; ml4/ml10 single-class and ab3/ab4/ml6 single-sample
divide-by-zero; gr5 dropping isolated nodes; ir6's ln(0) on
corpus-absent probe terms; zero-norm-vector divide-by-zero across the
whole cosine tier (sim1-6, sim11-17, km2, mm7, ir10 — zero-norm rows
are now excluded, the normalize-or-drop rule, mirrored in every
oracle); and h11's unguarded CAST of a no-match extract. No expected
residuals: gr20's empty-seed case (doc_id % 50 == 0 matches nothing in
7 docs) is guarded on both sides — all ranks 0, division guarded — and
verified green on this fixture (round 8).

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

    # pathological events: a single-event user, EQUAL-timestamp ties,
    # a one-day-only user, zero/negative values, missing-key JSON props
    base = 1_700_000_000_000_000  # epoch micros
    ev = [
        # (event_id, ts_us, user_id, event_type, value, props)
        (1, base, 1, "view", 0.0, "{}"),                   # lone event
        (2, base + 1000, 2, "click", -5.5, '{"k": 1}'),    # tie pair a
        (3, base + 1000, 2, "view", 2.5, '{"k": 2}'),      # tie pair b
        (4, base + 2000, 2, "view", 2.5, '{"k": 3}'),
        (5, base + 3_600_000_000, 3, "purchase", 0.0, "{}"),
        (6, base + 3_700_000_000, 3, "purchase", 1.0, '{"k": 9}'),
    ]
    pq.write_table(pa.table({
        "event_id": [e[0] for e in ev],
        "ts": pa.array([e[1] for e in ev], pa.timestamp("us")),
        "user_id": [e[2] for e in ev],
        "event_type": [e[3] for e in ev],
        "value": [e[4] for e in ev],
        "props": [e[5] for e in ev],
    }), os.path.join(dst, "events.parquet"))

    # pathological embeddings: the ZERO vector (cosine undefined), two
    # identical vectors, a tiny-magnitude one, a negative one
    dim = 64
    vecs = [
        [0.0] * dim,                                  # zero norm
        [1.0] + [0.0] * (dim - 1),                    # unit-x (dup a)
        [1.0] + [0.0] * (dim - 1),                    # unit-x (dup b)
        [1e-8] * dim,                                 # tiny magnitude
        [-1.0 if i % 2 else 1.0 for i in range(dim)],  # signed
        [float(i) / dim for i in range(dim)],          # generic
    ]
    pq.write_table(pa.table({
        "vec_id": list(range(len(vecs))),
        "embedding": pa.array(vecs, pa.list_(pa.float32())),
        "label": pa.array([0, 0, 0, 1, 1, 1], pa.int32()),
    }), os.path.join(dst, "embeddings.parquet"))

    for f in glob.glob(os.path.join(src, "*.parquet")):
        b = os.path.basename(f)
        if b not in ("documents.parquet", "events.parquet",
                     "embeddings.parquet"):
            shutil.copy(f, os.path.join(dst, b))
    print(f"edge fixture at {dst}: {len(TEXTS)} pathological docs, "
          f"{len(ev)} events, {len(vecs)} embeddings; "
          f"other tables from {src}")


def main_empty(src: str, dst: str) -> None:
    """--empty mode: documents/events/embeddings each ZERO rows (exact
    schemas preserved), other tables copied. The round-7 empty sweep
    found 8 more issues (driver-side 0-divisions in pagerank/ev48,
    Coreset's collect()(0), pk7/gr14 aggregate 0-divisions, dd9's
    ungrouped-vs-grouped empty-aggregate row mismatch) — all fixed; the
    full catalog now passes this sweep 370/370."""
    os.makedirs(dst, exist_ok=True)
    for t in ("documents", "events", "embeddings"):
        tab = pq.read_table(os.path.join(src, f"{t}.parquet"))
        pq.write_table(tab.slice(0, 0), os.path.join(dst, f"{t}.parquet"))
    for f in glob.glob(os.path.join(src, "*.parquet")):
        b = os.path.basename(f)
        if b not in ("documents.parquet", "events.parquet",
                     "embeddings.parquet"):
            shutil.copy(f, os.path.join(dst, b))
    print(f"empty fixture at {dst}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if a != "--empty"]
    fn = main_empty if "--empty" in sys.argv else main
    fn(args[0] if len(args) > 0 else "/root/testdata/sf0.01",
       args[1] if len(args) > 1 else
       ("/tmp/empty_sf" if fn is main_empty else "/tmp/edge_sf"))
