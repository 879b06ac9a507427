#!/usr/bin/env python
"""Measurement-only data scaler (round-6 optimization work, guide §1).

The driver's round-end bench escalated to a driver-generated sf1.0 dataset
(BENCH_r05.json: 6M-row lineitem etc.) that is not present in the sandbox
between rounds. To time query optimizations at that scale, this tiles the
read-only /root/testdata/sf0.1 tables K times with disjoint id ranges:

- fact/dim keys are shifted by copy*OFFSET consistently across tables, so
  join fan-outs, group sizes and per-key densities match the sf0.1 shape;
- document text gets a per-copy letter-rotation cipher (copy 0 is the
  original): lengths, whitespace structure and within-copy similarity are
  preserved exactly, while cross-copy word/shingle sets are disjoint — the
  tiled corpus does not invent near-dup pairs the real sf1.0 would not have;
- embeddings are component-rotated per copy (np.roll) so tiling does not
  plant exact-duplicate vectors.

This is a measurement harness only: nothing in the engine or the declared
queries reads its output.

    python tools/make_scale_data.py --k 10 --out /root/scratch/sfx1.0
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OFF = 10_000_000  # multiple of 10 and 20: preserves %10 buckets and /20 windows


def _cipher(i: int):
    if i == 0:
        return None
    lo = "abcdefghijklmnopqrstuvwxyz"
    up = lo.upper()
    dg = "0123456789"
    rot = lambda s, n: s[n % len(s):] + s[: n % len(s)]
    return str.maketrans(lo + up + dg, rot(lo, i) + rot(up, i) + rot(dg, i))


def _shift(tbl: pa.Table, col: str, delta: int) -> pa.Table:
    idx = tbl.schema.get_field_index(col)
    arr = pa.compute.add(tbl.column(col), delta)
    return tbl.set_column(idx, col, arr)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    shifted = {
        "lineitem": ["l_orderkey"],
        "orders": ["o_orderkey", "o_custkey"],
        "customer": ["c_custkey"],
        "events": ["event_id", "user_id"],
        "documents": ["doc_id"],
        "embeddings": ["vec_id"],
    }
    for name in ("lineitem", "orders", "customer", "events", "documents",
                 "embeddings", "part", "supplier", "nation", "region"):
        src = pq.read_table(f"{SRC}/{name}.parquet")
        if name not in shifted:
            pq.write_table(src, f"{args.out}/{name}.parquet")
            print(f"{name}: copied {src.num_rows}")
            continue
        copies = []
        for i in range(args.k):
            t = src
            for c in shifted[name]:
                t = _shift(t, c, i * OFF)
            if name == "documents" and i > 0:
                tr = _cipher(i)
                texts = [x.as_py().translate(tr) for x in src.column("text")]
                t = t.set_column(t.schema.get_field_index("text"), "text",
                                 pa.array(texts, type=pa.string()))
            if name == "embeddings" and i > 0:
                col = src.column("embedding").combine_chunks()
                vals = col.values.to_numpy(zero_copy_only=False).astype(np.float32)
                offs = col.offsets.to_numpy()
                dim = int(offs[1] - offs[0])
                mat = np.roll(vals.reshape(-1, dim), i, axis=1)
                arr = pa.FixedSizeListArray.from_arrays(
                    pa.array(mat.ravel(), type=pa.float32()), dim
                ).cast(pa.list_(pa.field("element", pa.float32())))
                t = t.set_column(t.schema.get_field_index("embedding"),
                                 "embedding", arr)
            copies.append(t)
        out = pa.concat_tables(copies)
        pq.write_table(out, f"{args.out}/{name}.parquet")
        print(f"{name}: {src.num_rows} x {args.k} -> {out.num_rows}")


if __name__ == "__main__":
    main()
