"""Synthesize an sf1 tier (10x sf0.1) for oracle stress-sweeps.

The driver only ships sf{0.001,0.01,0.1}; this derives a deterministic
sf1 under /tmp/sf1 by replicating each sf0.1 fact table 10x with
per-copy key offsets (copy * 10^9). The engine's point coordinates are
pure functions of the keys, so offset keys produce 10x genuinely new
geometry — not stacked duplicates. Text/embedding payloads are copied
as-is (exact duplicates at 10x density stress the dedup tie-handling on
purpose). Dimension tables copy through unchanged.

This is NOT driver testdata and is never read by the gate; it exists so
`tools/check_oracle.py /tmp/sf1` can shake out tie-boundary/overflow
hazards at 10x the largest shipped tier (VERDICT round-2 item 7).

Usage: python tools/make_sf1.py [--out /tmp/sf1]
"""

from __future__ import annotations

import argparse
import os

import duckdb

SRC = "/root/testdata/sf0.1"
OFF = 1_000_000_000

FACTS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
DIMS = ["region", "nation"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/sf1")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    con = duckdb.connect()
    for t, keys in FACTS.items():
        cols = [
            c[0]
            for c in con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{SRC}/{t}.parquet')"
            ).fetchall()
        ]
        sel = ", ".join(
            f"{c} + _copy * {OFF} AS {c}" if c in keys else c for c in cols
        )
        con.execute(
            f"COPY (SELECT {sel} FROM read_parquet('{SRC}/{t}.parquet'), "
            f"(SELECT unnest(range(10)) AS _copy) ORDER BY _copy) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{args.out}/{t}.parquet')").fetchone()[0]
        print(f"{t}: {n} rows")
    for t in DIMS:
        con.execute(
            f"COPY (SELECT * FROM read_parquet('{SRC}/{t}.parquet')) "
            f"TO '{args.out}/{t}.parquet' (FORMAT PARQUET)"
        )
    print("done:", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
