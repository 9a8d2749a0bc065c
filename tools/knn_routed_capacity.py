"""Capacity evidence for the round-5 kNN unification: the LIST entry
point (operators.knn.knn_join) above df_threshold routes to the
DF-native plan, so driver state must stay flat as the query count grows
10x — no pending dict, no isin literal lists in the plan.

Usage: python tools/knn_routed_capacity.py [--points 1000000]
       [--queries 10000,100000] [--k 5] [--cpus 16]
Prints one JSON line per level: wall, q/s, and driver RSS before/after.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_mb() -> float:
    with open("/proc/self/status") as f:
        for ln in f:
            if ln.startswith("VmRSS"):
                return round(int(ln.split()[1]) / 1024.0, 1)
    return -1.0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=1_000_000)
    ap.add_argument("--queries", type=str, default="10000,100000")
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from spatial4n_spark.operators.knn import knn_join
    from spatial4n_spark.sources.images import images_df, synth_coords

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("knn-routed-capacity")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus * 2, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "20g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import numpy as np

    points = images_df(
        spark, args.points, with_bytes=False, partitions=args.cpus * 2
    ).select("image_id", "lon", "lat")
    points = points.persist()
    points.count()

    for nq in (int(x) for x in args.queries.split(",")):
        # deterministic query centers from the same coordinate mixture
        ids = np.arange(nq, dtype=np.int64) + 7_000_000
        qlon, qlat = synth_coords(ids)
        queries = [
            (f"q{int(i):07d}", float(a), float(b))
            for i, a, b in zip(ids, qlon, qlat)
        ]
        r0 = rss_mb()
        t0 = time.time()
        n_out = knn_join(
            points, queries, k=args.k, estimated_total=args.points
        ).count()
        dt = time.time() - t0
        print(
            json.dumps(
                {
                    "path": "knn_join(list) routed -> knn_join_df",
                    "points": args.points,
                    "queries": nq,
                    "k": args.k,
                    "cpus": args.cpus,
                    "rows_out": n_out,
                    "sec": round(dt, 1),
                    "queries_per_sec": round(nq / dt, 1),
                    "driver_rss_mb_before": r0,
                    "driver_rss_mb_after": rss_mb(),
                }
            )
        )
        sys.stdout.flush()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
