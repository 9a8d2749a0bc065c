"""Clustered-storage capacity probe: full-scan radius join vs the
Hilbert-range-clustered layout (io/clustered.py) on the same points.

Writes the orders points of --sf clustered into --files files, then
times each RADIUS_CENTERS query both ways (best of --reps), reporting
per-query speedup plus the manifest's own accounting of how much of the
table the pruned scan could even touch. Row counts are asserted equal
every rep, and full result-content equality (an order-independent
xxhash64 checksum over every column) once per query — the layout must
change what is read, never what is returned.

Usage: python tools/clustered_capacity.py [--sf /tmp/sf1] [--files 64]
       [--reps 3] [--out bench_runs/clustered_cap.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--table", choices=["orders", "lineitem"], default="orders")
    ap.add_argument(
        "--mult",
        type=int,
        default=1,
        help="replicate the point table N times (distinct ids) to reach a scale "
        "where scan I/O, not plan overhead, dominates the comparison",
    )
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument(
        "--layout",
        choices=["flat", "st"],
        default="flat",
        help="st: day-partitioned + per-day clustering (io/st_clustered); "
        "queries then carry a 2-of-16-day window, so the comparison shows "
        "BOTH pruning axes composed against the same full-scan predicate",
    )
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()
    if args.reps < 1:
        ap.error("--reps must be >= 1")

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("clustered-capacity")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.functions.native import haversine_km
    from spatial4n_spark.io import clustered as C
    from spatial4n_spark.suite import RADIUS_CENTERS, pts_lineitem, pts_orders

    if args.table == "lineitem":
        li = pts_lineitem(spark, args.sf)
        pts = li.select(
            (F.col("l_orderkey") * 7 + F.col("l_linenumber")).alias("pid"),
            "lon",
            "lat",
        )
    else:
        pts = pts_orders(spark, args.sf).toDF("pid", "lon", "lat")
    if args.mult > 1:
        reps = spark.range(args.mult).select(F.col("id").alias("_rep"))
        pts = pts.crossJoin(F.broadcast(reps)).select(
            (F.col("pid") * args.mult + F.col("_rep")).alias("pid"), "lon", "lat"
        )
        # materialize the replicated table as plain parquet so the full
        # scan reads real files, same as the clustered side
        base = tempfile.mkdtemp(prefix="clustered_cap_base_")
        pts.write.mode("overwrite").parquet(base)
        pts = spark.read.parquet(base)
    if args.layout == "st":
        # deterministic 16-day event time; queries get a 2-day window so
        # the comparison exercises BOTH pruning axes composed
        pts = pts.withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(1704067200) + (F.col("pid") % 16) * 86400 + F.col("pid") % 977
            ),
        )
        if args.mult > 1:  # rematerialize with the ts column present
            base2 = tempfile.mkdtemp(prefix="clustered_cap_base_")
            pts.write.mode("overwrite").parquet(base2)
            pts = spark.read.parquet(base2)
    n_total = pts.count()

    t0 = time.time()
    path = tempfile.mkdtemp(prefix="clustered_cap_")
    if args.layout == "st":
        from spatial4n_spark.io import st_clustered as STC

        STC.write_st_clustered(pts, path, level=14, files=args.files)
    else:
        C.write_clustered(pts, path, level=14, files=args.files)
    build_s = time.time() - t0

    T0, T1 = "2024-01-02 00:00:00", "2024-01-03 23:59:59"
    queries = {}
    for qid, qlon, qlat, r_km in RADIUS_CENTERS:
        full_t, clu_t = [], []
        n_full = n_clu = -1
        st = None
        space_pred = (
            haversine_km(F.col("lon"), F.col("lat"), F.lit(qlon), F.lit(qlat))
            <= F.lit(r_km)
        )
        for _ in range(args.reps):
            t0 = time.time()
            full = pts.where(space_pred)
            if args.layout == "st":
                full = full.where((F.col("ts") >= F.lit(T0)) & (F.col("ts") <= F.lit(T1)))
            n_full = full.count()
            full_t.append(time.time() - t0)
            t0 = time.time()
            if args.layout == "st":
                out, st = STC.st_radius_query(
                    spark, path, qlon, qlat, r_km, T0, T1, with_stats=True
                )
            else:
                out, st = C.clustered_radius_query(
                    spark, path, qlon, qlat, r_km, with_stats=True
                )
            n_clu = out.count()
            clu_t.append(time.time() - t0)
            assert n_clu == n_full, (qid, n_clu, n_full)
        # content equality once per query, outside the timed reps: an
        # order-independent checksum over every original column proves
        # the pruned scan returned the same ROWS, not just as many
        cols = [F.col(c) for c in sorted(pts.columns)]
        h_full = full.select(F.sum(F.xxhash64(*cols)).alias("h")).collect()[0]["h"]
        h_clu = out.select(F.sum(F.xxhash64(*cols)).alias("h")).collect()[0]["h"]
        assert h_full == h_clu, (qid, h_full, h_clu)
        queries[qid] = {
            "rows": n_full,
            "full_scan_s": round(min(full_t), 3),
            "clustered_s": round(min(clu_t), 3),
            "speedup": round(min(full_t) / max(min(clu_t), 1e-9), 2),
            "files_kept": st.files_kept,
            "files_total": st.files_total,
            "rows_in_kept_files": st.rows_kept_files,
            "scan_fraction": round(st.rows_kept_files / max(st.rows_total, 1), 4),
        }
        if args.layout == "st":
            queries[qid]["days_kept"] = st.days_kept
            queries[qid]["days_total"] = st.days_total

    result = {
        "metric": f"{args.layout}-clustered-vs-fullscan radius query",
        "layout": args.layout,
        "sf": args.sf,
        "rows": n_total,
        "files": args.files,
        "cluster_build_s": round(build_s, 1),
        "reps": args.reps,
        "cpus": args.cpus,
        "queries": queries,
    }
    print(json.dumps(result))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
