"""Merge-on-read DELETE capacity probe (io/clustered.py,
``delete_clustered(strategy='mor')``) — the twin of cow_capacity.py.

The claim under test is the 100-TB one for the OTHER Iceberg delete
strategy: a merge-on-read delete writes a position-delete file
proportional to the MATCHES and rewrites nothing, so the delete's wall
should be near-flat in table size (vs COW's touched-file rewrite), and
the read-side cost it buys — the pending-set anti-join at every scan —
should be a bounded overhead that compaction then retires.

Measured on twin tables under TWO delete patterns — the strategy
choice is workload-shaped, and the numbers should show the crossover
honestly rather than cherry-pick:

  - ``local``  (Paris circle): the matches cluster in ~1 file — COW's
    minimal rewrite is already proportional to the region, so COW
    should win or tie (MOR pays the same pruned hit scan PLUS a
    delete-file write);
  - ``scattered`` (key % N == 0, no shape): matches land in EVERY
    file — COW must rewrite the whole table while MOR still writes one
    small position file; this is MOR's reason to exist (GDPR-style
    key deletes, CDC retractions).

For each pattern: delete wall MOR vs COW; the suite-standard radius
query BEFORE the delete, AFTER the MOR delete (pending-set anti-join
applied), and AFTER compaction (materialized) — the MOR read tax and
its amortization; correctness asserted, not assumed: surviving-row
count + an order-independent xxhash64 checksum over every column vs
the plain filtered DataFrame, after the MOR delete AND after
compaction.

Usage: python tools/mor_capacity.py [--sf /root/testdata/sf0.1]
       [--mult 16] [--files 64] [--out bench_runs/mor_cap.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")

QLON, QLAT, R_KM = 2.3125, 48.875, 150.0  # Paris circle, suite-standard


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=16)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("mor-capacity")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.functions.native import haversine_km
    from spatial4n_spark.io import clustered as C
    from spatial4n_spark.kernels.distance import km_to_deg
    from spatial4n_spark.kernels.polygon import Circle
    from spatial4n_spark.suite import pts_orders

    pts = pts_orders(spark, args.sf).toDF("pid", "lon", "lat")
    if args.mult > 1:
        reps = spark.range(args.mult).select(F.col("id").alias("_rep"))
        pts = pts.crossJoin(F.broadcast(reps)).select(
            (F.col("pid") * args.mult + F.col("_rep")).alias("pid"), "lon", "lat"
        )
    base = tempfile.mkdtemp(prefix="mor_cap_base_")
    pts.write.mode("overwrite").parquet(base)
    pts = spark.read.parquet(base)
    n_total = pts.count()

    local_pred = (
        haversine_km(F.col("lon"), F.col("lat"), F.lit(QLON), F.lit(QLAT))
        <= F.lit(R_KM)
    )
    circle = Circle(QLON, QLAT, km_to_deg(R_KM), geo=True)
    scattered_pred = F.col("pid") % 1000 == 0
    cols = [F.col(c) for c in sorted(pts.columns)]

    def build(prefix: str) -> str:
        p = tempfile.mkdtemp(prefix=prefix)
        t0 = time.time()
        C.write_clustered(pts, p, level=14, files=args.files)
        print(f"built {prefix} ({n_total} rows) in {time.time()-t0:.1f}s")
        return p

    def expect(pred):
        survivors = pts.where(~pred)
        rows = survivors.count()
        h = survivors.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")
        ).collect()[0]["h"]
        return rows, h

    def check(path: str, tag: str, want) -> None:
        got = C._read_listed(spark, path).drop(C.CELL_COL)
        g_rows = got.count()
        g_hash = got.select(
            F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")
        ).collect()[0]["h"]
        assert (g_rows, g_hash) == want, (tag, g_rows, g_hash, want)

    def radius_wall(path: str):
        t0 = time.time()
        n = C.clustered_radius_query(spark, path, -73.97, 40.75, 500.0).count()
        return time.time() - t0, n

    report: dict = {
        "tool": "mor_capacity",
        "sf": args.sf,
        "mult": args.mult,
        "rows": n_total,
        "files": args.files,
        "cpus": args.cpus,
        "patterns": {},
    }

    for pattern, pred, shape in (
        ("local", local_pred, circle),
        ("scattered", scattered_pred, None),
    ):
        want = expect(pred)
        rec: dict = {}

        # --- MOR: delete writes a position file, rewrites nothing ---
        p_mor = build(f"mor_cap_{pattern}_mor_")
        pre_read_s, pre_n = radius_wall(p_mor)
        t0 = time.time()
        man = C.delete_clustered(spark, p_mor, pred, shape=shape, strategy="mor")
        mor_s = time.time() - t0
        check(p_mor, f"{pattern}/mor", want)
        dfile = man["deletes"][-1]["file"]
        dbytes = sum(
            os.path.getsize(os.path.join(p_mor, dfile, f))
            for f in os.listdir(os.path.join(p_mor, dfile))
            if f.endswith(".parquet")
        )
        post_read_s, post_n = radius_wall(p_mor)
        rec["mor_delete"] = {
            "wall_s": round(mor_s, 2),
            "deleted_rows": man["summary"]["deleted_rows"],
            "rewritten_files": man["summary"]["rewritten_files"],
            "delete_file_bytes": dbytes,
            "delete_file_targets": man["summary"]["delete_file_targets"],
        }

        # --- compaction retires the pending set ---
        t0 = time.time()
        C.compact_clustered(spark, p_mor, files=args.files)
        compact_s = time.time() - t0
        check(p_mor, f"{pattern}/mor+compact", want)
        cmp_read_s, _cmp_n = radius_wall(p_mor)
        rec["reads"] = {
            "radius_query_pre_delete_s": round(pre_read_s, 2),
            "radius_query_pending_mor_s": round(post_read_s, 2),
            "radius_query_post_compact_s": round(cmp_read_s, 2),
        }
        rec["compact_s"] = round(compact_s, 2)
        assert C.load_manifest(p_mor)["deletes"] == []

        # --- COW twin: same delete copy-on-write ---
        p_cow = build(f"mor_cap_{pattern}_cow_")
        t0 = time.time()
        man_c = C.delete_clustered(spark, p_cow, pred, shape=shape, strategy="cow")
        cow_s = time.time() - t0
        check(p_cow, f"{pattern}/cow", want)
        rec["cow_delete"] = {
            "wall_s": round(cow_s, 2),
            "deleted_rows": man_c["summary"]["deleted_rows"],
            "rewritten_files": man_c["summary"]["rewritten_files"],
        }
        rec["mor_vs_cow_speedup"] = round(cow_s / max(mor_s, 1e-9), 2)
        report["patterns"][pattern] = rec

    # --- MERGE: O(batch) equality-delete upsert vs COW hit-scan+rewrite.
    # The batch scatters across the key space (every 1000th key, moved
    # east), so COW's hit scan must read the key column of every file
    # and rewrite every touched one; MOR writes keys + data, reads
    # nothing. ---
    batch_src = tempfile.mkdtemp(prefix="mor_cap_upbatch_")
    pts.where(F.col("pid") % 1000 == 1).withColumn(
        "lon", F.least(F.col("lon") + F.lit(1.0), F.lit(179.9))
    ).write.mode("overwrite").parquet(batch_src)
    batch = spark.read.parquet(batch_src)
    n_batch = batch.count()
    up_want_rows = n_total  # pure replacement, no inserts
    report["upsert"] = {"batch_rows": n_batch}
    for strat in ("mor", "cow"):
        p = build(f"mor_cap_up_{strat}_")
        t0 = time.time()
        man_u = C.upsert_clustered(spark, batch, p, key="pid", strategy=strat)
        wall = time.time() - t0
        got = C._read_listed(spark, p)
        assert got.count() == up_want_rows, (strat, got.count(), up_want_rows)
        moved = got.where(F.col("pid") % 1000 == 1).count()
        assert moved == n_batch, (strat, moved, n_batch)
        report["upsert"][strat] = {
            "wall_s": round(wall, 2),
            "rewritten_files": man_u["summary"].get("rewritten_files", 0),
        }
    report["upsert"]["mor_vs_cow_speedup"] = round(
        report["upsert"]["cow"]["wall_s"]
        / max(report["upsert"]["mor"]["wall_s"], 1e-9),
        2,
    )

    out = json.dumps(report)
    print(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
