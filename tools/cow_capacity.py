"""Copy-on-write DELETE/UPSERT capacity probe (io/clustered.py).

The claim under test is the 100-TB one: a spatially-local row-level
delete on a Hilbert-range-clustered table should rewrite only the files
the manifest says can hold matches — cost proportional to the DELETED
REGION, not the table — while a layout without per-file stats must
rewrite everything. This times both on the same table:

  - cow:   ``delete_clustered(pred, shape=circle)`` — manifest-pruned
           hit scan, touched-files-only rewrite, one snapshot commit;
  - naive: the full-rewrite baseline (read every listed file, filter,
           rewrite the whole table) — what "delete" means without
           file-level stats.

Correctness is asserted, not assumed: surviving-row count AND an
order-independent xxhash64 checksum over every column must match the
plain filtered DataFrame. The upsert probe moves a city-sized key
batch and reports the same touched-fraction accounting.

Usage: python tools/cow_capacity.py [--sf /tmp/sf1] [--mult 4]
       [--files 64] [--out bench_runs/cow_cap.json]
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
    ap.add_argument("--sf", default="/tmp/sf1")
    ap.add_argument("--mult", type=int, default=1)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("cow-capacity")
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
    base = tempfile.mkdtemp(prefix="cow_cap_base_")
    pts.write.mode("overwrite").parquet(base)
    pts = spark.read.parquet(base)
    n_total = pts.count()

    pred = (
        haversine_km(F.col("lon"), F.col("lat"), F.lit(QLON), F.lit(QLAT))
        <= F.lit(R_KM)
    )
    circle = Circle(QLON, QLAT, km_to_deg(R_KM), geo=True)
    survivors = pts.where(~pred)
    cols = [F.col(c) for c in sorted(pts.columns)]
    want_rows = survivors.count()
    want_hash = survivors.select(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")).collect()[0][
        "h"
    ]

    def build(prefix: str) -> str:
        p = tempfile.mkdtemp(prefix=prefix)
        t0 = time.time()
        C.write_clustered(pts, p, level=14, files=args.files)
        print(f"built {prefix} ({n_total} rows) in {time.time()-t0:.1f}s")
        return p

    def check(path: str, tag: str) -> None:
        got = C._read_listed(spark, path).drop(C.CELL_COL)
        g_rows = got.count()
        g_hash = got.select(F.sum(F.xxhash64(*cols).cast("decimal(38,0)")).alias("h")).collect()[0]["h"]
        assert (g_rows, g_hash) == (want_rows, want_hash), (
            tag,
            g_rows,
            want_rows,
            g_hash,
            want_hash,
        )

    report: dict = {
        "tool": "cow_capacity",
        "sf": args.sf,
        "mult": args.mult,
        "rows": n_total,
        "files": args.files,
        "cpus": args.cpus,
        "delete": {},
        "upsert": {},
    }

    # --- COW delete: manifest-pruned, touched-files-only rewrite ---
    p_cow = build("cow_cap_cow_")
    n_files = len(C.load_manifest(p_cow)["files"])
    t0 = time.time()
    man = C.delete_clustered(spark, p_cow, pred, shape=circle)
    cow_s = time.time() - t0
    check(p_cow, "cow")
    report["delete"]["cow"] = {
        "wall_s": round(cow_s, 2),
        "deleted_rows": man["summary"]["deleted_rows"],
        "rewritten_files": man["summary"]["rewritten_files"],
        "untouched_files": man["summary"]["untouched_files"],
        "files_before": n_files,
        "touched_fraction": round(
            man["summary"]["rewritten_files"] / max(n_files, 1), 4
        ),
    }

    # --- naive full rewrite: no per-file stats, no choice ---
    p_naive = build("cow_cap_naive_")
    t0 = time.time()
    listed = C._read_listed(spark, p_naive).drop(C.CELL_COL)
    tmp_out = tempfile.mkdtemp(prefix="cow_cap_naive_out_")
    C.write_clustered(listed.where(~pred), tmp_out, level=14, files=args.files)
    naive_s = time.time() - t0
    check(tmp_out, "naive")
    report["delete"]["naive_full_rewrite"] = {"wall_s": round(naive_s, 2)}
    report["delete"]["speedup"] = round(naive_s / max(cow_s, 1e-9), 2)

    # --- COW upsert: move a region-sized key batch + insert fresh keys.
    # Keys come from a SECOND circle over the SURVIVORS (the first was
    # just deleted from p_cow), so the hit set is spatially local and
    # minimal-rewrite has something to prove. The radius is 800 km: the
    # synthetic lon/lat lattice has only 4096 distinct sites, so a
    # city-sized circle often holds zero of them. ---
    pred2 = (
        haversine_km(F.col("lon"), F.col("lat"), F.lit(-73.97), F.lit(40.75))
        <= F.lit(800.0)
    )
    moved = (
        survivors.where(pred2)
        .withColumn("lon", F.lit(QLON + 10.0))  # new cells
        .withColumn("lat", F.lit(QLAT))
    )
    n_moved = moved.count()
    fresh = moved.select(
        (F.col("pid") + F.lit(10_000_000_000).cast("long")).alias("pid"),
        "lon",
        "lat",
    )
    # materialize the MERGE source before timing — a real upsert batch
    # arrives as data, not as a lazy plan over the target table itself
    up_path = tempfile.mkdtemp(prefix="cow_cap_up_")
    moved.unionByName(fresh).write.mode("overwrite").parquet(up_path)
    up = spark.read.parquet(up_path)
    t0 = time.time()
    man_u = C.upsert_clustered(spark, up, p_cow, key="pid")
    up_s = time.time() - t0
    files_now = man_u["summary"]["untouched_files"] + man_u["summary"][
        "rewritten_files"
    ]
    report["upsert"] = {
        "wall_s": round(up_s, 2),
        "moved_rows": n_moved,
        "replaced_rows": man_u["summary"]["replaced_rows"],
        "incoming_rows": man_u["summary"]["incoming_rows"],
        "rewritten_files": man_u["summary"]["rewritten_files"],
        "untouched_files": man_u["summary"]["untouched_files"],
        "touched_fraction": round(
            man_u["summary"]["rewritten_files"] / max(files_now, 1), 4
        ),
    }
    assert man_u["summary"]["replaced_rows"] == n_moved
    got = C._read_listed(spark, p_cow)
    # n_moved replaced in place + n_moved fresh inserts = net +n_moved
    assert got.count() == want_rows + n_moved

    out = json.dumps(report)
    print(out)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(out + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
