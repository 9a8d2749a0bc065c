"""Write-audit-publish capacity probe (io/clustered.py branches).

Measures the WAP lifecycle on a table scaled by --mult, showing the
claim that matters at design scale: staging costs what the BATCH costs
(data files + one manifest write), auditing is an ordinary branch read,
and PUBLISH is one atomic manifest cut-over — metadata-only, constant
in both table size and staged volume.  Run at two --mult values and
compare t_publish to evidence the O(1).

Isolation is asserted, not assumed: the main-state radius answer (an
order-independent checksum) must be IDENTICAL before the branch, with
the branch live, and after staged commits; only publish may change it,
and afterwards it must equal base+batch exactly.

Usage: python tools/wap_capacity.py [--sf /root/testdata/sf0.1]
       [--mult 4] [--files 64] [--out bench_runs/wap_cap.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--mult", type=int, default=4)
    ap.add_argument("--files", type=int, default=64)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("wap-capacity")
        .config("spark.sql.shuffle.partitions", str(args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.io import clustered as C
    from spatial4n_spark.suite import RADIUS_CENTERS, pts_orders

    pts = pts_orders(spark, args.sf).toDF("pid", "lon", "lat")
    if args.mult > 1:
        reps = spark.range(args.mult).select(F.col("id").alias("_rep"))
        pts = pts.crossJoin(F.broadcast(reps)).select(
            (F.col("pid") * args.mult + F.col("_rep")).alias("pid"),
            "lon",
            "lat",
        )
    n_base = pts.count()
    # the staged batch: same spatial distribution, keys shifted past the
    # base key space — every query circle gains staged rows on publish
    off = n_base * args.mult + 1
    batch = pts.where(F.col("pid") % 16 == 0).select(
        (F.col("pid") + off).alias("pid"), "lon", "lat"
    )
    n_batch = batch.count()

    path = tempfile.mkdtemp(prefix="wap_cap_")
    t0 = time.time()
    C.write_clustered(pts, path, level=14, files=args.files)
    t_write = time.time() - t0

    def answer(snapshot_id=None):
        """Order-independent checksum + count of every query circle."""
        total, chk = 0, 0
        for _qid, qlon, qlat, r_km in RADIUS_CENTERS:
            df = C.clustered_radius_query(
                spark, path, qlon, qlat, r_km, snapshot_id=snapshot_id
            )
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.expr("bit_xor(xxhash64(pid))").alias("h"),
            ).collect()[0]
            total += int(row["n"])
            chk ^= int(row["h"] or 0)
        return total, chk

    base_ans = answer()

    t0 = time.time()
    C.create_branch(path, "staging")
    t_branch = time.time() - t0

    t0 = time.time()
    C.append_clustered(batch, path, files=max(4, args.files // 8),
                       branch="staging")
    t_stage = time.time() - t0

    # isolation: main answer unchanged with staged commits live
    assert answer() == base_ans, "staged commit leaked into main state"
    t0 = time.time()
    staged_ans = answer(snapshot_id="staging")
    t_audit = time.time() - t0
    assert staged_ans[0] > base_ans[0], "branch read missed staged rows"

    t0 = time.time()
    pub = C.fast_forward_clustered(path, "staging")
    t_publish = time.time() - t0
    post_ans = answer()
    assert post_ans == staged_ans, "published state != audited state"

    man_bytes = os.path.getsize(os.path.join(path, C.MANIFEST))
    out = {
        "tool": "wap_capacity",
        "sf": args.sf,
        "mult": args.mult,
        "rows_base": n_base,
        "rows_staged": n_batch,
        "files": args.files,
        "t_write_base_s": round(t_write, 3),
        "t_create_branch_s": round(t_branch, 4),
        "t_stage_append_s": round(t_stage, 3),
        "t_audit_read_s": round(t_audit, 3),
        "t_publish_s": round(t_publish, 4),
        "published": pub,
        "manifest_bytes": man_bytes,
        "isolation": "main answer identical across branch+stage; "
        "publish == audited state (asserted)",
    }
    print(json.dumps(out))
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
