"""Scaling-efficiency evidence (BASELINE.json north_rule).

The sandbox has no multi-executor cluster, so the two-cluster-size
criterion is evidenced by running the SAME job at two parallelism levels
(local[8] vs local[32]) on the SAME input and reporting throughput at
both plus efficiency = (rate_32 / rate_8) / (32/8).

The job is the raster pipeline (decode -> PSNR/caption gate -> chip ->
per-cell mosaic agg) over N deterministic synthetic images in P
partitions — CPU-bound per-partition work with one small aggregation
shuffle, i.e. the shape of the design-scale workload.

Each parallelism level runs in a fresh JVM (subprocess) so executor
thread-pool sizing is honest. Results print as JSON and are written into
BENCH.md by the caller (or --write).

Usage: python tools/scaling_bench.py [--rows 400000] [--write]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys

RUNNER = r"""
import json, sys, time
cpus, rows, parts, job = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
reps = int(sys.argv[5]) if len(sys.argv) > 5 else 3
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master(f"local[{cpus}]")
    .appName(f"scaling-{cpus}")
    .config("spark.sql.shuffle.partitions", str(max(2 * cpus, 8)))
    .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    .config("spark.driver.memory", "24g")
    .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from spatial4n_spark.sources.images import images_df
from spatial4n_spark.operators.raster import generate_raster_pipeline, raster_pipeline
from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons
from spatial4n_spark.suite import layer

def run_job(n):
    if job == "raster":
        # fused generate->decode->gate->chip->agg (bytes never cross Arrow)
        return generate_raster_pipeline(spark, n, level=4, chip_px=8, partitions=parts).count()
    if job == "raster_scan":
        # source-table form: image rows cross the Arrow boundary into the
        # decode stage, as a parquet/Iceberg scan feeding decode would
        return raster_pipeline(images_df(spark, n, partitions=parts), level=4, chip_px=8).count()
    if job == "pip":
        pts = images_df(spark, n, with_bytes=False, partitions=parts).select("image_id", "lon", "lat")
        return spatial_join_points_polygons(pts, layer(), level=3).count()
    raise ValueError(job)

# warm-up: spin Python workers + JIT on a small slice
run_job(4000)
# best-of-3: the sandbox is a shared VM with noisy neighbors; min time is
# the standard throughput estimate under external interference
times, out = [], 0
for _ in range(reps):
    t0 = time.time()
    out = run_job(rows)
    times.append(time.time() - t0)
dt = min(times)
print(json.dumps({"cpus": cpus, "rows": rows, "partitions": parts, "job": job,
                  "rows_out": out, "sec": round(dt, 3),
                  "all_runs_sec": [round(t, 3) for t in times],
                  "rows_per_sec": round(rows / dt, 1)}))
"""


def run_level(cpus: int, rows: int, parts: int, job: str = "raster", reps: int = 3) -> dict:
    res = subprocess.run(
        [sys.executable, "-c", RUNNER, str(cpus), str(rows), str(parts), job, str(reps)],
        capture_output=True, text=True, check=True, cwd=".",
    )
    line = res.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=400_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--levels", type=str, default="8,32")
    ap.add_argument("--job", type=str, default="raster", choices=["raster", "raster_scan", "pip"])
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--write", action="store_true", help="append results to BENCH.md")
    args = ap.parse_args()

    levels = [int(x) for x in args.levels.split(",")]
    results = [run_level(c, args.rows, args.partitions, args.job, args.reps) for c in levels]
    lo, hi = results[0], results[-1]
    eff = (hi["rows_per_sec"] / lo["rows_per_sec"]) / (hi["cpus"] / lo["cpus"])
    summary = {
        "job": args.job + {
            "raster": " (fused decode+gate+chip+cell-agg)",
            "raster_scan": " (scan->decode+gate+chip+cell-agg)",
            "pip": " (cell-cover broadcast join + exact PIP)",
        }[args.job],
        "rows": args.rows,
        "partitions": args.partitions,
        "levels": results,
        "scaling_efficiency": round(eff, 3),
        "criterion": ">= 0.8 between N and 4N parallelism (north_rule)",
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    if args.write:
        rows_md = "\n".join(
            f"| local[{r['cpus']}] | {r['rows']} | {r['partitions']} | "
            f"{r['sec']} | {r['rows_per_sec']} |"
            for r in results
        )
        with open("BENCH.md", "a") as f:
            f.write(
                f"""
## Scaling efficiency run ({args.rows} rows, job={args.job})

| parallelism | input rows | partitions | sec | rows/sec |
|---|---|---|---|---|
{rows_md}

Scaling efficiency (rate_{hi['cpus']} / rate_{lo['cpus']}) / ({hi['cpus']}/{lo['cpus']}) =
**{eff:.3f}** (criterion >= 0.8: {"PASS" if eff >= 0.8 else "FAIL"}).
"""
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
