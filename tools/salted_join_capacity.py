"""Hot-cell skew evidence for the EXPLICIT salted PIP join
(operators/spatial_join.spatial_join_points_polygons_df, salt_buckets=).

Builds a deliberately skewed point table — ``--hot-frac`` of all points
land inside ONE city cell (Paris), the rest spread uniformly — joins it
against a polygon layer whose hot polygon fully covers that cell, and
times the join unsalted (salt_buckets=1) vs salted, with AQE's own
skew-join splitting DISABLED so the measurement isolates the explicit
salt (in production you'd leave AQE on as the adaptive fallback; the
north rule asks for the explicit mechanism, BASELINE.json:14 "salted
repartitioning").

Reported per variant:
  - wall seconds for the full join (count action, best of --reps),
  - the join-reducer row histogram (rows per output partition via
    spark_partition_id(): max / p50 / nonzero partitions) — the
    unsalted run shows one partition holding ~all hot-cell rows (the
    straggler task); the salted run shows it spread across
    ``salt_buckets`` reducers,
  - result equality: row count + order-independent xxhash64 checksum
    over every output column must match between variants every rep.

Usage: python tools/salted_join_capacity.py [--points 8000000]
         [--hot-frac 0.5] [--salt 32] [--reps 2]
Prints one JSON line (and appends it to --out if given).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

HOT_LON, HOT_LAT = 2.3522, 48.8566  # Paris


def point_frame(spark, n: int, hot_frac: float):
    """Deterministic skewed points: ids < n*hot_frac jitter within
    ~0.02 deg of the hot center (one level-5 cell), the rest uniform."""
    from typing import Iterator

    import pyarrow as pa

    n_hot = int(n * hot_frac)

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        import numpy as np

        from spatial4n_spark.sources.images import synth_coords

        for batch in it:
            ids = batch.column(0).to_numpy()
            lon, lat = synth_coords(ids + 31_337)
            hot = ids < n_hot
            # map the synth coords into a +-0.02 deg jitter box for the
            # hot share (same deterministic stream, rescaled)
            lon = np.where(hot, HOT_LON + (lon / 180.0) * 0.02, lon)
            lat = np.where(hot, HOT_LAT + (lat / 90.0) * 0.02, lat)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(ids, pa.int64()),
                    pa.array(lon, pa.float64()),
                    pa.array(lat, pa.float64()),
                ],
                names=["pid", "lon", "lat"],
            )

    return spark.range(n).mapInArrow(gen, "pid long, lon double, lat double")


def layer_frame(spark, n_poly: int = 64):
    """Polygon layer: one big square fully covering the hot cell plus
    uniform small squares elsewhere (deterministic grid)."""
    rows = [("hot", f"POLYGON (({HOT_LON - 1} {HOT_LAT - 1}, {HOT_LON + 1} {HOT_LAT - 1}, "
             f"{HOT_LON + 1} {HOT_LAT + 1}, {HOT_LON - 1} {HOT_LAT + 1}, "
             f"{HOT_LON - 1} {HOT_LAT - 1}))")]
    for i in range(n_poly - 1):
        cx = -170.0 + (i % 16) * 21.0
        cy = -72.0 + (i // 16) * 36.0
        rows.append(
            (
                f"p{i:03d}",
                f"POLYGON (({cx - 4} {cy - 4}, {cx + 4} {cy - 4}, {cx + 4} {cy + 4}, "
                f"{cx - 4} {cy + 4}, {cx - 4} {cy - 4}))",
            )
        )
    return spark.createDataFrame(rows, "poly_id string, wkt string")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--points", type=int, default=8_000_000)
    ap.add_argument("--hot-frac", type=float, default=0.5)
    ap.add_argument("--salt", type=int, default=32)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--shuffle-parts", type=int, default=64)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .config("spark.sql.shuffle.partitions", str(args.shuffle_parts))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "16g")
        # isolate the EXPLICIT salt: no AQE partition coalescing or
        # skew-join splitting reshaping the reducers under us
        .config("spark.sql.adaptive.enabled", "false")
        # the skew scenario is the beyond-broadcast regime (a 10^6-
        # feature layer's cover can't broadcast); emulate it at harness
        # layer size by forcing the shuffle join the big layer would get
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.operators.spatial_join import (
        spatial_join_points_polygons_df,
    )

    pts = point_frame(spark, args.points, args.hot_frac).localCheckpoint()
    layer = layer_frame(spark).localCheckpoint()

    def run(salt: int):
        out = spatial_join_points_polygons_df(
            pts, layer, level=args.level, index="geohash", salt_buckets=salt
        )
        best = float("inf")
        n = None
        for _ in range(args.reps):
            t0 = time.time()
            n = out.count()
            best = min(best, time.time() - t0)
        # join-reducer histogram: refine (mapInPandas) is 1:1 with the
        # join's output partitions, so spark_partition_id() here IS the
        # reducer that processed those candidate rows
        hist = (
            out.groupBy(F.spark_partition_id().alias("part"))
            .count()
            .orderBy(F.col("count").desc())
            .collect()
        )
        counts = sorted((int(r["count"]) for r in hist), reverse=True)
        chk = out.select(
            F.expr("bit_xor(xxhash64(pid, lon, lat, poly_id))").alias("c")
        ).collect()[0]["c"]
        return {
            "salt_buckets": salt,
            "sec": round(best, 2),
            "rows_out": n,
            "checksum": int(chk),
            "reducer_rows_max": counts[0],
            "reducer_rows_p50": counts[len(counts) // 2],
            "reducers_nonzero": len(counts),
        }

    unsalted = run(1)
    salted = run(args.salt)
    assert unsalted["rows_out"] == salted["rows_out"], "row counts diverge"
    assert unsalted["checksum"] == salted["checksum"], "result contents diverge"

    rec = {
        "bench": "salted PIP join vs hot-cell skew (AQE off; equality asserted)",
        "points": args.points,
        "hot_frac": args.hot_frac,
        "level": args.level,
        "cpus": args.cpus,
        "shuffle_partitions": args.shuffle_parts,
        "unsalted": unsalted,
        "salted": salted,
        "speedup": round(unsalted["sec"] / salted["sec"], 2),
        "straggler_defused_rows": f"{unsalted['reducer_rows_max']} -> {salted['reducer_rows_max']}",
    }
    line = json.dumps(rec, separators=(",", ":"))
    print(line)
    if args.out:
        with open(args.out, "a") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
