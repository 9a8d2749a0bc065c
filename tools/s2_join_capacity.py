"""Capacity smoke for the S2-index PIP join (BENCH.md evidence).

Streams N generated points (hot clusters + dateline/polar bands — the
same distribution as the round-1 geohash 20M smoke) through the
broadcast cell-cover PIP join with ``index="s2"`` against the 11-shape
layer, and reports sustained rows/sec.  Points are generated inside the
scan stage (spark.range -> columns), so nothing is collected or cached:
memory is flat and the per-partition plan is size-independent.

Usage: python tools/s2_join_capacity.py [--rows 20000000] [--parts 256]
       [--index s2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=20_000_000)
    ap.add_argument("--parts", type=int, default=256)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--index", default="s2", choices=["s2", "geohash"])
    ap.add_argument("--level", type=int, default=3)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("s2-join-capacity")
        .config("spark.sql.shuffle.partitions", str(2 * args.cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons
    from spatial4n_spark.suite import layer

    def pts():
        r = spark.range(0, args.rows, 1, args.parts)
        # mixed distribution: 1/4 Paris hot cluster, 1/4 Tokyo hot
        # cluster, 1/4 dateline band, 1/4 global (incl. polar)
        h = F.hash(F.col("id"))
        u1 = (F.pmod(h, F.lit(100_000)) / 100_000.0)
        u2 = (F.pmod(F.hash(F.col("id"), F.lit(7)), F.lit(100_000)) / 100_000.0)
        bucket = F.pmod(F.col("id"), F.lit(4))
        lon = (
            F.when(bucket == 0, 2.0 + u1)
            .when(bucket == 1, 139.5 + u1)
            .when(bucket == 2, 179.0 + u1 * 2.0 - F.lit(360.0) * (u1 > 0.5).cast("int"))
            .otherwise(u1 * 360.0 - 180.0)
        )
        lat = (
            F.when(bucket == 0, 48.5 + u2)
            .when(bucket == 1, 35.3 + u2)
            .when(bucket == 2, u2 * 120.0 - 60.0)
            .otherwise(u2 * 180.0 - 90.0)
        )
        return r.select(F.col("id"), lon.alias("lon"), lat.alias("lat"))

    # warm-up (JVM, Python workers, cover cache)
    spatial_join_points_polygons(
        pts().limit(200_000), layer(), level=args.level, index=args.index
    ).count()

    t0 = time.time()
    n = spatial_join_points_polygons(
        pts(), layer(), level=args.level, index=args.index
    ).count()
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "job": f"pip_join_{args.index}_capacity",
                "rows_in": args.rows,
                "matches": n,
                "sec": round(dt, 1),
                "rows_per_sec": round(args.rows / dt, 1),
                "cpus": args.cpus,
                "partitions": args.parts,
                "level": args.level,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
