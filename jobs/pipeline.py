"""End-to-end resumable pipeline job (spark-submit entrypoint).

    zip -r /tmp/spatial4n_spark.zip spatial4n_spark
    spark-submit --master 'local[8]' --py-files /tmp/spatial4n_spark.zip \
        jobs/pipeline.py --rows 100000 --ckpt /tmp/s4n_ckpt

Stages (each snapshot-checkpointed; re-running skips committed stages,
changing --rows/--level invalidates exactly the affected snapshots):

  images      deterministic image+caption table (the Iceberg-scan stand-in)
  decode      decode gate results (PSNR>=40dB + caption equality)
  tiles       raster chips -> per-cell mosaic aggregates
  pip         point-in-polygon join of image locations vs the layer
  tile_stats  salted per-cell image counts

Exits with a one-line JSON summary + the per-partition lineage/metrics
table row count.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=100_000)
    ap.add_argument("--level", type=int, default=4)
    ap.add_argument("--ckpt", type=str, default="/tmp/s4n_ckpt")
    ap.add_argument("--partitions", type=int, default=32)
    ap.add_argument("--master", type=str, default=None)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    b = SparkSession.builder.appName("spatial4n-pipeline")
    if args.master:
        b = b.master(args.master)
    spark = (
        b.config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from spatial4n_spark.checkpoint import SnapshotStore, fingerprint
    from spatial4n_spark.operators.raster import cell_mosaic_stats, decode_check, tile_images
    from spatial4n_spark.operators.spatial_join import spatial_join_points_polygons
    from spatial4n_spark.operators.tiles import tile_stats
    from spatial4n_spark.sources.images import images_df
    from spatial4n_spark.suite import layer

    store = SnapshotStore(args.ckpt)

    fp_images = fingerprint("images", args.rows, args.partitions)
    images = store.resume_or_compute(
        spark, "images", fp_images,
        lambda: images_df(spark, args.rows, partitions=args.partitions),
        {"rows": args.rows},
    )

    fp_decode = fingerprint("decode", fp_images, args.level)
    decode = store.resume_or_compute(
        spark, "decode", fp_decode,
        lambda: decode_check(images, level=args.level),
        {"level": args.level},
    )

    fp_tiles = fingerprint("tiles", fp_images, args.level, 8)
    tiles = store.resume_or_compute(
        spark, "tiles", fp_tiles,
        lambda: cell_mosaic_stats(tile_images(images, args.level, 8, min_psnr_db=40.0)),
        {"level": args.level, "chip_px": 8},
    )

    fp_pip = fingerprint("pip", fp_images, 3)
    pip = store.resume_or_compute(
        spark, "pip", fp_pip,
        lambda: spatial_join_points_polygons(
            images.select("image_id", "lon", "lat", "phash"), layer(), level=3
        ),
        {"level": 3},
    )

    fp_stats = fingerprint("tile_stats", fp_images, args.level)
    stats = store.resume_or_compute(
        spark, "tile_stats", fp_stats,
        lambda: tile_stats(
            images.select("lon", "lat", "phash"),
            level=args.level, salt_buckets=8, salt_col="phash",
        ),
        {"level": args.level, "salt_buckets": 8},
    )

    # clustered storage layout of the image locations (sort-by-S2-id +
    # Iceberg-style stats manifest, io/clustered.py) — the layout later
    # queries scan-prune against; rebuilt only when the images change.
    # Lives BESIDE the snapshot store (its root holds only
    # <stage>/snap_<fp> dirs), gated by the shared build-once cache.
    from spatial4n_spark.io.buildonce import ensure_built
    from spatial4n_spark.io.clustered import (
        MANIFEST,
        clustered_radius_query,
        write_clustered,
    )

    clu_dir = ensure_built(
        args.ckpt.rstrip("/") + "_clustered_images",
        fingerprint("clustered", fp_images, 14, args.partitions),
        lambda p: write_clustered(
            images.select("image_id", "lon", "lat"), p, level=14, files=args.partitions
        ),
        ready_file=MANIFEST,
    )
    radius_hits = clustered_radius_query(spark, clu_dir, 2.3125, 48.875, 150.0).count()

    gate_fail = decode.where(
        (F.col("psnr_db") < 40.0) | ~F.col("caption_ok")
    ).count()
    metrics = store.metrics(spark)
    print(json.dumps({
        "images": images.count(),
        "decode_gate_failures": gate_fail,
        "mosaic_cells": tiles.count(),
        "pip_matches": pip.count(),
        "stat_cells": stats.count(),
        "clustered_radius_hits": radius_hits,
        "lineage_rows": metrics.count(),
        "stages_committed": sorted(os.listdir(args.ckpt)),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
