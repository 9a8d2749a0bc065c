"""Structured-Streaming throughput bench for the image ingest path.

Measures the streamed decode -> PSNR/caption gate -> chip -> watermarked
windowed mosaic pipeline (streaming/image_stream.py) end-to-end with a
file source (N parquet files, maxFilesPerTrigger batches) and a parquet
sink + checkpoint — the full state-store path, not just the stateless
stages. Prints one JSON line with micro-batch count and images/sec.

Usage: python tools/stream_bench.py [--rows 200000] [--files 16] [--cpus 32]
"""

from __future__ import annotations

import argparse
import glob
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--files", type=int, default=16)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--files-per-trigger", type=int, default=4)
    args = ap.parse_args()

    from pyspark.sql import SparkSession, functions as F

    from spatial4n_spark.sources.images import images_df
    from spatial4n_spark.streaming.image_stream import (
        images_as_stream,
        streaming_image_mosaics,
    )

    spark = (
        SparkSession.builder.master(f"local[{args.cpus}]")
        .appName("stream-bench")
        .config("spark.sql.shuffle.partitions", str(max(args.cpus, 8)))
        .config("spark.sql.adaptive.enabled", "false")  # streaming: static plans
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    work = tempfile.mkdtemp(prefix="streambench_")
    src = f"{work}/src"
    try:
        # deterministic image rows + event time, split into N source files
        base = images_df(spark, args.rows, with_bytes=True, partitions=args.files)
        with_ts = base.withColumn(
            "ts",
            F.to_timestamp(F.lit("2026-01-01 00:00:00"))
            + (F.col("phash") % 7200).cast("int") * F.expr("INTERVAL 1 SECOND"),
        )
        with_ts.write.parquet(src)
        n_files = len(glob.glob(f"{src}/part-*.parquet"))

        # warm the Python workers/codegen on a small batch (cold JVM start
        # is process cost, not pipeline throughput)
        from spatial4n_spark.streaming.image_stream import streaming_image_chips

        streaming_image_chips(spark.read.parquet(src).limit(2000)).count()

        stream = images_as_stream(spark, src, max_files_per_trigger=args.files_per_trigger)
        agg = streaming_image_mosaics(stream, level=4, window="1 hour", watermark="2 hours")
        t0 = time.time()
        q = (
            agg.writeStream.format("parquet")
            .option("path", f"{work}/sink")
            .option("checkpointLocation", f"{work}/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(1800)
        dt = time.time() - t0
        batches = q.lastProgress["batchId"] + 1 if q.lastProgress else None
        print(
            json.dumps(
                {
                    "bench": "streaming image ingest (decode+gate+chip+windowed mosaic)",
                    "rows": args.rows,
                    "source_files": n_files,
                    "files_per_trigger": args.files_per_trigger,
                    "micro_batches": batches,
                    "sec": round(dt, 2),
                    "images_per_sec": round(args.rows / dt, 1),
                    "cpus": args.cpus,
                }
            )
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
