"""Streaming video ingest: stream==batch equality for the windowed
per-cell rollup."""

from __future__ import annotations

import glob
import shutil as sh
import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def video_dir(spark, tmp_path_factory):
    from spatial4n_spark.sources.video import video_df

    d = tmp_path_factory.mktemp("video_stream_src")
    with_ts = video_df(spark, 300, partitions=2).withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-03-01 00:00:00"))
        + (F.col("n_frames") * 211 % 7200).cast("int") * F.expr("INTERVAL 1 SECOND"),
    )
    with_ts.where(F.col("fps") == 24).write.parquet(f"{d}/f0")
    with_ts.where(F.col("fps") != 24).write.parquet(f"{d}/f1")
    flat = tmp_path_factory.mktemp("video_stream_flat")
    n = 0
    for f in glob.glob(f"{d}/f*/part-*.parquet"):
        sh.copy(f, flat / f"part-{n:03d}.parquet")
        n += 1
    return str(flat)


def test_streaming_video_rollup_equals_batch(spark, video_dir, tmp_path):
    from spatial4n_spark.streaming.video_stream import (
        streaming_video_scenes,
        streaming_video_rollup,
        video_as_stream,
    )

    stream = video_as_stream(spark, video_dir, max_files_per_trigger=1)
    agg = streaming_video_rollup(stream, cell_level=3, window="1 hour")
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/cvid")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        f"select window.start as ws, cell, n_videos, sum_frames, sum_cuts, "
        f"sum_bright from {name}"
    ).toPandas()

    feats = streaming_video_scenes(spark.read.parquet(video_dir), cell_level=3)
    want = (
        feats.groupBy(F.window("ts", "1 hour").alias("window"), "cell")
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum(F.col("n_frames").cast("long")).alias("sum_frames"),
            F.sum(F.col("n_cuts").cast("long")).alias("sum_cuts"),
            F.sum("bright_sampled").alias("sum_bright"),
        )
        .select(
            F.col("window.start").alias("ws"), "cell",
            "n_videos", "sum_frames", "sum_cuts", "sum_bright",
        )
        .toPandas()
    )
    key = ["ws", "cell"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    # detector found real cuts somewhere in the corpus
    assert want.sum_cuts.sum() > 0
    for c in ["n_videos", "sum_frames", "sum_cuts", "sum_bright"]:
        assert (got[c].values == want[c].values).all(), c
