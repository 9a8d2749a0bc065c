"""Streaming audio ingest: stream==batch equality for the windowed
per-cell loudness rollup, and 1:1 feature/ts carry-through."""

from __future__ import annotations

import glob
import shutil as sh
import uuid

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def audio_dir(spark, tmp_path_factory):
    """Flat dir of parquet audio files (payload + ts) for the file source."""
    from spatial4n_spark.sources.audio import audio_df

    d = tmp_path_factory.mktemp("audio_stream_src")
    with_ts = audio_df(spark, 400, partitions=2).withColumn(
        "ts",
        F.to_timestamp(F.lit("2026-03-01 00:00:00"))
        + (F.col("n_samples") % 7200).cast("int") * F.expr("INTERVAL 1 SECOND"),
    )
    with_ts.where(F.col("sample_rate") != 44100).write.parquet(f"{d}/f0")
    with_ts.where(F.col("sample_rate") == 44100).write.parquet(f"{d}/f1")
    flat = tmp_path_factory.mktemp("audio_stream_flat")
    n = 0
    for f in glob.glob(f"{d}/f*/part-*.parquet"):
        sh.copy(f, flat / f"part-{n:03d}.parquet")
        n += 1
    return str(flat)


def test_streaming_audio_features_one_to_one(spark, audio_dir):
    """Features are 1:1 with input rows; ts and cell carry through, and
    values equal the batch operator's."""
    from spatial4n_spark.operators.av import audio_features
    from spatial4n_spark.streaming.audio_stream import streaming_audio_features

    batch = spark.read.parquet(audio_dir)
    got = (
        streaming_audio_features(batch, cell_level=3)
        .toPandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    want = (
        audio_features(batch.drop("ts"))
        .toPandas()
        .sort_values("audio_id")
        .reset_index(drop=True)
    )
    assert len(got) == batch.count()
    for c in ["codec", "n_samples", "zc", "peak", "energy", "energy_ds", "rms"]:
        assert (got[c].values == want[c].values).all(), c
    assert got.cell.str.len().eq(3).all()
    assert got.ts.notna().all()


def test_streaming_audio_loudness_equals_batch(spark, audio_dir, tmp_path):
    """Streamed decode->features->windowed rollup == batch over the same
    rows (exact integer sums; bit-equality by construction)."""
    from spatial4n_spark.streaming.audio_stream import (
        audio_as_stream,
        streaming_audio_features,
        streaming_audio_loudness,
    )

    stream = audio_as_stream(spark, audio_dir, max_files_per_trigger=1)
    agg = streaming_audio_loudness(stream, cell_level=3, window="1 hour")
    name = f"mem_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory").queryName(name).outputMode("complete")
        .option("checkpointLocation", f"{tmp_path}/caud")
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(300)
    got = spark.sql(
        f"select window.start as ws, cell, n_clips, sum_samples, sum_energy, "
        f"max_peak from {name}"
    ).toPandas()

    feats = streaming_audio_features(spark.read.parquet(audio_dir), cell_level=3)
    want = (
        feats.groupBy(F.window("ts", "1 hour").alias("window"), "cell")
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("n_samples").cast("long")).alias("sum_samples"),
            F.sum("energy").alias("sum_energy"),
            F.max("peak").alias("max_peak"),
        )
        .select(
            F.col("window.start").alias("ws"), "cell",
            "n_clips", "sum_samples", "sum_energy", "max_peak",
        )
        .toPandas()
    )
    key = ["ws", "cell"]
    got = got.sort_values(key).reset_index(drop=True)
    want = want.sort_values(key).reset_index(drop=True)
    assert len(got) == len(want) and len(got) > 0
    for c in ["n_clips", "sum_samples", "sum_energy", "max_peak"]:
        assert (got[c].values == want[c].values).all(), c
