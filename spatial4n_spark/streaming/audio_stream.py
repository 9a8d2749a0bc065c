"""Structured-Streaming audio ingest: the stream twin of the audio
feature pipeline (decode -> feature extraction -> watermarked windowed
per-cell loudness aggregation) over a stream of audio rows (binary
payload + metadata + event timestamp).

Design mirrors streaming/image_stream.py:
- decode + features run the SAME vectorized Arrow kernel as the batch
  operator (operators.av._audio_feature_batch) — stateless, applied per
  micro-batch; features are 1:1 with input rows so the event timestamp
  and the geohash cell (computed in the same numpy pass from lon/lat)
  carry through positionally;
- the only stateful operator is the watermarked windowed groupBy on
  (window, cell) — bounded keys, exact integer partial sums, so a
  finalized window is bit-equal to the batch aggregate over the same
  rows;
- payload bytes never enter the state store: only per-clip integer
  features reach the shuffle.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.sources.audio import AUDIO_SCHEMA

AUDIO_TS_SCHEMA = AUDIO_SCHEMA + ", ts timestamp"
FEATURES_TS_SCHEMA = (
    "audio_id string, codec string, sample_rate int, n_samples int, "
    "zc int, peak int, energy long, energy_ds long, rms double, "
    "cell string, ts timestamp"
)


def audio_as_stream(
    spark: SparkSession, audio_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over parquet audio files (payload + ts)."""
    return (
        spark.readStream.schema(AUDIO_TS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(audio_dir)
    )


def streaming_audio_features(
    stream: DataFrame, cell_level: int = 3, chunk_rows: int = 2048
) -> DataFrame:
    """Stateless decode -> features over an audio stream (batch kernel
    unchanged per micro-batch); output is 1:1 with input rows, with the
    geohash cell and event timestamp attached."""
    from spatial4n_spark.kernels.geohash import geohash_encode_str
    from spatial4n_spark.operators.av import audio_chunk_features

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                chunk = batch.slice(s, chunk_rows)
                feats = audio_chunk_features(chunk)
                cell = geohash_encode_str(
                    chunk.column("lat").to_numpy(),
                    chunk.column("lon").to_numpy(),
                    cell_level,
                )
                yield pa.RecordBatch.from_arrays(
                    list(feats.columns)
                    + [pa.array(cell, pa.string()), chunk.column("ts")],
                    names=list(feats.schema.names) + ["cell", "ts"],
                )

    return stream.mapInArrow(run, FEATURES_TS_SCHEMA)


def streaming_audio_loudness(
    stream: DataFrame,
    cell_level: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-cell loudness rollup of an audio stream.

    Returns (window, cell, n_clips, sum_samples, sum_energy, max_peak) —
    exact integer reductions, order-independent, so finalized windows are
    bit-equal to the batch aggregate."""
    feats = streaming_audio_features(stream, cell_level=cell_level)
    return (
        feats.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("window"), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_clips"),
            F.sum(F.col("n_samples").cast("long")).alias("sum_samples"),
            F.sum("energy").alias("sum_energy"),
            F.max("peak").alias("max_peak"),
        )
    )
