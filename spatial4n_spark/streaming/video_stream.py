"""Structured-Streaming video ingest: the stream twin of the video
scene pipeline (decode -> frame-sample + scene-cut detection ->
watermarked windowed per-cell rollup) over a stream of video rows.

Same design as streaming/audio_stream.py: the stateless stage reuses
the batch detector row-for-row (features are 1:1 with input rows, so
the event timestamp and geohash cell carry through positionally), and
the only stateful operator is the watermarked windowed groupBy on
bounded (window, cell) keys with exact integer sums — finalized windows
are bit-equal to the batch aggregate. Payload bytes never enter the
state store.
"""

from __future__ import annotations

from typing import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.sources.video import VIDEO_SCHEMA

VIDEO_TS_SCHEMA = VIDEO_SCHEMA + ", ts timestamp"
SCENES_TS_SCHEMA = (
    "video_id string, fps int, n_frames int, n_scene_markers int, "
    "n_cuts int, diff_total long, n_sampled int, bright_sampled long, "
    "cell string, ts timestamp"
)


def video_as_stream(
    spark: SparkSession, video_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream over parquet video files (payload + ts)."""
    return (
        spark.readStream.schema(VIDEO_TS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(video_dir)
    )


def streaming_video_scenes(
    stream: DataFrame, cell_level: int = 3, chunk_rows: int = 1024
) -> DataFrame:
    """Stateless decode -> scene/sampling features over a video stream."""
    from spatial4n_spark.kernels.geohash import geohash_encode_str
    from spatial4n_spark.operators.av import video_chunk_scenes

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                chunk = batch.slice(s, chunk_rows)
                feats = video_chunk_scenes(chunk)
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

    return stream.mapInArrow(run, SCENES_TS_SCHEMA)


def streaming_video_rollup(
    stream: DataFrame,
    cell_level: int = 3,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked windowed per-cell video rollup: clip counts, detected
    cuts, sampled brightness — exact integer sums, stream==batch."""
    feats = streaming_video_scenes(stream, cell_level=cell_level)
    return (
        feats.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("window"), F.col("cell"))
        .agg(
            F.count(F.lit(1)).alias("n_videos"),
            F.sum(F.col("n_frames").cast("long")).alias("sum_frames"),
            F.sum(F.col("n_cuts").cast("long")).alias("sum_cuts"),
            F.sum("bright_sampled").alias("sum_bright"),
        )
    )
