"""Audio / video feature-extraction operators (multimodal pipeline arms).

Two forms per modality, mirroring operators/raster.py:

- table form (``audio_features`` / ``video_scenes``): consumes a payload
  DataFrame (binary column crosses Arrow once, decoded per batch) — the
  shape of a parquet/Iceberg scan feeding the extractor;
- fused form (``generate_audio_features`` / ``generate_video_scenes``):
  generation + decode + features in ONE Python stage over spark.range —
  payload bytes never cross the Arrow boundary. This is the gate/bench
  path and the 100-TB design shape (extractor runs where the bytes are).

All features reduce to exact integers (zero crossings, peaks, energy
sums, scene-cut counts, sampled-brightness sums) plus one
division+sqrt for RMS — bit-identical between numpy and the DuckDB
oracle (oracles_av.py) because both engines reduce exact integers and
round once.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame

from spatial4n_spark.sources.audio import audio_meta, decode_audio
from spatial4n_spark.sources.video import (
    decode_video,
    scene_index,
    video_frames,
    video_meta,
)

AUDIO_FEATURES_SCHEMA = (
    "audio_id string, codec string, sample_rate int, n_samples int, "
    "zc int, peak int, energy long, energy_ds long, rms double"
)

VIDEO_SCENES_SCHEMA = (
    "video_id string, fps int, n_frames int, n_scene_markers int, "
    "n_cuts int, diff_total long, n_sampled int, bright_sampled long"
)

CUT_THRESHOLD = 1000  # within-scene jitter diff <= 192; cross-cut ~5400
SAMPLE_EVERY = 4  # frame-sampling stride


def _audio_feature_batch(
    audio_id: list[str],
    codec: list[str],
    rate: np.ndarray,
    n_samples: np.ndarray,
    samples: np.ndarray,
    offsets: np.ndarray,
) -> pa.RecordBatch:
    """Vectorized features over a concatenated sample buffer.

    ``samples``: int32 biased samples for all rows back-to-back;
    ``offsets``: int64 row start indices (len = n_rows, offsets[0] = 0).
    """
    total = len(samples)
    n_rows = len(offsets)
    ends = np.append(offsets[1:], total)
    counts = ends - offsets
    empty = counts == 0

    # reduceat needs strictly-valid segment starts (< total) and
    # misattributes a zero-width segment to the NEXT row's first element
    # (and raises on a start == total), so reduce over the NONEMPTY rows
    # only and scatter back — empty rows (metadata-only tables, corrupt
    # records) get zeroed features.
    energy = np.zeros(n_rows, dtype=np.int64)
    peak = np.zeros(n_rows, dtype=np.int64)
    zc = np.zeros(n_rows, dtype=np.int64)
    eds = np.zeros(n_rows, dtype=np.int64)
    nz = ~empty
    if total > 0 and nz.any():
        off_nz = offsets[nz]  # strictly increasing, all < total: adjacent
        # empty rows have zero width, so consecutive nonempty offsets
        # delimit exactly one row's samples
        s64 = samples.astype(np.int64)
        energy[nz] = np.add.reduceat(s64 * s64, off_nz)
        peak[nz] = np.maximum.reduceat(np.abs(samples), off_nz)

        # zero crossings: flips between consecutive samples, not across rows
        neg = samples < 0
        flips = (neg[1:] != neg[:-1]).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(flips)))
        zc[nz] = cs[ends[nz] - 1] - cs[off_nz]

        # decimated (every 4th sample per row) energy: j = within-row index
        j = np.arange(total, dtype=np.int64) - np.repeat(offsets, counts)
        eds[nz] = np.add.reduceat(
            np.where(j % SAMPLE_EVERY == 0, s64 * s64, 0), off_nz
        )
    rms = np.sqrt(energy / np.maximum(n_samples.astype(np.int64), 1))
    return pa.RecordBatch.from_arrays(
        [
            pa.array(audio_id, pa.string()),
            pa.array(codec, pa.string()),
            pa.array(rate.astype(np.int32), pa.int32()),
            pa.array(n_samples.astype(np.int32), pa.int32()),
            pa.array(zc.astype(np.int32), pa.int32()),
            pa.array(peak.astype(np.int32), pa.int32()),
            pa.array(energy, pa.int64()),
            pa.array(eds, pa.int64()),
            pa.array(rms, pa.float64()),
        ],
        names=[
            "audio_id", "codec", "sample_rate", "n_samples",
            "zc", "peak", "energy", "energy_ds", "rms",
        ],
    )


def audio_chunk_features(chunk: pa.RecordBatch) -> pa.RecordBatch:
    """Decode one chunk of audio payload rows -> features RecordBatch.

    The single decode kernel shared by the batch table form and the
    streaming stage (output rows are 1:1 with input rows)."""
    ids = chunk.column("audio_id").to_pylist()
    codec = chunk.column("codec").to_pylist()
    rate = chunk.column("sample_rate").to_numpy()
    nsamp = chunk.column("n_samples").to_numpy()
    bufs = chunk.column("payload").to_pylist()
    decoded = [decode_audio(b, c).astype(np.int32) for b, c in zip(bufs, codec)]
    samples = np.concatenate(decoded) if decoded else np.empty(0, np.int32)
    offsets = np.concatenate(
        ([0], np.cumsum([len(d) for d in decoded])[:-1])
    ).astype(np.int64)
    return _audio_feature_batch(ids, codec, rate, nsamp, samples, offsets)


def audio_features(audio: DataFrame, chunk_rows: int = 2048) -> DataFrame:
    """Table form: decode payload batches -> per-row audio features."""

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                yield audio_chunk_features(batch.slice(s, chunk_rows))

    return audio.mapInArrow(run, AUDIO_FEATURES_SCHEMA)


def generate_audio_features(
    spark, n_rows: int, partitions: int | None = None, chunk_rows: int = 4096
) -> DataFrame:
    """Fused form: generate + decode + features in one Python stage.

    The ulaw transform is the same G.711 encode+decode the codec applies
    (sources.audio.ulaw_encode/ulaw_decode), without the AU-container
    byte round-trip — pytest asserts equality with the table form, which
    does round-trip the bytes.
    """
    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            all_ids = batch.column(0).to_numpy()
            for s in range(0, len(all_ids), chunk_rows):
                ids = all_ids[s : s + chunk_rows]
                nsamp, codec, rate = audio_meta(ids)
                # vectorized sample generation for the whole chunk
                counts = nsamp.astype(np.int64)
                offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
                ids_rep = np.repeat(ids.astype(np.uint64), counts)
                j = (
                    np.arange(int(counts.sum()), dtype=np.int64)
                    - np.repeat(offsets, counts)
                ).astype(np.uint64)
                from spatial4n_spark.sources.audio import _SAMPLE_ADD, _SAMPLE_MUL
                from spatial4n_spark.sources.images import _mix64

                h = _mix64(ids_rep * np.uint64(_SAMPLE_MUL) + j + np.uint64(_SAMPLE_ADD))
                raw = (h & np.uint64(0xFFFF)).astype(np.int32)
                from spatial4n_spark.sources.audio import ulaw_decode, ulaw_encode

                ulaw_rep = np.repeat(
                    np.array([c == "ulaw" for c in codec]), counts
                )
                lin = raw - 32768
                samples = np.where(ulaw_rep, ulaw_decode(ulaw_encode(lin)), lin)
                audio_id = np.char.add("aud", np.char.zfill(ids.astype(str), 9))
                yield _audio_feature_batch(
                    audio_id.tolist(), codec, rate, nsamp, samples, offsets
                )

    return rng.mapInArrow(run, AUDIO_FEATURES_SCHEMA)


def _video_scene_rows(
    video_id: str, fps: int, frames: np.ndarray, n_markers: int
) -> tuple:
    """Detector + sampling features for one decoded (n_frames, 64) matrix."""
    nf = frames.shape[0]
    diffs = np.abs(frames[1:] - frames[:-1]).sum(axis=1)
    n_cuts = int((diffs > CUT_THRESHOLD).sum())
    sampled = frames[::SAMPLE_EVERY]
    return (
        video_id,
        int(fps),
        nf,
        n_markers,
        n_cuts,
        int(diffs.sum()),
        sampled.shape[0],
        int(sampled.sum()),
    )


def _video_batch(rows: list[tuple]) -> pa.RecordBatch:
    cols = list(zip(*rows)) if rows else [[] for _ in range(8)]
    types = [
        pa.string(), pa.int32(), pa.int32(), pa.int32(),
        pa.int32(), pa.int64(), pa.int32(), pa.int64(),
    ]
    names = [
        "video_id", "fps", "n_frames", "n_scene_markers",
        "n_cuts", "diff_total", "n_sampled", "bright_sampled",
    ]
    return pa.RecordBatch.from_arrays(
        [pa.array(list(c), t) for c, t in zip(cols, types)], names=names
    )


def video_chunk_scenes(chunk: pa.RecordBatch) -> pa.RecordBatch:
    """Decode one chunk of video payload rows -> scene features batch.

    Shared by the batch table form and the streaming stage (1:1 rows).
    n_scene_markers (the planted ground truth) is recomputed from the
    video_id — metadata the generator owns, carried for the
    detector-vs-planted comparison column."""
    ids = chunk.column("video_id").to_pylist()
    fmts = chunk.column("fmt").to_pylist()
    fps = chunk.column("fps").to_numpy()
    nf = chunk.column("n_frames").to_numpy()
    bufs = chunk.column("payload").to_pylist()
    rows = []
    for vid, fmt, fp, n, buf in zip(ids, fmts, fps, nf, bufs):
        frames = decode_video(buf, fmt, int(n))
        markers = int(scene_index(int(vid[3:]), int(n))[-1])
        rows.append(_video_scene_rows(vid, int(fp), frames, markers))
    return _video_batch(rows)


def video_scenes(video: DataFrame, chunk_rows: int = 1024) -> DataFrame:
    """Table form: decode payloads -> scene-cut + frame-sampling features."""

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            for s in range(0, batch.num_rows, chunk_rows):
                yield video_chunk_scenes(batch.slice(s, chunk_rows))

    return video.mapInArrow(run, VIDEO_SCENES_SCHEMA)


def generate_video_scenes(
    spark, n_rows: int, partitions: int | None = None, chunk_rows: int = 2048
) -> DataFrame:
    """Fused form: generate frames + detector in one Python stage."""
    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)

    def run(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            all_ids = batch.column(0).to_numpy()
            for s in range(0, len(all_ids), chunk_rows):
                ids = all_ids[s : s + chunk_rows]
                n_frames, fps, _fmt = video_meta(ids)
                rows = []
                for i, nf, fp in zip(ids, n_frames, fps):
                    frames = video_frames(int(i), int(nf)).astype(np.int32)
                    markers = int(scene_index(int(i), int(nf))[-1])
                    rows.append(
                        _video_scene_rows(f"vid{int(i):09d}", int(fp), frames, markers)
                    )
                yield _video_batch(rows)

    return rng.mapInArrow(run, VIDEO_SCENES_SCHEMA)
