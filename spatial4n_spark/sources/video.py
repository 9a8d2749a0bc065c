"""Deterministic synthetic video table — the video arm of the multimodal
source family (opaque binary payload + typed metadata, BASELINE.json
input_hint shape).

Schema: video_id:string, payload:binary, w:int, h:int, n_frames:int,
fps:int, fmt:string, lon:double, lat:double.

A video is ``n_frames`` concatenated 8x8 grayscale frames (64 bytes per
frame). Frames are generated with planted scene structure so the
frame-sampling / scene-cut operators exercise real detector math:

- scene markers: frame f >= 1 starts a new scene iff
  mix64(i*500009 + f + 131) & 7 == 0 (~1/8 of frames);
  scene(f) = running count of markers (prefix sum, frame 0 is scene 0).
- pixel(i, f, j) = (mix64(i*777753 + scene*64 + j + 991) & 0xFC)
                 + (mix64(i*888761 + f*64 + j + 12) & 3)
  i.e. a per-scene base image quantized to step 4 plus a tiny per-frame
  jitter in [0,3]. Within a scene, consecutive frames differ by at most
  3 per pixel (sum <= 192 over 64 px); across a planted cut the base
  redraws uniformly (expected |diff| sum ~5400) — so a threshold
  frame-difference detector separates them deterministically.

Every byte is a pure function of (row index, frame, pixel) via
splitmix64, so the DuckDB oracle (oracles_av.py) recomputes the table
and the detector end-to-end in SQL (LAG over (i, j) ordered by f).

fmt='rawv' is plain concatenated frames; fmt='y4m' is a REAL YUV4MPEG2
container (the standard uncompressed-video interchange format —
``YUV4MPEG2 W8 H8 F<fps>:1 ... Cmono`` header + per-frame ``FRAME``
markers; the payload plays in ffmpeg/mpv). Y4M is lossless, so the
decode/frame-sample/scene-cut math is unchanged; compressed video
codecs (H.264 etc.) remain out of scope in this container, as does real
JPEG on the image side — those two are the media family's disclosed
simplifications.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from spatial4n_spark.sources.images import _mix64, synth_coords

VIDEO_SCHEMA = (
    "video_id string, payload binary, w int, h int, n_frames int, fps int, "
    "fmt string, lon double, lat double"
)

_Y4M_MAGIC = b"YUV4MPEG2"
FRAME_W = 8
FRAME_H = 8
FRAME_PX = FRAME_W * FRAME_H

# keying constants (distinct from image/audio keys)
_MARK_MUL = 500_009
_MARK_ADD = 131
_BASE_MUL = 777_753
_BASE_ADD = 991
_JIT_MUL = 888_761
_JIT_ADD = 12


def video_meta(ids: np.ndarray) -> tuple[np.ndarray, np.ndarray, list[str]]:
    """(n_frames, fps, fmt) per id — mirrored in SQL by the oracle."""
    k = _mix64(ids.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(6 * 77_003 + 42))
    n_frames = (8 + (k >> np.uint64(62)).astype(np.int64) * 8).astype(np.int32)
    fps = np.where(ids % 2 == 0, 24, 30).astype(np.int32)
    fmt = ["rawv" if int(i) % 2 == 0 else "y4m" for i in ids]
    return n_frames, fps, fmt


def scene_index(i: int, n_frames: int) -> np.ndarray:
    """Per-frame scene index: prefix sum of planted markers (frame 0 = 0)."""
    f = np.arange(n_frames, dtype=np.uint64)
    h = _mix64(f + np.uint64(i * _MARK_MUL + _MARK_ADD))
    marker = ((h & np.uint64(7)) == 0).astype(np.int64)
    marker[0] = 0
    return np.cumsum(marker)


def video_frames(i: int, n_frames: int) -> np.ndarray:
    """(n_frames, 64) uint8 pixel matrix for row ``i``."""
    scenes = scene_index(i, n_frames)
    f = np.arange(n_frames, dtype=np.uint64)[:, None]
    j = np.arange(FRAME_PX, dtype=np.uint64)[None, :]
    base_key = scenes.astype(np.uint64)[:, None] * np.uint64(FRAME_PX) + j + np.uint64(
        i * _BASE_MUL + _BASE_ADD
    )
    jit_key = f * np.uint64(FRAME_PX) + j + np.uint64(i * _JIT_MUL + _JIT_ADD)
    base = (_mix64(base_key.ravel()) & np.uint64(0xFC)).reshape(n_frames, FRAME_PX)
    jit = (_mix64(jit_key.ravel()) & np.uint64(3)).reshape(n_frames, FRAME_PX)
    return (base + jit).astype(np.uint8)


def _encode_payload(frames: np.ndarray, fmt: str, fps: int = 24) -> bytes:
    raw = frames.tobytes()
    if fmt == "rawv":
        return raw
    if fmt == "y4m":
        head = (
            f"YUV4MPEG2 W{FRAME_W} H{FRAME_H} F{int(fps)}:1 Ip A1:1 Cmono\n"
        ).encode()
        body = b"".join(
            b"FRAME\n" + frames[k].tobytes() for k in range(frames.shape[0])
        )
        return head + body
    raise ValueError(fmt)


def decode_video(buf, fmt: str, n_frames: int) -> np.ndarray:
    """Decode a payload to an (n_frames, 64) int32 frame matrix.

    'rawv' is a buffer view; 'y4m' is a REAL YUV4MPEG2 parse — stream
    header (W/H/colorspace validated), then per-frame ``FRAME`` markers
    (parameters after FRAME tolerated, per spec). Compressed codecs
    (a real deployment's ffmpeg/pyav swap-in) stay out of scope; the
    plumbing is identical either way.
    """
    b = bytes(buf)
    if fmt == "y4m":
        if not b.startswith(_Y4M_MAGIC + b" "):
            raise ValueError("bad y4m magic")
        nl = b.index(b"\n")
        params = b[len(_Y4M_MAGIC) + 1 : nl].split(b" ")
        tags = {p[:1]: p[1:] for p in params if p}
        w, h = int(tags[b"W"]), int(tags[b"H"])
        if (w, h) != (FRAME_W, FRAME_H):
            raise ValueError("y4m dims disagree with the frame kernel")
        if tags.get(b"C", b"mono") != b"mono":
            raise ValueError("unsupported y4m colorspace (need mono)")
        pos, out = nl + 1, []
        while pos < len(b):
            if b[pos : pos + 5] != b"FRAME":
                raise ValueError("bad y4m frame marker")
            pos = b.index(b"\n", pos) + 1  # FRAME may carry parameters
            out.append(np.frombuffer(b[pos : pos + FRAME_PX], dtype=np.uint8))
            pos += FRAME_PX
        arr = np.stack(out).astype(np.int32)
        if arr.shape[0] != int(n_frames):
            raise ValueError("y4m frame count disagrees with metadata")
        return arr
    arr = np.frombuffer(b, dtype=np.uint8).astype(np.int32)
    return arr.reshape(int(n_frames), FRAME_PX)


def _gen_batch(ids: np.ndarray, with_payload: bool) -> pa.RecordBatch:
    lon, lat = synth_coords(ids)
    n_frames, fps, fmt = video_meta(ids)
    video_id = np.char.add("vid", np.char.zfill(ids.astype(str), 9))
    if with_payload:
        payloads = [
            _encode_payload(video_frames(int(i), int(nf)), f, int(r))
            for i, nf, f, r in zip(ids, n_frames, fmt, fps)
        ]
    else:
        payloads = [b""] * len(ids)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(video_id.tolist(), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(np.full(len(ids), FRAME_W, dtype=np.int32), pa.int32()),
            pa.array(np.full(len(ids), FRAME_H, dtype=np.int32), pa.int32()),
            pa.array(n_frames, pa.int32()),
            pa.array(fps, pa.int32()),
            pa.array(fmt, pa.string()),
            pa.array(lon, pa.float64()),
            pa.array(lat, pa.float64()),
        ],
        names=["video_id", "payload", "w", "h", "n_frames", "fps", "fmt", "lon", "lat"],
    )


def video_df(spark, n_rows: int, with_payload: bool = True, partitions: int | None = None):
    """Distributed deterministic video table: spark.range -> mapInArrow."""
    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(0).to_numpy()
            for s in range(0, len(ids), 2048):
                yield _gen_batch(ids[s : s + 2048], with_payload)

    return rng.mapInArrow(gen, VIDEO_SCHEMA)
