"""Deterministic synthetic audio table — the audio arm of the multimodal
source family (images / audio / video over one opaque-binary column
pattern, BASELINE.json input_hint shape).

Schema: audio_id:string, payload:binary, sample_rate:int, n_samples:int,
codec:string, lon:double, lat:double.

Rows are generated **distributed** (spark.range -> mapInArrow); every
sample is a pure function of (row index, sample index) via the splitmix64
finalizer (sources/images.py:_mix64), so the whole table is recomputable
in SQL by the DuckDB oracle (oracles_av.py) — same design as the image
table.

Payloads are 16-bit PCM stored as little-endian uint16 with a -32768
bias applied at decode:
- codec='pcm'  : lossless raw samples.
- codec='ulaw' : STUB lossy companding — 8-byte magic + samples
                 quantized to a step of 8 (``raw & ~7``). Real
                 G.711/opus codecs are unavailable in this container;
                 the engine plumbing (binary column, Arrow-batched
                 decode, feature extraction) is real and the
                 quantization gives true lossy math for the features.

Reference parity note: the reference engine (Spatial4n) has no media
types; this family implements the training-data-pipeline multimodal
requirement with the same geo columns (synth_coords) so media rows flow
through the spatial operators unchanged.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pyarrow as pa

from spatial4n_spark.sources.images import _mix64, synth_coords

AUDIO_SCHEMA = (
    "audio_id string, payload binary, sample_rate int, n_samples int, "
    "codec string, lon double, lat double"
)

_ULAW_MAGIC = b"S4NULAW\x01"
_RATES = (8000, 16000, 44100)

# sample keying constants (distinct from the image pixel key 0x1F123)
_SAMPLE_MUL = 193_939
_SAMPLE_ADD = 7_777


def raw_samples(i: int, n: int) -> np.ndarray:
    """Unsigned 16-bit raw samples for row ``i``: mix64(i*193939+j+7777)&0xFFFF."""
    j = np.arange(n, dtype=np.uint64)
    h = _mix64(j + np.uint64(i * _SAMPLE_MUL + _SAMPLE_ADD))
    return (h & np.uint64(0xFFFF)).astype(np.uint16)


def _encode_payload(raw: np.ndarray, codec: str) -> bytes:
    if codec == "pcm":
        return raw.astype("<u2").tobytes()
    if codec == "ulaw":
        q = (raw & np.uint16(0xFFF8)).astype("<u2")  # step-8 quantization
        return _ULAW_MAGIC + q.tobytes()
    raise ValueError(codec)


def decode_audio(buf, codec: str) -> np.ndarray:
    """Decode a payload to biased int32 samples in [-32768, 32767].

    Stub-codec twin of ``_encode_payload``; a real deployment swaps in a
    libsndfile/opus decode here — the engine plumbing does not change.
    """
    b = bytes(buf)
    if codec == "ulaw":
        if not b.startswith(_ULAW_MAGIC):
            raise ValueError("bad ulaw stub magic")
        b = b[len(_ULAW_MAGIC):]
    raw = np.frombuffer(b, dtype="<u2").astype(np.int32)
    return raw - 32768


def audio_meta(ids: np.ndarray) -> tuple[np.ndarray, list[str], np.ndarray]:
    """(n_samples, codec, sample_rate) per id — mirrored in SQL by the oracle."""
    k = _mix64(ids.astype(np.uint64) * np.uint64(1_000_003) + np.uint64(5 * 77_003 + 42))
    n_samples = (256 + (k >> np.uint64(62)).astype(np.int64) * 256).astype(np.int32)
    codec = ["pcm" if int(i) % 2 == 0 else "ulaw" for i in ids]
    rate = np.array([_RATES[int(i) % 3] for i in ids], dtype=np.int32)
    return n_samples, codec, rate


def _gen_batch(ids: np.ndarray, with_payload: bool) -> pa.RecordBatch:
    lon, lat = synth_coords(ids)
    n_samples, codec, rate = audio_meta(ids)
    audio_id = np.char.add("aud", np.char.zfill(ids.astype(str), 9))
    if with_payload:
        payloads = [
            _encode_payload(raw_samples(int(i), int(n)), c)
            for i, n, c in zip(ids, n_samples, codec)
        ]
    else:
        payloads = [b""] * len(ids)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(audio_id.tolist(), pa.string()),
            pa.array(payloads, pa.binary()),
            pa.array(rate, pa.int32()),
            pa.array(n_samples, pa.int32()),
            pa.array(codec, pa.string()),
            pa.array(lon, pa.float64()),
            pa.array(lat, pa.float64()),
        ],
        names=["audio_id", "payload", "sample_rate", "n_samples", "codec", "lon", "lat"],
    )


def audio_df(spark, n_rows: int, with_payload: bool = True, partitions: int | None = None):
    """Distributed deterministic audio table: spark.range -> mapInArrow."""
    rng = spark.range(0, n_rows, 1, partitions) if partitions else spark.range(n_rows)

    def gen(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in it:
            ids = batch.column(0).to_numpy()
            for s in range(0, len(ids), 4096):
                yield _gen_batch(ids[s : s + 4096], with_payload)

    return rng.mapInArrow(gen, AUDIO_SCHEMA)
