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

Payloads:
- codec='pcm'  : lossless raw samples — little-endian uint16 with a
                 -32768 bias applied at decode.
- codec='ulaw' : REAL G.711 mu-law companding (pure integer math, no
                 audio library needed) in a REAL Sun AU container
                 ('.snd' header, encoding 1, mono) — the payload opens
                 in standard audio players, and the lossy segment
                 quantization is the genuine G.711 transform, mirrored
                 integer-exactly by the DuckDB oracle.

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

_RATES = (8000, 16000, 44100)

# sample keying constants (distinct from the image pixel key 0x1F123)
_SAMPLE_MUL = 193_939
_SAMPLE_ADD = 7_777


def raw_samples(i: int, n: int) -> np.ndarray:
    """Unsigned 16-bit raw samples for row ``i``: mix64(i*193939+j+7777)&0xFFFF."""
    j = np.arange(n, dtype=np.uint64)
    h = _mix64(j + np.uint64(i * _SAMPLE_MUL + _SAMPLE_ADD))
    return (h & np.uint64(0xFFFF)).astype(np.uint16)


_AU_MAGIC = b".snd"
_ULAW_BIAS = 132
_ULAW_CLIP = 32635


def ulaw_encode(s: np.ndarray) -> np.ndarray:
    """REAL G.711 mu-law companding (pure integer math, vectorized):
    linear samples (int, clipped to +-32635) -> inverted 8-bit codes.
    Exponent comes from ``np.frexp`` (exact bit-length, no float-log
    boundary hazard)."""
    s = np.asarray(s, dtype=np.int32)
    sign = np.where(s < 0, 0x80, 0).astype(np.int32)
    m = np.minimum(np.abs(s), _ULAW_CLIP) + _ULAW_BIAS  # 132..32767
    exp = (np.frexp(m.astype(np.float64))[1] - 8).astype(np.int32)  # 0..7
    mant = (m >> (exp + 3)) & 0x0F
    return (~(sign | (exp << 4) | mant) & 0xFF).astype(np.uint8)


def ulaw_decode(u: np.ndarray) -> np.ndarray:
    """Inverse G.711 mu-law: 8-bit codes -> linear int32 in [-32124, 32124]."""
    u = (~np.asarray(u).astype(np.int32)) & 0xFF
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    t = (((mant << 3) + _ULAW_BIAS) << exp) - _ULAW_BIAS
    return np.where(u & 0x80 != 0, -t, t).astype(np.int32)


def _au_header(n_bytes: int, rate: int) -> bytes:
    """Sun AU container header: '.snd', data offset 24, data size,
    encoding 1 (8-bit G.711 mu-law), sample rate, 1 channel — a REAL
    audio container; the payload opens in standard players."""
    import struct

    return _AU_MAGIC + struct.pack(">5I", 24, n_bytes, 1, rate, 1)


def _encode_payload(raw: np.ndarray, codec: str, rate: int = 8000) -> bytes:
    if codec == "pcm":
        return raw.astype("<u2").tobytes()
    if codec == "ulaw":
        codes = ulaw_encode(raw.astype(np.int32) - 32768)
        return _au_header(len(codes), rate) + codes.tobytes()
    raise ValueError(codec)


def decode_audio(buf, codec: str) -> np.ndarray:
    """Decode a payload to linear int32 samples.

    'pcm' is raw little-endian uint16 with a -32768 bias (lossless);
    'ulaw' is a REAL Sun AU container of G.711 mu-law codes — header
    validated, codes expanded through ``ulaw_decode`` (lossy, as real
    mu-law is). The media family's remaining simplifications are the
    compressed codecs (real JPEG / H.264), disclosed in the image and
    video module docstrings.
    """
    import struct

    b = bytes(buf)
    if codec == "ulaw":
        if b[:4] != _AU_MAGIC:
            raise ValueError("bad AU magic")
        off, size, enc, _rate, ch = struct.unpack(">5I", b[4:24])
        if enc != 1 or ch != 1:
            raise ValueError("unsupported AU variant (need 8-bit mu-law mono)")
        return ulaw_decode(np.frombuffer(b[off : off + size], dtype=np.uint8))
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
            _encode_payload(raw_samples(int(i), int(n)), c, int(r))
            for i, n, c, r in zip(ids, n_samples, codec, rate)
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
