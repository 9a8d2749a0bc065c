"""Audio / video multimodal operators: codec round-trips, fused==table
equality, planted-scene detector recovery, feature invariants."""

from __future__ import annotations

import numpy as np
import pytest

from spatial4n_spark.operators.av import (
    CUT_THRESHOLD,
    SAMPLE_EVERY,
    audio_features,
    generate_audio_features,
    generate_video_scenes,
    video_scenes,
)
from spatial4n_spark.sources.audio import (
    audio_df,
    audio_meta,
    decode_audio,
    raw_samples,
    _encode_payload as encode_audio,
)
from spatial4n_spark.sources.video import (
    decode_video,
    scene_index,
    video_df,
    video_frames,
    video_meta,
    _encode_payload as encode_video,
)


def test_audio_codec_roundtrip():
    raw = raw_samples(7, 512)
    dec_pcm = decode_audio(encode_audio(raw, "pcm"), "pcm")
    assert np.array_equal(dec_pcm, raw.astype(np.int32) - 32768)
    dec_ulaw = decode_audio(encode_audio(raw, "ulaw"), "ulaw")
    # real G.711 mu-law: matches the scalar spec reference sample-by-sample
    from spatial4n_spark.sources.audio import ulaw_decode, ulaw_encode

    assert np.array_equal(
        dec_ulaw, ulaw_decode(ulaw_encode(raw.astype(np.int32) - 32768))
    )
    with pytest.raises(ValueError):
        decode_audio(b"garbage!" + raw.tobytes(), "ulaw")


def _ulaw_ref_scalar(s: int) -> int:
    """Direct port of the published G.711 mu-law pseudocode (scalar),
    encode followed by decode — the reference the vectorized kernel must
    match on every 16-bit input."""
    sign = 0x80 if s < 0 else 0
    m = min(abs(s), 32635) + 132
    exp = 0
    while m >> (exp + 8):
        exp += 1
    mant = (m >> (exp + 3)) & 0x0F
    u = ~(sign | (exp << 4) | mant) & 0xFF
    # decode
    u = ~u & 0xFF
    t = (((u & 0x0F) << 3) + 132) << ((u >> 4) & 0x07)
    t -= 132
    return -t if u & 0x80 else t


def test_ulaw_matches_spec_reference_exhaustively():
    """All 65536 linear inputs: vectorized encode+decode == scalar spec
    reference; also the classic anchor values (0 -> code 0xFF -> 0)."""
    from spatial4n_spark.sources.audio import ulaw_decode, ulaw_encode

    s = np.arange(-32768, 32768, dtype=np.int32)
    got = ulaw_decode(ulaw_encode(s))
    want = np.array([_ulaw_ref_scalar(int(x)) for x in range(-32768, 32768)])
    assert np.array_equal(got, want)
    assert int(ulaw_encode(np.array([0]))[0]) == 0xFF
    assert int(ulaw_decode(np.array([0xFF]))[0]) == 0
    # quantization is value-idempotent: decode(encode(.)) of a decoded
    # value returns it unchanged (the CODE may differ for values that
    # decode to 0 — the sign bit of a negative zero is lost — so the
    # invariant is on values, not code bytes)
    assert np.array_equal(ulaw_decode(ulaw_encode(got)), got)


def test_video_codec_roundtrip():
    fr = video_frames(11, 16)
    assert fr.shape == (16, 64)
    assert np.array_equal(decode_video(encode_video(fr, "rawv"), "rawv", 16), fr)
    # real YUV4MPEG2: lossless round-trip, spec header + FRAME markers
    buf = encode_video(fr, "y4m", 30)
    assert buf.startswith(b"YUV4MPEG2 W8 H8 F30:1 ") and b"Cmono" in buf[:64]
    assert buf.count(b"FRAME\n") == 16
    assert np.array_equal(decode_video(buf, "y4m", 16), fr)
    # FRAME parameter strings after the marker are tolerated (per spec)
    buf_p = buf.replace(b"FRAME\n", b"FRAME Xparam\n", 1)
    assert np.array_equal(decode_video(buf_p, "y4m", 16), fr)
    with pytest.raises(ValueError):
        decode_video(fr.tobytes(), "y4m", 16)


def test_video_planted_scene_structure():
    """Within-scene frame diffs stay under the threshold; every planted
    cut exceeds it — deterministic over the first 500 videos."""
    ids = np.arange(500)
    n_frames, _, _ = video_meta(ids)
    for i, nf in zip(ids, n_frames):
        fr = video_frames(int(i), int(nf)).astype(np.int32)
        diffs = np.abs(fr[1:] - fr[:-1]).sum(axis=1)
        scenes = scene_index(int(i), int(nf))
        markers = np.diff(scenes)  # 1 where frame f>=1 starts a new scene
        assert np.all(diffs[markers == 1] > CUT_THRESHOLD)
        assert np.all(diffs[markers == 0] <= 192)  # 64 px * jitter range 3


def test_audio_fused_equals_table(spark):
    fused = generate_audio_features(spark, 600, partitions=4).toPandas()
    table = audio_features(audio_df(spark, 600, partitions=4)).toPandas()
    f = fused.sort_values("audio_id").reset_index(drop=True)
    t = table.sort_values("audio_id").reset_index(drop=True)
    assert f.equals(t)
    assert len(f) == 600
    # invariants
    assert (f.peak <= 32768).all() and (f.zc < f.n_samples).all()
    assert (f.energy >= f.energy_ds).all()
    assert np.allclose(f.rms, np.sqrt(f.energy / f.n_samples), rtol=0, atol=0)


def test_video_fused_equals_table(spark):
    fused = generate_video_scenes(spark, 400, partitions=4).toPandas()
    table = video_scenes(video_df(spark, 400, partitions=4)).toPandas()
    f = fused.sort_values("video_id").reset_index(drop=True)
    t = table.sort_values("video_id").reset_index(drop=True)
    assert f.equals(t)
    assert len(f) == 400
    # detector recovers exactly the planted cuts (structure test above
    # proves the margins; this closes the loop through the operator)
    assert (f.n_cuts == f.n_scene_markers).all()
    assert (f.n_sampled == (f.n_frames + SAMPLE_EVERY - 1) // SAMPLE_EVERY).all()


def test_audio_features_empty_payload_rows():
    """Zero-length payload rows (metadata-only tables, corrupt records)
    must yield zeroed features — reduceat would otherwise silently
    assign them the NEXT row's first sample (code-review fix)."""
    import pyarrow as pa

    from spatial4n_spark.operators.av import _audio_feature_batch

    # rows: [1,-1] | empty | [2,3] | empty-at-end
    samples = np.array([1, -1, 2, 3], dtype=np.int32)
    offsets = np.array([0, 2, 2, 4], dtype=np.int64)
    out = _audio_feature_batch(
        ["a", "b", "c", "d"],
        ["pcm"] * 4,
        np.full(4, 8000, np.int32),
        np.array([2, 0, 2, 0], np.int32),
        samples,
        offsets,
    ).to_pandas()
    assert out.energy.tolist() == [2, 0, 13, 0]
    assert out.peak.tolist() == [1, 0, 3, 0]
    assert out.zc.tolist() == [1, 0, 0, 0]
    assert out.energy_ds.tolist() == [1, 0, 4, 0]
    assert out.rms.tolist()[1] == 0.0 and out.rms.tolist()[3] == 0.0

    # all-empty chunk must not raise
    empty = _audio_feature_batch(
        ["x"], ["pcm"], np.array([8000], np.int32), np.array([0], np.int32),
        np.empty(0, np.int32), np.array([0], np.int64),
    ).to_pandas()
    assert empty.energy.tolist() == [0]


def test_audio_meta_distribution():
    ids = np.arange(4000)
    nsamp, codec, rate = audio_meta(ids)
    assert set(np.unique(nsamp)) == {256, 512, 768, 1024}
    assert set(codec) == {"pcm", "ulaw"}
    assert set(np.unique(rate)) == {8000, 16000, 44100}
