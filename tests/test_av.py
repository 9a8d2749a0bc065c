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
    # step-8 quantization, sign preserved
    assert np.array_equal(dec_ulaw, (raw.astype(np.int32) & ~7) - 32768)
    assert np.array_equal(dec_ulaw < 0, dec_pcm < 0)
    with pytest.raises(ValueError):
        decode_audio(b"garbage!" + raw.tobytes(), "ulaw")


def test_video_codec_roundtrip():
    fr = video_frames(11, 16)
    assert fr.shape == (16, 64)
    assert np.array_equal(decode_video(encode_video(fr, "rawv"), "rawv", 16), fr)
    assert np.array_equal(decode_video(encode_video(fr, "v4n"), "v4n", 16), fr)
    with pytest.raises(ValueError):
        decode_video(fr.tobytes(), "v4n", 16)


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


def test_audio_meta_distribution():
    ids = np.arange(4000)
    nsamp, codec, rate = audio_meta(ids)
    assert set(np.unique(nsamp)) == {256, 512, 768, 1024}
    assert set(codec) == {"pcm", "ulaw"}
    assert set(np.unique(rate)) == {8000, 16000, 44100}
