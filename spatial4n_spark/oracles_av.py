"""DuckDB oracles for the audio / video queries: full independent SQL
recompute of the deterministic generators (sources/audio.py,
sources/video.py), same design as oracles_images.py.

Every sample / pixel is a pure function of (row index, position) via the
splitmix64 finalizer, so the feature pipelines are recomputable
end-to-end in SQL. Two scale choices keep the oracle linear at the sf1
sweep (~640M sample rows):

- zero crossings need the PREVIOUS sample's sign: instead of a LAG
  window (a 640M-row partitioned sort), the previous sample's hash is
  recomputed IN-ROW as a second input through the same chained
  splitmix64 pass;
- scene-cut detection needs the PREVIOUS frame's pixels: scene(f-1) =
  scene(f) - marker(f), so the previous pixel is likewise a second
  (base, jitter) chain in the same pass — the only window is the tiny
  per-frame marker prefix sum (n_videos x n_frames rows).

Row counts mirror suite._images_scale: n_audio = greatest(|events|, 1000),
n_video = greatest(|events| // 2, 1000) — events carries exactly
1_000_000 * sf rows in every tier.
"""

from __future__ import annotations

from spatial4n_spark.oracles_images import _mix64_sql

N_AUDIO_SQL = "greatest((SELECT count(*) FROM events), 1000)"
N_VIDEO_SQL = "greatest((SELECT count(*) FROM events) // 2, 1000)"

# keying constants — must match sources/audio.py and sources/video.py
_A_MUL, _A_ADD = 193_939, 7_777
_V_MARK_MUL, _V_MARK_ADD = 500_009, 131
_V_BASE_MUL, _V_BASE_ADD = 777_753, 991
_V_JIT_MUL, _V_JIT_ADD = 888_761, 12


def _meta_sql(n_sql: str, salt: int, unit: int) -> str:
    """(i, nsz) where nsz = unit * (1 + top-2-bits of mix64(i*1000003 +
    salt*77003 + 42)) — the audio length / video frame-count draw."""
    ids = f"SELECT unnest(range(0, CAST({n_sql} AS BIGINT))) AS i"
    mixed = _mix64_sql(
        ids, ["i"], {"k": f"CAST(i * 1000003 + {salt * 77003 + 42} AS UBIGINT)"}
    )
    return f"SELECT i, CAST({unit} + (k >> 62) * {unit} AS INTEGER) AS nsz FROM ({mixed})"


def _ulaw_exp_sql(m: str) -> str:
    """bit_length(m) - 8 for m in [132, 32767] — the mu-law segment."""
    return (
        f"(CASE WHEN {m} >= 16384 THEN 7 WHEN {m} >= 8192 THEN 6 "
        f"WHEN {m} >= 4096 THEN 5 WHEN {m} >= 2048 THEN 4 "
        f"WHEN {m} >= 1024 THEN 3 WHEN {m} >= 512 THEN 2 "
        f"WHEN {m} >= 256 THEN 1 ELSE 0 END)"
    )


def _ulaw_dq_sql(s: str, m: str, e: str) -> str:
    """REAL G.711 mu-law encode-then-decode of linear ``s`` (materialized
    magnitude ``m`` = least(abs(s),32635)+132 and segment ``e``): pure
    integer shifts/masks, op-for-op the numpy kernel
    (sources/audio.py:ulaw_encode/ulaw_decode)."""
    return (
        f"((CASE WHEN {s} < 0 THEN -1 ELSE 1 END) * "
        f"(((((({m} >> ({e} + 3)) & 15) << 3) + 132) << {e}) - 132))"
    )


def sql_audio_features(sample_every: int = 4) -> str:
    """Oracle for q_audio_features: per-row zero crossings, peak, energy,
    decimated energy, RMS over the regenerated PCM samples.

    s = raw - 32768 with raw = mix64(...) & 0xFFFF; codec='ulaw' rows
    pass s through the REAL G.711 mu-law quantization (encode-then-
    decode, integer-exact — see _ulaw_dq_sql), so features including the
    crossing signs are computed on the DECODED values exactly as the
    engine kernel does (mu-law does NOT preserve small-sample signs: a
    sample in [-3, 3] decodes to 0). RMS = sqrt(energy / n): exact-int
    inputs, one divide, one sqrt — both correctly rounded, bit-identical
    to numpy."""
    meta = f"""ameta AS MATERIALIZED (
  SELECT i, nsz AS n_samples,
         CASE WHEN i % 2 = 0 THEN 'pcm' ELSE 'ulaw' END AS codec,
         CASE i % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000 ELSE 44100 END AS sample_rate
  FROM ({_meta_sql(N_AUDIO_SQL, 5, 256)})
)"""
    samp = (
        "SELECT i, n_samples, codec, sample_rate, "
        "unnest(range(0, CAST(n_samples AS BIGINT))) AS j FROM ameta"
    )
    # h = current sample hash, hp = previous sample hash (j-1; j=0 guarded)
    mixed = _mix64_sql(
        samp,
        ["i", "n_samples", "codec", "sample_rate", "j"],
        {
            "h": f"CAST(i * {_A_MUL} + j + {_A_ADD} AS UBIGINT)",
            "hp": f"CAST(i * {_A_MUL} + greatest(j, 1) - 1 + {_A_ADD} AS UBIGINT)",
        },
    )
    d0 = f"""SELECT i, n_samples, codec, sample_rate, j,
       CAST(h & 65535 AS BIGINT) - 32768 AS s,
       CAST(hp & 65535 AS BIGINT) - 32768 AS sp
FROM ({mixed})"""
    d1 = f"""SELECT *, least(abs(s), 32635) + 132 AS ma,
       least(abs(sp), 32635) + 132 AS map FROM ({d0})"""
    d2 = f"""SELECT *, {_ulaw_exp_sql('ma')} AS me, {_ulaw_exp_sql('map')} AS mep
FROM ({d1})"""
    dec = f"""SELECT i, n_samples, codec, sample_rate, j,
       (CASE WHEN codec = 'ulaw' THEN {_ulaw_dq_sql('s', 'ma', 'me')} ELSE s END) AS s,
       (CASE WHEN codec = 'ulaw' THEN {_ulaw_dq_sql('s', 'ma', 'me')} ELSE s END) < 0 AS neg,
       (CASE WHEN codec = 'ulaw' THEN {_ulaw_dq_sql('sp', 'map', 'mep')} ELSE sp END) < 0 AS pneg
FROM ({d2})"""
    return f"""WITH {meta}
SELECT 'aud' || lpad(CAST(i AS VARCHAR), 9, '0') AS audio_id,
       codec, sample_rate, n_samples,
       CAST(sum(CASE WHEN j >= 1 AND neg != pneg THEN 1 ELSE 0 END) AS INTEGER) AS zc,
       CAST(max(abs(s)) AS INTEGER) AS peak,
       CAST(sum(s * s) AS BIGINT) AS energy,
       CAST(sum(CASE WHEN j % {sample_every} = 0 THEN s * s ELSE 0 END) AS BIGINT)
         AS energy_ds,
       sqrt(CAST(CAST(sum(s * s) AS BIGINT) AS DOUBLE)
            / CAST(n_samples AS DOUBLE)) AS rms
FROM ({dec})
GROUP BY i, codec, sample_rate, n_samples"""


def sql_video_scenes(cut_threshold: int = 1000, sample_every: int = 4) -> str:
    """Oracle for q_video_scenes: regenerate the planted-scene frames and
    run the SAME threshold frame-difference detector the engine runs.

    pixel(i,f,j) = (mix64(i*777753 + scene*64 + j + 991) & 0xFC)
                 + (mix64(i*888761 + f*64 + j + 12) & 3);
    the previous frame's pixel uses scene_prev = scene - marker and f-1,
    recomputed in-row (no pixel-level window)."""
    vmeta = f"""vmeta AS MATERIALIZED (
  SELECT i, nsz AS n_frames,
         CASE WHEN i % 2 = 0 THEN 24 ELSE 30 END AS fps
  FROM ({_meta_sql(N_VIDEO_SQL, 6, 8)})
)"""
    fr = (
        "SELECT i, n_frames, fps, "
        "unnest(range(0, CAST(n_frames AS BIGINT))) AS f FROM vmeta"
    )
    marked = _mix64_sql(
        fr,
        ["i", "n_frames", "fps", "f"],
        {"mk": f"CAST(i * {_V_MARK_MUL} + f + {_V_MARK_ADD} AS UBIGINT)"},
    )
    frames = f"""frames AS MATERIALIZED (
  SELECT i, n_frames, fps, f, marker,
         CAST(sum(marker) OVER (PARTITION BY i ORDER BY f
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS scene
  FROM (SELECT i, n_frames, fps, f,
               CASE WHEN f = 0 THEN 0
                    WHEN (mk & 7) = 0 THEN 1 ELSE 0 END AS marker
        FROM ({marked}))
)"""
    px_src = (
        "SELECT i, f, marker, scene, unnest(range(0, 64)) AS j FROM frames"
    )
    mixed = _mix64_sql(
        px_src,
        ["i", "f", "j"],
        {
            "bc": f"CAST(i * {_V_BASE_MUL} + scene * 64 + j + {_V_BASE_ADD} AS UBIGINT)",
            "bp": f"CAST(i * {_V_BASE_MUL} + (scene - marker) * 64 + j + {_V_BASE_ADD} AS UBIGINT)",
            "jc": f"CAST(i * {_V_JIT_MUL} + f * 64 + j + {_V_JIT_ADD} AS UBIGINT)",
            "jp": f"CAST(i * {_V_JIT_MUL} + (greatest(f, 1) - 1) * 64 + j + {_V_JIT_ADD} AS UBIGINT)",
        },
    )
    pixels = f"""SELECT i, f,
       CAST(bc & 252 AS BIGINT) + CAST(jc & 3 AS BIGINT) AS p,
       CAST(bp & 252 AS BIGINT) + CAST(jp & 3 AS BIGINT) AS pp
FROM ({mixed})"""
    pxagg = f"""pxagg AS (
  SELECT i, f,
         CAST(sum(p) AS BIGINT) AS bright,
         CAST(sum(abs(p - pp)) AS BIGINT) AS diff
  FROM ({pixels}) GROUP BY i, f
)"""
    return f"""WITH {vmeta},
{frames},
{pxagg}
SELECT 'vid' || lpad(CAST(v.i AS VARCHAR), 9, '0') AS video_id,
       v.fps, v.n_frames,
       CAST(sum(fr.marker) AS INTEGER) AS n_scene_markers,
       CAST(sum(CASE WHEN fr.f >= 1 AND p.diff > {cut_threshold}
                THEN 1 ELSE 0 END) AS INTEGER) AS n_cuts,
       CAST(sum(CASE WHEN fr.f >= 1 THEN p.diff ELSE 0 END) AS BIGINT) AS diff_total,
       CAST(sum(CASE WHEN fr.f % {sample_every} = 0 THEN 1 ELSE 0 END) AS INTEGER)
         AS n_sampled,
       CAST(sum(CASE WHEN fr.f % {sample_every} = 0 THEN p.bright ELSE 0 END) AS BIGINT)
         AS bright_sampled
FROM vmeta v
JOIN frames fr ON fr.i = v.i
JOIN pxagg p ON p.i = fr.i AND p.f = fr.f
GROUP BY v.i, v.fps, v.n_frames"""
