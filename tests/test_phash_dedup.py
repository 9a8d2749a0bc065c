"""phash near-dup join: pigeonhole exactness, planted-variant recovery,
plan shape (no crossJoin, no Python in the hot path)."""

import itertools

import pytest
from pyspark.sql import functions as F

from spatial4n_spark.operators.phash_dedup import phash_dup_pairs


def _brute_pairs(rows, threshold):
    out = set()
    for (ia, pa), (ib, pb) in itertools.combinations(sorted(rows), 2):
        h = bin((pa ^ pb) & 0xFFFFFFFFFFFFFFFF).count("1")
        if h <= threshold:
            out.add((ia, ib, h))
    return out


def test_exact_vs_brute_force(spark):
    """Every qualifying pair is found (pigeonhole), none extra, hamming
    exact — against a brute-force evaluation, including pairs whose
    differing bits straddle several bands and band-collision pairs that
    must be filtered out."""
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.integers(0, 2**63, 60, dtype=np.int64)
    rows = [(f"id{i:03d}", int(p)) for i, p in enumerate(base)]
    # planted: flips of 1..3 bits (within threshold), 4 bits (outside)
    for k, nf in enumerate((1, 2, 3, 4)):
        p = int(base[k])
        for b in range(nf):
            p ^= 1 << int(rng.integers(0, 64))
        rows.append((f"id{k:03d}x", p))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    got = {
        (r["image_a"], r["image_b"], r["hamming"])
        for r in phash_dup_pairs(df, threshold=3, bands=4).collect()
    }
    assert got == _brute_pairs(rows, 3)


def test_threshold_beyond_pigeonhole_raises(spark):
    df = spark.createDataFrame([("a", 1)], "image_id string, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_dup_pairs(df, threshold=4, bands=4)
    with pytest.raises(ValueError, match="divide"):
        phash_dup_pairs(df, threshold=3, bands=5)
    # wider threshold works with more bands
    assert phash_dup_pairs(df, threshold=7, bands=8).count() == 0


def test_planted_variants_recovered(spark):
    """Every (base, variant) and (variant, variant) pair from the
    deterministic variant generator is recovered with the expected
    hamming bound; plan is crossJoin-free and JVM-only after the
    generators."""
    from spatial4n_spark.sources.images import images_df, phash_variants_df

    n = 400
    base = images_df(spark, n, with_bytes=False, partitions=2).select(
        "image_id", "phash"
    )
    corpus = base.unionAll(phash_variants_df(spark, n, copies=2, partitions=2))
    out = phash_dup_pairs(corpus, threshold=3, bands=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    rows = out.collect()
    groups = n // 4
    assert len(rows) == 3 * groups
    by_pair = {(r["image_a"], r["image_b"]): r["hamming"] for r in rows}
    for g in range(0, n, 4):
        b, v1, v2 = f"img{g:09d}", f"img{g:09d}_v1", f"img{g:09d}_v2"
        assert by_pair[(b, v1)] <= 1
        assert by_pair[(b, v2)] <= 2
        assert by_pair[(v1, v2)] <= 3


def test_hamming64_mixed_args(spark):
    """Both operands independently accept a name or a Column — mixed
    (str, Column) calls must reference the named COLUMN, not a literal."""
    from spatial4n_spark.operators.phash_dedup import hamming64

    df = spark.createDataFrame([(0b1011, 0b0011)], "pa long, pb long")
    variants = [
        hamming64("pa", "pb"),
        hamming64(F.col("pa"), F.col("pb")),
        hamming64("pa", F.col("pb")),
        hamming64(F.col("pa"), "pb"),
    ]
    vals = df.select(*[v.alias(f"h{i}") for i, v in enumerate(variants)]).first()
    assert list(vals) == [1, 1, 1, 1]
