"""Perceptual-hash near-duplicate join (multimodal dedup).

Finds every pair of images whose 64-bit perceptual hash differs in at
most ``threshold`` bits — the standard image near-dup primitive of a
training-data pipeline (the text twins live in ``text.py``:
minhash/simhash; this is the image-side member of that family).

The plan is EXACT, not approximate, by the pigeonhole band trick
(Manku/Jain/Sarma's simhash dedup construction): split the 64-bit hash
into ``bands`` contiguous blocks; if two hashes differ in at most
``bands - 1`` bits, at least one block is untouched, so a self-join on
(block index, block value) is guaranteed to surface every qualifying
pair. A final ``bit_count(xor)`` filter removes band collisions.

Scale shape: one posexplode (rows x bands), ONE shuffle on the
(band_index, band_value) key, and a distinct — no crossJoin anywhere.
Candidate volume is sum over buckets of C(bucket_size, 2); with 16-bit
bands a uniform corpus of n rows costs ~n^2/2^16 comparisons per band,
and real phash corpora (which cluster) cost less. For corpora where
n^2/2^16 is too large, raise ``bands`` (narrower blocks -> higher
guaranteed threshold, more but smaller buckets) — the pigeonhole bound
``threshold <= bands - 1`` is the only constraint.

Everything stays JVM-side (bitwise ops + one whole-stage-codegen
filter); no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["phash_dup_pairs", "hamming64"]


def hamming64(a, b):
    """Hamming distance between two 64-bit hashes (native, codegen).
    ``a``/``b`` may each independently be a column name or a Column."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.bit_count(a.bitwiseXOR(b))


def phash_dup_pairs(
    df: DataFrame,
    threshold: int = 3,
    bands: int = 4,
    id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """All (id_a < id_b) pairs with hamming(phash_a, phash_b) <= threshold.

    Returns (image_a, image_b, hamming). Exact for
    ``threshold <= bands - 1`` (pigeonhole over contiguous blocks);
    raises otherwise rather than silently returning a subset.
    """
    if 64 % bands:
        raise ValueError(f"bands={bands} must divide 64")
    if threshold > bands - 1:
        raise ValueError(
            f"threshold={threshold} needs bands >= {threshold + 1} for the "
            f"pigeonhole guarantee (got bands={bands})"
        )
    width = 64 // bands
    mask = (1 << width) - 1
    # (id, phash, block index, block value); arithmetic shiftright +
    # mask == logical shift for block extraction (mask kills sign fill)
    blocks = df.select(
        F.col(id_col),
        F.col(phash_col).cast("long").alias("_ph"),
        F.posexplode(
            F.array(
                *[
                    F.shiftright(F.col(phash_col).cast("long"), width * b).bitwiseAND(
                        F.lit(mask)
                    )
                    for b in range(bands)
                ]
            )
        ).alias("_bi", "_bh"),
    )
    left = blocks.select(
        F.col(id_col).alias("image_a"), F.col("_ph").alias("_pa"), "_bi", "_bh"
    )
    right = blocks.select(
        F.col(id_col).alias("image_b"), F.col("_ph").alias("_pb"), "_bi", "_bh"
    )
    pairs = (
        left.join(right, ["_bi", "_bh"])
        .where(F.col("image_a") < F.col("image_b"))
        # a pair found in k bands appears k times; phashes are functions
        # of the ids so the 4-column distinct dedups exactly by pair
        .select("image_a", "image_b", "_pa", "_pb")
        .distinct()
    )
    return (
        pairs.withColumn(
            "hamming", F.bit_count(F.col("_pa").bitwiseXOR(F.col("_pb"))).cast("int")
        )
        .where(F.col("hamming") <= threshold)
        .select("image_a", "image_b", "hamming")
    )
