"""Embedding similarity search operators (training-data pipeline).

The embedding column is ``array<float>``; all math happens JVM-side in
higher-order array expressions (zip_with/aggregate) after an exact
float->double cast — no Python UDFs, no shuffle except the final top-k
window over bounded candidate sets.

- cosine_topk     brute-force exact top-k vs a constant query vector
                  (the correctness baseline; O(n) scan, map-side)
- knn_pairs       exact all-pairs top-k neighbors (O(n^2) — the small-n
                  baseline; the ANN path below is the scale path)
- lsh_buckets     random-hyperplane (sign) LSH bucket assignment —
                  bucketing is the shuffle key for ANN at scale
- ann_topk        LSH-bucketed approximate top-k: candidates share the
                  query's bucket, then exact cosine rank (broadcast-style
                  pruning; recall measured against cosine_topk in tests)

Deterministic hyperplanes/query vectors are generated from integer
formulas so the DuckDB oracles embed identical literals.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def query_vector(dim: int = 64) -> list[float]:
    """Deterministic unit-free query vector: ((i*37) % 19 - 9) / 10."""
    return [((i * 37) % 19 - 9) / 10.0 for i in range(dim)]


def hyperplanes(n_planes: int = 16, dim: int = 64, seed: int = 0) -> list[list[float]]:
    """Deterministic hyperplane directions:
    ((seed + j*73 + i*37) % 21 - 10) / 10 — ``seed`` differentiates LSH
    tables in the multi-table ANN index."""
    return [
        [((seed + j * 73 + i * 37) % 21 - 10) / 10.0 for i in range(dim)]
        for j in range(n_planes)
    ]


def _emb_double(col: Column) -> Column:
    return col.cast("array<double>")


def _dot(a: Column, b: Column) -> Column:
    """Sequential fold sum of elementwise products (oracle mirrors the
    same order: 0.0 + t1 + t2 + ...)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm2(a: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, a, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def with_cosine(emb: DataFrame, qvec: list[float], out: str = "cos") -> DataFrame:
    q = F.array(*[F.lit(float(v)) for v in qvec])
    qnorm = math.sqrt(sum(v * v for v in qvec))
    e = _emb_double(F.col("embedding"))
    cos = _dot(e, q) / (F.sqrt(_norm2(e)) * F.lit(qnorm))
    return emb.withColumn(out, cos)


def _topk_ranked(scored: DataFrame, k: int) -> DataFrame:
    """Distributed top-k of a scored frame: ``orderBy().limit(k)`` plans as
    TakeOrderedAndProject (map-side partial top-k per partition, then a
    k-row merge on the driver) — no single-reducer global Window over the
    full candidate set, which is the scaling bottleneck at 10^12 rows.
    The rank window then runs over only the k survivors."""
    top = scored.orderBy(F.col("cos").desc(), F.col("vec_id").asc()).limit(k)
    w = Window.orderBy(F.col("cos").desc(), F.col("vec_id").asc())
    return (
        top.withColumn("rank", F.row_number().over(w))
        .select("vec_id", "rank", F.round("cos", 4).alias("cos"))
    )


def cosine_topk(emb: DataFrame, qvec: list[float], k: int = 20) -> DataFrame:
    """Exact brute-force cosine top-k: (vec_id, rank, cos)."""
    return _topk_ranked(with_cosine(emb, qvec), k)


def knn_pairs(emb: DataFrame, k: int = 3) -> DataFrame:
    """Exact all-pairs top-k neighbors by cosine: (vec_id, neighbor_id, rank).

    O(n^2) exact baseline — at design scale this becomes ann_topk over
    LSH buckets; kept as the recall oracle.
    """
    a = emb.select(
        F.col("vec_id").alias("vec_id"), _emb_double(F.col("embedding")).alias("ea")
    )
    b = emb.select(
        F.col("vec_id").alias("neighbor_id"), _emb_double(F.col("embedding")).alias("eb")
    )
    pairs = a.crossJoin(b).where(F.col("vec_id") != F.col("neighbor_id"))
    cos = _dot(F.col("ea"), F.col("eb")) / (
        F.sqrt(_norm2(F.col("ea"))) * F.sqrt(_norm2(F.col("eb")))
    )
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        pairs.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank")
    )


def bucket_col(emb_col: Column, planes: list[list[float]]) -> Column:
    """Sign-LSH bucket id: bit j set iff dot(embedding, plane_j) > 0."""
    e = _emb_double(emb_col)
    bucket = F.lit(0).cast("long")
    for j, plane in enumerate(planes):
        p = F.array(*[F.lit(float(v)) for v in plane])
        bucket = bucket + F.when(_dot(e, p) > F.lit(0.0), F.lit(2 ** j).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_buckets(emb: DataFrame, planes: list[list[float]] | None = None) -> DataFrame:
    planes = planes or hyperplanes()
    return emb.select("vec_id", bucket_col(F.col("embedding"), planes).alias("bucket"))


def ivf_centroids(n_centroids: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-centroids: ((j*131 + i*37) % 21 - 10) / 10 —
    the oracle-mirrorable coarse quantizer; see fit_ivf_centroids for the
    data-adaptive variant."""
    return [
        [((j * 131 + i * 37) % 21 - 10) / 10.0 for i in range(dim)]
        for j in range(n_centroids)
    ]


def fit_ivf_centroids(
    emb: DataFrame, n_centroids: int = 16, iters: int = 5, sample: int = 2048
) -> list[list[float]]:
    """Data-adaptive centroids: numpy k-means on a driver-side sample
    (seeded, deterministic) — the 'train the coarse quantizer on a sample'
    step every IVF index performs; the result broadcasts as constants."""
    import numpy as np

    pdf = emb.select("embedding").limit(sample).toPandas()
    x = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    rng = np.random.RandomState(42)
    cent = x[rng.choice(len(x), n_centroids, replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                cent[j] = x[m].mean(axis=0)
    return [[float(v) for v in c] for c in cent]


def centroid_col(emb_col: Column, centroids: list[list[float]]) -> Column:
    """Argmax-dot centroid assignment (strict >: first centroid wins ties)
    — the IVF inverted-list key."""
    e = _emb_double(emb_col)
    dots = []
    for c in centroids:
        cv = F.array(*[F.lit(float(v)) for v in c])
        dots.append(_dot(e, cv))
    # argmax = first index equal to the variadic greatest — an iterative
    # when-fold would reference `best` three times per level and Catalyst
    # copies expression TREES, going exponential (OOM at 16 centroids)
    best = F.greatest(*dots)
    idx = F.when(dots[0] == best, F.lit(0))
    for j in range(1, len(dots)):
        idx = idx.when(dots[j] == best, F.lit(j))
    return idx.cast("int")


def ivf_assign(emb: DataFrame, centroids: list[list[float]] | None = None) -> DataFrame:
    centroids = centroids or ivf_centroids()
    return emb.select("vec_id", centroid_col(F.col("embedding"), centroids).alias("centroid_id"))


def ivf_probe_order(qvec: list[float], centroids: list[list[float]]) -> list[int]:
    """Centroid indices ranked by dot(query, centroid) desc (index asc on
    ties) — the driver-side probe order for IVF search."""
    scores = []
    for j, c in enumerate(centroids):
        acc = 0.0
        for x, y in zip(qvec, c):
            acc = acc + x * y
        scores.append((acc, j))
    return [j for _, j in sorted(scores, key=lambda t: (-t[0], t[1]))]


def ivf_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
) -> DataFrame:
    """IVF approximate top-k: rank centroids by dot with the query
    (driver-side), probe the best ``nprobe`` inverted lists, exact cosine
    rank inside. At design scale the table is partitioned by centroid_id
    (io.ann_index), so the probe reads nprobe/n_centroids of the data."""
    centroids = centroids or ivf_centroids()
    probe = ivf_probe_order(qvec, centroids)[:nprobe]

    cand = emb.where(
        centroid_col(F.col("embedding"), centroids).isin([int(j) for j in probe])
    )
    return _topk_ranked(with_cosine(cand, qvec), k)


def lsh_dup_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Embedding near-duplicate pairs via multi-table sign-LSH candidate
    generation + exact cosine verification — the scale path for embedding
    dedup (mirrors text.minhash_lsh_pairs for documents).

    A pair is a candidate when the two vectors share a bucket in ANY of
    ``n_tables`` hash tables (OR-construction). Each table's self-join is
    an equi-join on the bucket id — NO crossJoin anywhere, so the work is
    sum over buckets of |bucket|^2 instead of n^2. Candidates are then
    exact-cosine verified against ``threshold``.

    Output: (vec_a, vec_b, cos) with vec_a < vec_b, cos >= threshold,
    restricted to LSH candidates (approximate recall, exact precision).
    """
    b = emb.select("vec_id", _emb_double(F.col("embedding")).alias("e")).withColumn(
        "nrm", F.sqrt(_norm2(F.col("e")))
    )
    for t in range(n_tables):
        planes = hyperplanes(n_planes, dim, seed=t * 1000)
        b = b.withColumn(f"b{t}", bucket_col(F.col("e"), planes))
    # one pass computes every table's bucket; materialized so the
    # per-table self-joins + scoring joins reuse it instead of
    # recomputing the HOF folds (at design scale: write_emb_index)
    b = b.localCheckpoint(eager=False)
    cand = None
    for t in range(n_tables):
        a_side = b.select(F.col("vec_id").alias("vec_a"), F.col(f"b{t}").alias("bk"))
        b_side = b.select(F.col("vec_id").alias("vec_b"), F.col(f"b{t}").alias("bk"))
        pairs_t = a_side.join(b_side, "bk").where(F.col("vec_a") < F.col("vec_b")).select(
            "vec_a", "vec_b"
        )
        cand = pairs_t if cand is None else cand.unionAll(pairs_t)
    cand = cand.distinct()
    ea = b.select(F.col("vec_id").alias("vec_a"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    eb = b.select(F.col("vec_id").alias("vec_b"), F.col("e").alias("eb"), F.col("nrm").alias("nb"))
    verified = cand.join(ea, "vec_a").join(eb, "vec_b")
    # norm precomputed per vector above — value bit-identical to the
    # per-pair sqrt(norm) recomputation (same fold, same operands)
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    return (
        verified.withColumn("cos", cos)
        .where(F.col("cos") >= F.lit(threshold))
        .select("vec_a", "vec_b", F.round("cos", 4).alias("cos"))
    )


def lsh_knn_pairs(
    emb: DataFrame,
    k: int = 3,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate all-pairs top-k neighbors via multi-table sign-LSH —
    the scale path for knn_pairs' O(n^2) crossJoin.

    Candidates for each vector are the vectors sharing a bucket in ANY
    hash table (equi-joins only); exact cosine ranks candidates per
    vector with a key-partitioned window (vec_id keys — a distributed
    shuffle, not a single reducer). Vectors whose buckets are singletons
    in every table produce no rows (approximate recall, exact precision
    on returned ranks).
    """
    # per-vector norm computed ONCE here (bit-identical to per-pair
    # recomputation — same fold, same operands — at 1/3 the HOF work)
    b = emb.select(
        "vec_id",
        _emb_double(F.col("embedding")).alias("e"),
    ).withColumn("nrm", F.sqrt(_norm2(F.col("e"))))
    for t in range(n_tables):
        planes = hyperplanes(n_planes, dim, seed=t * 1000)
        b = b.withColumn(f"b{t}", bucket_col(F.col("e"), planes))
    # materialize the bucketed frame once: it feeds n_tables self-joins +
    # two scoring joins, and each reference would otherwise recompute the
    # interpreted HOF bucket folds (at design scale: write_emb_index)
    b = b.localCheckpoint(eager=False)
    cand = None
    for t in range(n_tables):
        a_side = b.select(F.col("vec_id"), F.col(f"b{t}").alias("bk"))
        n_side = b.select(F.col("vec_id").alias("neighbor_id"), F.col(f"b{t}").alias("bk"))
        pairs_t = (
            a_side.join(n_side, "bk")
            .where(F.col("vec_id") != F.col("neighbor_id"))
            .select("vec_id", "neighbor_id")
        )
        cand = pairs_t if cand is None else cand.unionAll(pairs_t)
    cand = cand.distinct()
    ea = b.select(F.col("vec_id"), F.col("e").alias("ea"), F.col("nrm").alias("na"))
    eb = b.select(
        F.col("vec_id").alias("neighbor_id"), F.col("e").alias("eb"), F.col("nrm").alias("nb")
    )
    scored = cand.join(ea, "vec_id").join(eb, "neighbor_id")
    # JVM-side fold: measured equal-or-faster than a vectorized Arrow UDF
    # here — the UDF's numpy win is cancelled by shipping ~1KB of vector
    # payload per candidate pair through the Arrow boundary
    cos = _dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb"))
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("cos", cos)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("vec_id", "neighbor_id", "rank")
    )


def _query_bucket(qvec: list[float], planes: list[list[float]]) -> int:
    b = 0
    for j, plane in enumerate(planes):
        acc = 0.0
        for x, y in zip(qvec, plane):
            acc = acc + x * y
        if acc > 0.0:
            b |= 1 << j
    return b


def ann_topk(
    emb: DataFrame,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: a vector is a candidate
    when it shares the query's bucket in ANY of ``n_tables`` independent
    hash tables (OR-construction — the standard recall amplifier), then
    exact cosine ranks the candidates.

    At design scale the table is written bucketed by table-0's bucket and
    the per-table filters prune partitions, so the scan touches a fraction
    of 10^12 rows; candidate fraction ~= 1-(1-2^-m)^L for random data
    (here m=4, L=8 -> ~19% measured, recall@10 ~0.7).
    """
    match = F.lit(False)
    for t in range(n_tables):
        planes = hyperplanes(n_planes, len(qvec), seed=t * 1000)
        qb = _query_bucket(qvec, planes)
        match = match | (bucket_col(F.col("embedding"), planes) == F.lit(qb))
    cand = emb.where(match)
    return _topk_ranked(with_cosine(cand, qvec), k)
