"""Embedding similarity search operators (training-data pipeline).

The embedding column is ``array<float>``; scoring math happens JVM-side
in higher-order array expressions (zip_with/aggregate) after an exact
float->double cast, while the hot bucket/centroid assignment scans run
as ONE vectorized Arrow pass (``arrow_buckets_udf`` /
``arrow_centroid_udf`` — sequential-fold order, bit-identical to the
array expressions, ~10x the interpreted HOF fold throughput). No
per-row Python anywhere; no shuffle except the final top-k window over
bounded candidate sets.

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

import numpy as np
import pandas as pd
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


def _seq_dots_np(e, tables: list[list[list[float]]]):
    """numpy twin of ``_dot`` for a (n, dim) float64 batch: accumulate
    left-to-right per plane (acc = 0.0 + e0*p0 + e1*p1 + ...) so every
    per-row double is BIT-IDENTICAL to the JVM fold and to the oracle
    SQL's mirrored fold. Returns (n, total_planes) dots, tables
    concatenated in order."""
    n = e.shape[0]
    planes = [p for t in tables for p in t]
    out = np.empty((n, len(planes)), dtype=np.float64)
    for j, plane in enumerate(planes):
        acc = np.zeros(n, dtype=np.float64)
        for i, p in enumerate(plane):
            acc = acc + e[:, i] * p
        out[:, j] = acc
    return out


def _stack_emb(s):
    """pd.Series of float arrays -> (n, dim) float64 (exact upcast)."""
    if len(s) == 0:
        return np.empty((0, 0), dtype=np.float64)
    return np.stack(s.to_numpy()).astype(np.float64)


def arrow_buckets_udf(tables: list[list[list[float]]]):
    """One Arrow pass computing every LSH table's sign bucket — the
    vectorized twin of ``bucket_col`` (bit-identical by the sequential
    fold in ``_seq_dots_np``). Interpreted HOF folds cost ~60ns/element;
    this replaces n_tables*n_planes folds with one numpy matmul-shaped
    loop. Returns array<long> of len(tables) buckets per row."""
    from pyspark.sql.types import ArrayType, LongType

    widths = [len(t) for t in tables]

    @F.pandas_udf(ArrayType(LongType()))
    def _f(emb: pd.Series) -> pd.Series:
        e = _stack_emb(emb)
        if e.shape[0] == 0:
            return pd.Series([], dtype=object)
        d = _seq_dots_np(e, tables)
        cols = []
        off = 0
        for w in widths:
            bits = (d[:, off : off + w] > 0.0).astype(np.int64)
            cols.append(bits @ (np.int64(1) << np.arange(w, dtype=np.int64)))
            off += w
        arr = np.stack(cols, axis=1)
        return pd.Series(list(arr))

    return _f


def arrow_ann_match_udf(qvec: list[float], n_planes: int, n_tables: int):
    """Vectorized twin of ann_topk's scan filter: true iff the row shares
    the query's bucket in ANY table (same buckets as ``bucket_col`` by
    the sequential fold)."""
    from pyspark.sql.types import BooleanType

    tables = [hyperplanes(n_planes, len(qvec), seed=t * 1000) for t in range(n_tables)]
    qbs = [_query_bucket(qvec, t) for t in tables]

    @F.pandas_udf(BooleanType())
    def _f(emb: pd.Series) -> pd.Series:
        e = _stack_emb(emb)
        if e.shape[0] == 0:
            return pd.Series([], dtype=bool)
        d = _seq_dots_np(e, tables)
        m = np.zeros(e.shape[0], dtype=bool)
        off = 0
        for t, planes in enumerate(tables):
            w = len(planes)
            bits = (d[:, off : off + w] > 0.0).astype(np.int64)
            bk = bits @ (np.int64(1) << np.arange(w, dtype=np.int64))
            m |= bk == qbs[t]
            off += w
        return pd.Series(m)

    return _f


def arrow_centroid_udf(centroids: list[list[float]]):
    """Vectorized twin of ``centroid_col``: argmax-dot with first-index
    tie-break (np.argmax picks the first maximum — identical to the
    'first index equal to greatest' CASE chain)."""
    from pyspark.sql.types import IntegerType

    @F.pandas_udf(IntegerType())
    def _f(emb: pd.Series) -> pd.Series:
        e = _stack_emb(emb)
        if e.shape[0] == 0:
            return pd.Series([], dtype="int32")
        d = _seq_dots_np(e, [centroids])
        return pd.Series(np.argmax(d, axis=1).astype(np.int32))

    return _f


def lsh_buckets(emb: DataFrame, planes: list[list[float]] | None = None) -> DataFrame:
    planes = planes or hyperplanes()
    udf = arrow_buckets_udf([planes])
    return emb.select("vec_id", udf(F.col("embedding"))[0].alias("bucket"))


def ivf_centroids(n_centroids: int = 16, dim: int = 64) -> list[list[float]]:
    """Deterministic pseudo-centroids: ((j*131 + i*37) % 21 - 10) / 10 —
    the oracle-mirrorable coarse quantizer; see fit_ivf_centroids for the
    data-adaptive variant."""
    return [
        [((j * 131 + i * 37) % 21 - 10) / 10.0 for i in range(dim)]
        for j in range(n_centroids)
    ]


# hard ceiling on the driver-side k-means training sample: 2^18 rows of
# 64-dim float64 is ~128 MB — comfortably driver-sized; anything larger
# should train distributed (Spark MLlib KMeans), not silently balloon
# the driver
IVF_FIT_SAMPLE_MAX = 262_144


def fit_ivf_centroids(
    emb: DataFrame, n_centroids: int = 16, iters: int = 5, sample: int = 2048
) -> list[list[float]]:
    """Data-adaptive centroids: numpy k-means on a driver-side sample
    (seeded, deterministic) — the 'train the coarse quantizer on a sample'
    step every IVF index performs; the result broadcasts as constants.
    ``sample`` is hard-capped at ``IVF_FIT_SAMPLE_MAX`` — the quantizer
    needs a representative sample, never the table."""
    import numpy as np

    if sample > IVF_FIT_SAMPLE_MAX:
        raise ValueError(
            f"fit_ivf_centroids sample={sample} exceeds the driver-side "
            f"cap {IVF_FIT_SAMPLE_MAX}; a coarse quantizer does not need "
            "more — train distributed if it truly does"
        )
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
    udf = arrow_centroid_udf(centroids)
    return emb.select("vec_id", udf(F.col("embedding")).alias("centroid_id"))


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

    udf = arrow_centroid_udf(centroids)
    cand = emb.where(udf(F.col("embedding")).isin([int(j) for j in probe]))
    return _topk_ranked(with_cosine(cand, qvec), k)


_PAIR_SCORE_SCHEMA = "vec_id long, neighbor_id long, cos double"


def _bucket_pair_scores(
    b: DataFrame,
    bucket_name: str,
    threshold: float | None = None,
    topk: int | None = None,
    ordered_only: bool = False,
) -> DataFrame:
    """Intra-bucket pair cosines for ONE LSH table, scored INSIDE the
    bucket group (``applyInPandas``): each vector crosses the shuffle
    once (~0.5 KB) instead of once per candidate pair (the previous
    scoring join shipped BOTH vectors per pair — ~1 KB x |pairs| of
    shuffle at 19% candidate fraction, the operator's whole cost). The
    Gram accumulation adds the dim terms in index order, so every cosine
    is bit-identical to the ``_dot`` fold and the oracle SQL fold; the
    norm product uses the same per-vector ``nrm`` operand the join path
    used. Row-block chunking bounds the cos matrix at O(block x m).

    The downstream filters are pushed INTO the kernel so a bucket's
    OUTPUT is bounded too, not just its working set:

    - ``threshold``: keep only cos >= threshold (valid: the outer
      filter is identical).
    - ``ordered_only``: keep only vec_id < neighbor_id (valid when the
      caller wants unordered pairs: cos is symmetric — same fold inputs
      in either orientation of the Gram block).
    - ``topk``: per vec_id keep its k best neighbors within this bucket
      under the total order (cos desc, neighbor_id asc) — the SAME
      order the global window uses, so the global top-k is preserved:
      any pair in the global top-k of vec v beats all but <= k-1 other
      candidates globally, hence beats all but <= k-1 within every
      bucket that contains it, hence survives that bucket's cut.
      Output <= m x k rows per bucket instead of m^2.
    """

    def score(pdf: pd.DataFrame) -> pd.DataFrame:
        m = len(pdf)
        if m < 2:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        e = np.stack(pdf["e"].to_numpy()).astype(np.float64)
        nrm = pdf["nrm"].to_numpy(dtype=np.float64)
        ids = pdf["vec_id"].to_numpy(dtype=np.int64)
        out_a, out_b, out_c = [], [], []
        block = 2048
        for s in range(0, m, block):
            eb = e[s : s + block]
            g = np.zeros((eb.shape[0], m), dtype=np.float64)
            for d in range(e.shape[1]):
                g = g + eb[:, d][:, None] * e[:, d][None, :]
            cos = g / (nrm[s : s + block][:, None] * nrm[None, :])
            keep = np.ones_like(cos, dtype=bool)
            rows = np.arange(s, s + eb.shape[0])
            keep[rows - s, rows] = False  # drop self-pairs
            if ordered_only:
                keep &= ids[s : s + eb.shape[0], None] < ids[None, :]
            if threshold is not None:
                keep &= cos >= threshold
            if topk is not None and m - 1 > topk:
                # rank neighbors per row by (cos desc, neighbor_id asc);
                # argsort the composite order lexicographically
                order = np.lexsort((ids[None, :].repeat(eb.shape[0], 0), -cos), axis=1)
                ranked_keep = np.zeros_like(keep)
                # walk the order, counting only surviving candidates
                surv = np.take_along_axis(keep, order, axis=1)
                csum = np.cumsum(surv, axis=1)
                within = surv & (csum <= topk)
                np.put_along_axis(ranked_keep, order, within, axis=1)
                keep = ranked_keep
            bi, bj = np.nonzero(keep)
            out_a.append(ids[bi + s])
            out_b.append(ids[bj])
            out_c.append(cos[bi, bj])
        return pd.DataFrame(
            {
                "vec_id": np.concatenate(out_a),
                "neighbor_id": np.concatenate(out_b),
                "cos": np.concatenate(out_c),
            }
        )

    return (
        b.select("vec_id", "e", "nrm", F.col(bucket_name).alias("bk"))
        .groupBy("bk")
        .applyInPandas(score, _PAIR_SCORE_SCHEMA)
    )


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
    tables = [hyperplanes(n_planes, dim, seed=t * 1000) for t in range(n_tables)]
    bks = arrow_buckets_udf(tables)
    b = (
        emb.select("vec_id", _emb_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", F.sqrt(_norm2(F.col("e"))))
        .withColumn("bks", bks(F.col("e")))
    )
    for t in range(n_tables):
        b = b.withColumn(f"b{t}", F.col("bks")[t])
    b = b.drop("bks")
    # one pass computes every table's bucket; materialized so the
    # per-table self-joins + scoring joins reuse it instead of
    # recomputing the folds (at design scale: write_emb_index)
    b = b.localCheckpoint(eager=False)
    # score INSIDE each table's buckets with the threshold and the
    # a<b orientation pushed into the kernel (see _bucket_pair_scores),
    # so each bucket emits only final-result rows; a pair sharing
    # several buckets gets the SAME bit-exact cosine in each, so
    # deduping on the pair key after the union is safe
    scored = None
    for t in range(n_tables):
        pairs_t = _bucket_pair_scores(b, f"b{t}", threshold=threshold, ordered_only=True)
        scored = pairs_t if scored is None else scored.unionAll(pairs_t)
    return (
        scored.dropDuplicates(["vec_id", "neighbor_id"])
        .select(
            F.col("vec_id").alias("vec_a"),
            F.col("neighbor_id").alias("vec_b"),
            F.round("cos", 4).alias("cos"),
        )
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
    tables = [hyperplanes(n_planes, dim, seed=t * 1000) for t in range(n_tables)]
    bks = arrow_buckets_udf(tables)
    b = (
        emb.select("vec_id", _emb_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", F.sqrt(_norm2(F.col("e"))))
        .withColumn("bks", bks(F.col("e")))
    )
    for t in range(n_tables):
        b = b.withColumn(f"b{t}", F.col("bks")[t])
    b = b.drop("bks")
    # materialize the bucketed frame once: it feeds n_tables self-joins +
    # two scoring joins, and each reference would otherwise recompute the
    # bucket pass (at design scale: write_emb_index)
    b = b.localCheckpoint(eager=False)
    # score INSIDE each table's buckets (one vector per shuffle row, not
    # one per candidate pair) with the per-vector top-k pushed into the
    # kernel — each bucket emits <= m*k rows, and the global top-k is
    # preserved because the kernel cuts under the SAME total order the
    # window below uses; a pair sharing several buckets gets the SAME
    # bit-exact cosine in each, so the pair-key dedup below is safe
    scored = None
    for t in range(n_tables):
        pairs_t = _bucket_pair_scores(b, f"b{t}", topk=k)
        scored = pairs_t if scored is None else scored.unionAll(pairs_t)
    scored = scored.dropDuplicates(["vec_id", "neighbor_id"])
    w = Window.partitionBy("vec_id").orderBy(F.col("cos").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
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
    match = arrow_ann_match_udf(qvec, n_planes, n_tables)
    cand = emb.where(match(F.col("embedding")))
    return _topk_ranked(with_cosine(cand, qvec), k)
