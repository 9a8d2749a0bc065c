"""Oracle-checked queries for the training-data pipeline operators
(text dedup/analysis over ``documents``, similarity search over
``embeddings``) — same bit-parity design as spatial4n_spark.suite:
integer/string outputs exact; doubles are ratios of identical operands
folded in identical order in both engines.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark import text as T
from spatial4n_spark import similarity as S
from spatial4n_spark.oracles import dlit

# ---------------------------------------------------------------------------
# shared SQL fragments (mirror text.tokens_col / shingle_sets exactly)
# ---------------------------------------------------------------------------

TOKS_SQL = "list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '')"

SHINGLES_SQL = (
    "CASE WHEN len(t) >= 2 THEN "
    "list_distinct(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) "
    "ELSE []::VARCHAR[] END"
)


def _h_sql(expr: str, nibbles: int = 15) -> str:
    """DuckDB twin of text.md5_long."""
    return f"('0x' || substr(md5({expr}), 1, {nibbles}))::BIGINT"


def _scan_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Same scan-parallelism stand-in as suite._scan: the sandbox parquet
    is single-row-group (unsplittable), so without the opt-in
    ``spark.spatial4n.scan.partitions`` repartition a quadratic row like
    emb_knn runs its whole cross join on 1-2 tasks at big sf — a real
    table's multi-file scan parallelizes naturally."""
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    try:
        n = int(spark.conf.get("spark.spatial4n.scan.partitions", "0"))
    except Exception:  # noqa: BLE001
        n = 0
    return df.repartition(n) if n > 0 else df


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scan_table(spark, sf_dir, "documents")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _scan_table(spark, sf_dir, "embeddings")


# ---------------------------------------------------------------------------
# documents
# ---------------------------------------------------------------------------


def q_doc_dedup(spark, sf_dir):
    """Exact dedup: content-hash groups."""
    return T.exact_dedup(_docs(spark, sf_dir))


SQL_DOC_DEDUP = (
    "SELECT md5(text) AS text_md5, count(*) AS n, min(doc_id) AS min_doc_id "
    "FROM documents GROUP BY 1"
)


def q_doc_token_stats(spark, sf_dir):
    return T.token_stats(_docs(spark, sf_dir))


SQL_DOC_TOKEN_STATS = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t, text FROM documents)
SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
       CAST(len(list_distinct(t)) AS INTEGER) AS n_distinct,
       CAST(len(regexp_extract_all(text, '{T.SUBTOKEN_REGEX}')) AS INTEGER) AS n_subtokens,
       CAST(length(text) AS INTEGER) AS n_chars_m
FROM toks"""


def q_doc_quality(spark, sf_dir):
    return T.quality(_docs(spark, sf_dir))


SQL_DOC_QUALITY = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t, text FROM documents)
SELECT doc_id, CAST(len(t) AS INTEGER) AS n_tokens,
       CAST(len(list_filter(t, x -> x IN {T.STOPWORDS!r})) AS INTEGER) AS n_stop,
       CAST(length(regexp_replace(text, '[ -~]', '', 'g')) AS INTEGER) AS n_non_ascii,
       len(list_filter(t, x -> x IN {T.STOPWORDS!r})) / len(t) AS stop_ratio
FROM toks"""


def q_doc_langid(spark, sf_dir):
    return T.langid(_docs(spark, sf_dir))


def _sql_doc_langid() -> str:
    scores = {
        lang: f"CAST(len(list_filter(t, x -> x IN {markers!r})) AS INTEGER)"
        for lang, markers in T.LANG_MARKERS.items()
    }
    pred = (
        f"CASE WHEN s_en >= greatest(s_de, s_fr, s_es) THEN 'en' "
        f"WHEN s_de >= greatest(s_fr, s_es) THEN 'de' "
        f"WHEN s_fr >= s_es THEN 'fr' ELSE 'es' END"
    )
    cols = ", ".join(f"{e} AS s_{lang}" for lang, e in scores.items())
    return f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
s AS (SELECT doc_id, {cols} FROM toks)
SELECT doc_id, s_en AS score_en, s_de AS score_de, s_fr AS score_fr,
       s_es AS score_es, {pred} AS lang_pred
FROM s"""


JACCARD_THRESHOLD = 0.06
MAX_DF = 50


def q_doc_jaccard(spark, sf_dir):
    """Exact n-gram Jaccard near-dup pairs (shingle self-join)."""
    return T.jaccard_pairs(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD, max_df=MAX_DF)


JACCARD_CTES = f"""toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
g AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM toks),
ex0 AS (SELECT doc_id, unnest(sh) AS shingle FROM g),
dfc AS (SELECT shingle, count(*) AS dfn FROM ex0 GROUP BY 1),
ex AS (SELECT ex0.doc_id, ex0.shingle FROM ex0 JOIN dfc USING (shingle) WHERE dfn <= {MAX_DF}),
sizes AS (SELECT doc_id, count(*) AS sz FROM ex GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM ex a JOIN ex b USING (shingle) WHERE a.doc_id < b.doc_id GROUP BY 1, 2
),
jpairs AS (
  SELECT doc_a, doc_b, i / (sa.sz + sb.sz - i) AS jacc
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE i / (sa.sz + sb.sz - i) >= {dlit(JACCARD_THRESHOLD)}
)"""

SQL_DOC_JACCARD = f"""
WITH {JACCARD_CTES}
SELECT doc_a, doc_b, jacc AS jaccard FROM jpairs"""

def q_doc_dup_clusters(spark, sf_dir):
    """Near-dup clustering: connected components (distributed min-label
    propagation) over the Jaccard near-dup pairs; cluster_id = min doc id."""
    pairs = T.jaccard_pairs(_docs(spark, sf_dir), threshold=JACCARD_THRESHOLD, max_df=MAX_DF)
    return T.dup_clusters(pairs)


SQL_DOC_DUP_CLUSTERS = f"""
WITH RECURSIVE {JACCARD_CTES},
e AS (
  SELECT doc_a AS a, doc_b AS b FROM jpairs
  UNION
  SELECT doc_b AS a, doc_a AS b FROM jpairs
),
reach(a, b) AS (
  SELECT a, b FROM e
  UNION
  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a
)
SELECT a AS doc_id, least(a, min(b)) AS cluster_id FROM reach GROUP BY a"""

MINHASH_K = 16
MINHASH_BANDS = 4


def q_doc_minhash(spark, sf_dir):
    """MinHash+LSH banding candidates with exact-Jaccard verification."""
    return T.minhash_lsh_pairs(
        _docs(spark, sf_dir), k=MINHASH_K, bands=MINHASH_BANDS, threshold=0.0
    )


def _sql_doc_minhash() -> str:
    rows = MINHASH_K // MINHASH_BANDS
    mh_parts = []
    for i in range(MINHASH_K):
        seeded = "s || '#%d'" % i
        mh_parts.append(f"list_min(list_transform(sh, s -> {_h_sql(seeded)})) AS mh{i}")
    mh_cols = ", ".join(mh_parts)
    band_cols = ", ".join(
        "md5("
        + " || ',' || ".join(f"mh{b * rows + r}::VARCHAR" for r in range(rows))
        + f") AS band{b}"
        for b in range(MINHASH_BANDS)
    )
    cand_union = "\nUNION ALL\n".join(
        f"SELECT a.doc_id AS doc_a, b.doc_id AS doc_b FROM bands a "
        f"JOIN bands b ON a.band{b} = b.band{b} AND a.doc_id < b.doc_id"
        for b in range(MINHASH_BANDS)
    )
    return f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
g AS (SELECT doc_id, {SHINGLES_SQL} AS sh FROM toks),
sig AS (SELECT doc_id, sh, {mh_cols} FROM g WHERE len(sh) > 0),
bands AS (SELECT doc_id, sh, {band_cols} FROM sig),
cand AS (SELECT DISTINCT doc_a, doc_b FROM ({cand_union}))
SELECT doc_a, doc_b, i / (la + lb - i) AS jaccard FROM (
  SELECT c.doc_a, c.doc_b,
         len(list_filter(a.sh, x -> list_contains(b.sh, x))) AS i,
         len(a.sh) AS la, len(b.sh) AS lb
  FROM cand c
  JOIN bands a ON a.doc_id = c.doc_a
  JOIN bands b ON b.doc_id = c.doc_b
)"""


def q_doc_simhash(spark, sf_dir):
    return T.simhash(_docs(spark, sf_dir))


def _sql_doc_simhash(bits: int = 16) -> str:
    vote = (
        "coalesce(list_sum(list_transform(hs, "
        "v -> CASE WHEN (v >> {b}) % 2 = 1 THEN 1 ELSE -1 END)), 0)"
    )
    terms = " + ".join(
        f"(CASE WHEN {vote.format(b=b)} > 0 THEN {2 ** b} ELSE 0 END)" for b in range(bits)
    )
    return f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents),
h AS (SELECT doc_id, list_transform(t, x -> {_h_sql('x', 4)}) AS hs FROM toks)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM h"""


def q_doc_fingerprint(spark, sf_dir):
    return T.fingerprint(_docs(spark, sf_dir))


SQL_DOC_FINGERPRINT = f"""
WITH toks AS (SELECT doc_id, {TOKS_SQL} AS t FROM documents)
SELECT doc_id, CAST(list_reduce(
  list_prepend(0::BIGINT, list_transform(t, x -> {_h_sql('x', 8)})),
  (a, b) -> (a * 31 + b) % {T.HASH_MOD}) AS BIGINT) AS fingerprint
FROM toks"""

# ---------------------------------------------------------------------------
# embeddings
# ---------------------------------------------------------------------------

DIM = 64
QVEC = S.query_vector(DIM)
QNORM = math.sqrt(sum(v * v for v in QVEC))
PLANES = S.hyperplanes(16, DIM)


def _list_lit(vals) -> str:
    return "[" + ", ".join(dlit(v) for v in vals) + "]"


def _dot_sql(a: str, b: str, dim: int = DIM) -> str:
    """Sequential fold 0.0 + t1 + ... — mirrors similarity._dot."""
    return (
        f"list_reduce(list_prepend(0e0, "
        f"list_transform(range(1, {dim + 1}), i -> {a}[i] * {b}[i])), (x, y) -> x + y)"
    )


def _dot_sql_unrolled(a: str, b: str, dim: int = DIM) -> str:
    """Same left-fold accumulation as ``_dot_sql`` — SQL ``+`` is
    left-associative, so ``0e0 + t1 + ... + tn`` is bit-identical to the
    list_reduce prepend-0 fold — but each term is a native vectorized
    multiply instead of an interpreted per-element lambda (~30x cheaper
    per pair).  Used in the PAIR oracles, where the in-bucket join makes
    per-pair dot cost the sweep's dominant term."""
    return "(0e0 + " + " + ".join(f"{a}[{i}] * {b}[{i}]" for i in range(1, dim + 1)) + ")"


def q_emb_cosine_topk(spark, sf_dir):
    return S.cosine_topk(_emb(spark, sf_dir), QVEC, k=20)


def _sql_emb_cosine_topk() -> str:
    q = _list_lit(QVEC)
    cos = f"({_dot_sql('v', f'({q})')} / (sqrt({_dot_sql('v', 'v')}) * {dlit(QNORM)}))"
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
c AS (SELECT vec_id, {cos} AS cos FROM e),
r AS (SELECT vec_id, cos,
        CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
      FROM c)
SELECT vec_id, rank, round(cos, 4) AS cos FROM r WHERE rank <= 20"""


def q_emb_knn(spark, sf_dir):
    return S.knn_pairs(_emb(spark, sf_dir), k=3)


def _sql_emb_knn() -> str:
    # norms precomputed per vector and the (vec_id, neighbor_id, cos)
    # triple projected BEFORE the window: with the cosine inline in the
    # window's ORDER BY, the sort input carries both 64-double vectors
    # (~1 KB/row — a 400 GB spill at sf1's 20k x 20k pairs, which blew
    # the disk); narrow rows spill ~20 GB.  Bit-parity is preserved:
    # sqrt(dot(a,a)) * sqrt(dot(b,b)) is the same IEEE op sequence
    # whether the sqrt is inlined or named.
    cos = f"({_dot_sql('a.v', 'b.v')} / (a.nrm * b.nrm))"
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
n AS (SELECT vec_id, v, sqrt({_dot_sql('v', 'v')}) AS nrm FROM e),
p AS (SELECT a.vec_id AS a_vec_id, b.vec_id AS neighbor_id, {cos} AS cos
      FROM n a JOIN n b ON a.vec_id <> b.vec_id)
SELECT a_vec_id AS vec_id, neighbor_id, rank FROM (
  SELECT a_vec_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY a_vec_id
              ORDER BY cos DESC, neighbor_id ASC) AS INTEGER) AS rank
  FROM p
) WHERE rank <= 3"""


def q_emb_lsh_buckets(spark, sf_dir):
    return S.lsh_buckets(_emb(spark, sf_dir), PLANES)


def _sql_emb_lsh_buckets() -> str:
    terms = " + ".join(
        f"(CASE WHEN {_dot_sql('v', f'({_list_lit(p)})')} > 0e0 THEN {2 ** j} ELSE 0 END)"
        for j, p in enumerate(PLANES)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings)
SELECT vec_id, CAST({terms} AS BIGINT) AS bucket FROM e"""


DUP_COS_THRESHOLD = 0.4
DUP_PLANES = 4
DUP_TABLES = 8


def q_emb_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-duplicate pairs (the embedding dedup flavor):
    multi-table sign-LSH bucket candidates (equi-joins, no crossJoin) +
    exact cosine verification >= threshold."""
    return S.lsh_dup_pairs(
        _emb(spark, sf_dir),
        threshold=DUP_COS_THRESHOLD,
        dim=DIM,
        n_planes=DUP_PLANES,
        n_tables=DUP_TABLES,
    )


def _sql_emb_dup_pairs() -> str:
    """Mirror of lsh_dup_pairs: same per-table bucket formulas, same
    bucket self-joins, same exact verify (pattern of _sql_doc_minhash).

    sf1-sweep-linearized: the threshold filter is pushed INSIDE each
    per-table bucket join (the engine's own in-kernel pushdown — a
    threshold filter trivially commutes with UNION/DISTINCT), the
    per-pair dot is the unrolled bit-identical fold, and per-vector
    norms are hoisted into ``bk`` (same sqrt(dot(v,v)) value, computed
    once per vector instead of once per pair)."""
    bucket_cols = []
    for t in range(DUP_TABLES):
        planes = S.hyperplanes(DUP_PLANES, DIM, seed=t * 1000)
        expr = " + ".join(
            f"(CASE WHEN {_dot_sql('v', f'({_list_lit(p)})')} > 0e0 THEN {2 ** j} ELSE 0 END)"
            for j, p in enumerate(planes)
        )
        bucket_cols.append(f"CAST({expr} AS BIGINT) AS b{t}")
    cos = f"({_dot_sql_unrolled('x.v', 'y.v')} / (x.nv * y.nv))"
    per_table = "\nUNION ALL\n".join(
        f"SELECT x.vec_id AS vec_a, y.vec_id AS vec_b, {cos} AS cos "
        f"FROM bk x JOIN bk y ON x.b{t} = y.b{t} AND x.vec_id < y.vec_id "
        f"WHERE {cos} >= {dlit(DUP_COS_THRESHOLD)}"
        for t in range(DUP_TABLES)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
bk AS MATERIALIZED (SELECT vec_id, v, sqrt({_dot_sql_unrolled('v', 'v')}) AS nv,
                    {", ".join(bucket_cols)} FROM e)
SELECT vec_a, vec_b, round(cos, 4) AS cos
FROM (SELECT DISTINCT vec_a, vec_b, cos FROM ({per_table}))"""


IVF_CENTROIDS = S.ivf_centroids(16, DIM)
IVF_NPROBE = 4


def q_emb_ivf_buckets(spark, sf_dir):
    """IVF coarse-quantizer assignment (argmax-dot centroid per vector)."""
    return S.ivf_assign(_emb(spark, sf_dir), IVF_CENTROIDS)


def _ivf_stage_ctes():
    """CTEs computing d0..d15, their variadic greatest, and the argmax as
    first-index-equal-to-best — semantically identical to the Spark
    strict-> fold (first maximum wins ties) but with every subexpression
    referenced once (a chained fold goes exponential when DuckDB inlines
    the stacked projections)."""
    n = len(IVF_CENTROIDS)
    dots = ", ".join(
        f"{_dot_sql('v', f'({_list_lit(c)})')} AS d{j}" for j, c in enumerate(IVF_CENTROIDS)
    )
    best = "greatest(" + ", ".join(f"d{j}" for j in range(n)) + ")"
    arg = "CASE " + " ".join(f"WHEN d{j} = best THEN {j}" for j in range(n)) + " END"
    # AS MATERIALIZED: without it DuckDB inlines the CTEs and `best`
    # re-expands into all 16 WHEN branches (16x16 dot folds per row)
    ctes = (
        f"dts AS MATERIALIZED (SELECT vec_id, v, {dots} FROM e),\n"
        f"bst AS MATERIALIZED (SELECT *, {best} AS best FROM dts),\n"
        f"am AS MATERIALIZED (SELECT *, {arg} AS amax FROM bst)"
    )
    return ctes, "am", "amax"


def _sql_emb_ivf_buckets() -> str:
    ctes, last, idx = _ivf_stage_ctes()
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
{ctes}
SELECT vec_id, CAST({idx} AS INTEGER) AS centroid_id FROM {last}"""


def q_emb_ivf_topk(spark, sf_dir):
    """IVF probe search: top-nprobe inverted lists, exact cosine rank."""
    return S.ivf_topk(_emb(spark, sf_dir), QVEC, k=10, centroids=IVF_CENTROIDS, nprobe=IVF_NPROBE)


def _sql_emb_ivf_topk() -> str:
    scores = []
    for j, c in enumerate(IVF_CENTROIDS):
        acc = 0.0
        for x, y in zip(QVEC, c):
            acc = acc + x * y
        scores.append((acc, j))
    probe = [j for _, j in sorted(scores, key=lambda t: (-t[0], t[1]))[:IVF_NPROBE]]
    ctes, last, idx = _ivf_stage_ctes()
    q = _list_lit(QVEC)
    cos = f"({_dot_sql('v', f'({q})')} / (sqrt({_dot_sql('v', 'v')}) * {dlit(QNORM)}))"
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
{ctes},
cand AS (SELECT vec_id, v FROM {last} WHERE {idx} IN ({", ".join(str(j) for j in probe)})),
c AS (SELECT vec_id, {cos} AS cos FROM cand),
r AS (SELECT vec_id, cos,
        CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
      FROM c)
SELECT vec_id, rank, round(cos, 4) AS cos FROM r WHERE rank <= 10"""


def q_emb_knn_lsh(spark, sf_dir):
    """Approximate all-pairs kNN via multi-table sign-LSH candidates —
    the scale path for emb_knn's O(n^2) baseline (equi-joins + a
    key-partitioned top-k window only)."""
    return S.lsh_knn_pairs(
        _emb(spark, sf_dir), k=3, dim=DIM, n_planes=DUP_PLANES, n_tables=DUP_TABLES
    )


def _sql_emb_knn_lsh() -> str:
    """Mirror of lsh_knn_pairs: per-table bucket self-joins (directional),
    exact cosine, per-vector rank.

    sf1-sweep-linearized with the engine's own in-kernel pushdown: each
    per-table join keeps only its per-vector top-k (a neighbor in the
    GLOBAL top-k that met the query through table t necessarily ranks
    <= k among table t's candidates too, so per-table top-k before the
    union/distinct is result-preserving), the per-pair dot is the
    unrolled bit-identical fold, and per-vector norms are hoisted."""
    k = 3
    bucket_cols = []
    for t in range(DUP_TABLES):
        planes = S.hyperplanes(DUP_PLANES, DIM, seed=t * 1000)
        expr = " + ".join(
            f"(CASE WHEN {_dot_sql('v', f'({_list_lit(p)})')} > 0e0 THEN {2 ** j} ELSE 0 END)"
            for j, p in enumerate(planes)
        )
        bucket_cols.append(f"CAST({expr} AS BIGINT) AS b{t}")
    cos = f"({_dot_sql_unrolled('x.v', 'y.v')} / (x.nv * y.nv))"
    per_table = "\nUNION ALL\n".join(
        f"SELECT vec_id, neighbor_id, cos FROM ("
        f"  SELECT vec_id, neighbor_id, cos,"
        f"         row_number() OVER (PARTITION BY vec_id"
        f"                            ORDER BY cos DESC, neighbor_id ASC) AS rk"
        f"  FROM (SELECT x.vec_id AS vec_id, y.vec_id AS neighbor_id, {cos} AS cos"
        f"        FROM bk x JOIN bk y ON x.b{t} = y.b{t} AND x.vec_id <> y.vec_id)"
        f") WHERE rk <= {k}"
        for t in range(DUP_TABLES)
    )
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
bk AS MATERIALIZED (SELECT vec_id, v, sqrt({_dot_sql_unrolled('v', 'v')}) AS nv,
                    {", ".join(bucket_cols)} FROM e),
ded AS (SELECT DISTINCT vec_id, neighbor_id, cos FROM ({per_table}))
SELECT vec_id, neighbor_id, rank FROM (
  SELECT vec_id, neighbor_id,
         CAST(row_number() OVER (PARTITION BY vec_id ORDER BY cos DESC, neighbor_id ASC)
              AS INTEGER) AS rank
  FROM ded
) WHERE rank <= {k}"""


ANN_PLANES = 4
ANN_TABLES = 8


def q_emb_ann(spark, sf_dir):
    """Multi-table LSH-bucketed approximate top-k (recall vs the exact
    baseline additionally asserted in tests/test_text_similarity.py)."""
    return S.ann_topk(_emb(spark, sf_dir), QVEC, k=10, n_planes=ANN_PLANES, n_tables=ANN_TABLES)


def _sql_emb_ann() -> str:
    """SQL twin of the multi-table bucket filter: per-table sign buckets
    from the same integer-formula hyperplanes, OR-matched against the
    query's bucket (computed here, driver-side, exactly as ann_topk does),
    then exact cosine rank."""
    match_terms = []
    for t in range(ANN_TABLES):
        planes = S.hyperplanes(ANN_PLANES, DIM, seed=t * 1000)
        qb = S._query_bucket(QVEC, planes)
        bucket = " + ".join(
            f"(CASE WHEN {_dot_sql('v', f'({_list_lit(p)})')} > 0e0 THEN {2 ** j} ELSE 0 END)"
            for j, p in enumerate(planes)
        )
        match_terms.append(f"(({bucket}) = {qb})")
    match = " OR ".join(match_terms)
    q = _list_lit(QVEC)
    cos = f"({_dot_sql('v', f'({q})')} / (sqrt({_dot_sql('v', 'v')}) * {dlit(QNORM)}))"
    return f"""
WITH e AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS v FROM embeddings),
cand AS (SELECT vec_id, v FROM e WHERE {match}),
c AS (SELECT vec_id, {cos} AS cos FROM cand),
r AS (SELECT vec_id, cos,
        CAST(row_number() OVER (ORDER BY cos DESC, vec_id ASC) AS INTEGER) AS rank
      FROM c)
SELECT vec_id, rank, round(cos, 4) AS cos FROM r WHERE rank <= 10"""


# ---------------------------------------------------------------------------
# materialized-index probes (build once per sf tier, probe many)
# ---------------------------------------------------------------------------

_INDEX_CACHE: dict[str, str] = {}


def _emb_index_path(spark: SparkSession, sf_dir: str) -> str:
    """Build-once path of the materialized ANN index for this sf tier
    (io.ann_index) — the storage artifact both indexed gate queries probe.
    Keyed by (dir, source mtime) so a regenerated testdata tier rebuilds."""
    import hashlib
    import os
    import tempfile

    src = f"{sf_dir.rstrip('/')}/embeddings.parquet"
    key = f"{src}:{os.path.getmtime(src)}:{ANN_PLANES}:{ANN_TABLES}"
    if key not in _INDEX_CACHE:
        # directory name depends on the SOURCE PATH + params only (not the
        # mtime): a regenerated tier rebuilds IN PLACE instead of leaking
        # one full-size orphaned index copy per regeneration; the mtime key
        # lives in the io.buildonce marker that gates the rebuild
        from spatial4n_spark.io.ann_index import write_emb_index
        from spatial4n_spark.io.buildonce import ensure_built

        path = os.path.join(
            tempfile.gettempdir(),
            "spatial4n_emb_index",
            hashlib.md5(f"{src}:{ANN_PLANES}:{ANN_TABLES}".encode()).hexdigest()[:16],
        )
        _INDEX_CACHE[key] = ensure_built(
            path,
            key,
            lambda p: write_emb_index(
                _emb(spark, sf_dir),
                p,
                centroids=IVF_CENTROIDS,
                dim=DIM,
                n_planes=ANN_PLANES,
                n_tables=ANN_TABLES,
            ),
        )
    return _INDEX_CACHE[key]


def q_emb_ann_indexed(spark, sf_dir):
    """Multi-table LSH top-k probed against STORED bucket columns of the
    materialized index — the 100-TB ANN path (pushed integer filters, no
    per-row hyperplane recompute). Same result as q_emb_ann by
    construction; oracle = the same SQL twin."""
    from spatial4n_spark.io.ann_index import ann_topk_indexed

    return ann_topk_indexed(
        spark,
        _emb_index_path(spark, sf_dir),
        QVEC,
        k=10,
        n_planes=ANN_PLANES,
        n_tables=ANN_TABLES,
    )


def q_emb_ivf_topk_indexed(spark, sf_dir):
    """IVF probe via partition pruning on the materialized index
    (centroid_id directories are listed, not scanned) — the 100-TB IVF
    path. Same result as q_emb_ivf_topk; oracle = the same SQL twin."""
    from spatial4n_spark.io.ann_index import ivf_topk_indexed

    return ivf_topk_indexed(
        spark,
        _emb_index_path(spark, sf_dir),
        QVEC,
        k=10,
        centroids=IVF_CENTROIDS,
        nprobe=IVF_NPROBE,
    )


# ---------------------------------------------------------------------------
# family consolidation (round-4: the driver gate checks at most 50
# queries() entries, so 1:1 per-doc/per-vec operators are joined into
# wide rows and twin operators sharing a schema are unioned under a
# tag column — every operator family lands inside the audited window.
# The individual q_* functions above remain the public/test surface.)
# ---------------------------------------------------------------------------


def q_doc_profile(spark, sf_dir):
    """Token stats + quality scoring + language-ID verified in ONE row
    per document (1:1 joins on doc_id; quality's duplicate n_tokens
    dropped)."""
    t = q_doc_token_stats(spark, sf_dir)
    q = q_doc_quality(spark, sf_dir).drop("n_tokens")
    l = q_doc_langid(spark, sf_dir)
    return t.join(q, "doc_id").join(l, "doc_id")


def _sql_doc_profile() -> str:
    return f"""SELECT t.*, q.n_stop, q.n_non_ascii, q.stop_ratio,
       l.score_en, l.score_de, l.score_fr, l.score_es, l.lang_pred
FROM ({SQL_DOC_TOKEN_STATS}) t
JOIN (SELECT doc_id, n_stop, n_non_ascii, stop_ratio FROM ({SQL_DOC_QUALITY})) q
  USING (doc_id)
JOIN ({_sql_doc_langid()}) l USING (doc_id)"""


def q_doc_neardup_pairs(spark, sf_dir):
    """Both near-dup pair finders — exact shingle-Jaccard self-join and
    MinHash+LSH banding — under one `method` column (both emit
    (doc_a, doc_b, jaccard))."""
    j = q_doc_jaccard(spark, sf_dir).select(
        F.lit("jaccard").alias("method"), "doc_a", "doc_b", "jaccard"
    )
    m = q_doc_minhash(spark, sf_dir).select(
        F.lit("minhash").alias("method"), "doc_a", "doc_b", "jaccard"
    )
    return j.unionByName(m)


def _sql_doc_neardup_pairs() -> str:
    return (
        f"SELECT 'jaccard' AS method, * FROM ({SQL_DOC_JACCARD})\n"
        f"UNION ALL\nSELECT 'minhash' AS method, * FROM ({_sql_doc_minhash()})"
    )


def q_doc_hashes(spark, sf_dir):
    """SimHash + rolling-hash fingerprint verified in ONE row per
    document (1:1 join on doc_id)."""
    return q_doc_simhash(spark, sf_dir).join(
        q_doc_fingerprint(spark, sf_dir), "doc_id"
    )


def _sql_doc_hashes() -> str:
    return f"""SELECT s.doc_id, s.simhash, f.fingerprint
FROM ({_sql_doc_simhash()}) s JOIN ({SQL_DOC_FINGERPRINT}) f USING (doc_id)"""


def q_emb_buckets(spark, sf_dir):
    """Sign-LSH bucket + IVF coarse-quantizer assignment verified in ONE
    row per vector (1:1 join on vec_id)."""
    return q_emb_lsh_buckets(spark, sf_dir).join(
        q_emb_ivf_buckets(spark, sf_dir), "vec_id"
    )


def _sql_emb_buckets() -> str:
    return f"""SELECT b.vec_id, b.bucket, i.centroid_id
FROM ({_sql_emb_lsh_buckets()}) b JOIN ({_sql_emb_ivf_buckets()}) i USING (vec_id)"""


def q_emb_ann_paths(spark, sf_dir):
    """Multi-table LSH top-k through BOTH execution paths — per-row
    hyperplane recompute scan vs the materialized index's stored bucket
    columns — under one `path` column. The branches return identical
    rows by construction; a regression in either (or in the index
    build/probe) flips this row."""
    s = q_emb_ann(spark, sf_dir).select(
        F.lit("scan").alias("path"), "vec_id", "rank", "cos"
    )
    i = q_emb_ann_indexed(spark, sf_dir).select(
        F.lit("indexed").alias("path"), "vec_id", "rank", "cos"
    )
    return s.unionByName(i)


def _sql_emb_ann_paths() -> str:
    ann = _sql_emb_ann()
    return (
        f"SELECT 'scan' AS path, * FROM ({ann})\n"
        f"UNION ALL\nSELECT 'indexed' AS path, * FROM ({ann})"
    )


def q_emb_ivf_topk_paths(spark, sf_dir):
    """IVF probe search through BOTH execution paths — argmax-dot scan
    vs centroid-partition pruning on the materialized index — under one
    `path` column."""
    s = q_emb_ivf_topk(spark, sf_dir).select(
        F.lit("scan").alias("path"), "vec_id", "rank", "cos"
    )
    i = q_emb_ivf_topk_indexed(spark, sf_dir).select(
        F.lit("indexed").alias("path"), "vec_id", "rank", "cos"
    )
    return s.unionByName(i)


def _sql_emb_ivf_topk_paths() -> str:
    ivf = _sql_emb_ivf_topk()
    return (
        f"SELECT 'scan' AS path, * FROM ({ivf})\n"
        f"UNION ALL\nSELECT 'indexed' AS path, * FROM ({ivf})"
    )


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

TEXT_QUERIES = {
    "doc_dedup": q_doc_dedup,
    "doc_profile": q_doc_profile,
    "doc_neardup_pairs": q_doc_neardup_pairs,
    "doc_dup_clusters": q_doc_dup_clusters,
    "doc_hashes": q_doc_hashes,
    "emb_cosine_topk": q_emb_cosine_topk,
    "emb_knn": q_emb_knn,
    "emb_knn_lsh": q_emb_knn_lsh,
    "emb_dup_pairs": q_emb_dup_pairs,
    "emb_buckets": q_emb_buckets,
    "emb_ivf_topk": q_emb_ivf_topk_paths,
    "emb_ann": q_emb_ann_paths,
}


def text_oracles() -> dict[str, str]:
    return {
        "doc_dedup": SQL_DOC_DEDUP,
        "doc_profile": _sql_doc_profile(),
        "doc_neardup_pairs": _sql_doc_neardup_pairs(),
        "doc_dup_clusters": SQL_DOC_DUP_CLUSTERS,
        "doc_hashes": _sql_doc_hashes(),
        "emb_cosine_topk": _sql_emb_cosine_topk(),
        "emb_knn": _sql_emb_knn(),
        "emb_knn_lsh": _sql_emb_knn_lsh(),
        "emb_dup_pairs": _sql_emb_dup_pairs(),
        "emb_buckets": _sql_emb_buckets(),
        # the indexed branches return the SAME rows as the scan-recompute
        # branches (pytest equivalence) — the oracle reuses one SQL twin
        # per branch tag
        "emb_ivf_topk": _sql_emb_ivf_topk_paths(),
        "emb_ann": _sql_emb_ann_paths(),
    }
