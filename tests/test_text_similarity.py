"""Text dedup/analysis + embedding similarity operator tests — structural
invariants and numpy brute-force oracles (the SQL-parity check runs in the
driver's DuckDB gate; these tests pin the semantics)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from spatial4n_spark import similarity as S
from spatial4n_spark import text as T

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy dog"),  # exact dup of 0
    (2, "the quick brown fox leaps over the lazy dog"),  # near dup of 0
    (3, "der hund und die katze und der vogel"),
    (4, "le chat et le chien et la souris"),
    (5, "completely different words entirely unrelated text"),
    (6, "x"),  # single token: no bigram shingles
    (7, "   "),  # whitespace only: zero tokens
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_exact_dedup(spark, docs):
    out = {r["text_md5"]: r for r in T.exact_dedup(docs).collect()}
    dup_md5 = hashlib.md5(DOCS[0][1].encode()).hexdigest()
    assert out[dup_md5]["n"] == 2
    assert out[dup_md5]["min_doc_id"] == 0
    assert sum(r["n"] for r in out.values()) == len(DOCS)


def test_token_stats_edges(spark, docs):
    rows = {r["doc_id"]: r for r in T.token_stats(docs).collect()}
    assert rows[0]["n_tokens"] == 9
    assert rows[0]["n_distinct"] == 8  # 'the' twice
    assert rows[6]["n_tokens"] == 1
    assert rows[7]["n_tokens"] == 0


def test_langid_markers(spark, docs):
    rows = {r["doc_id"]: r for r in T.langid(docs).collect()}
    assert rows[0]["lang_pred"] == "en"
    assert rows[3]["lang_pred"] == "de"
    assert rows[4]["lang_pred"] == "fr"
    assert rows[3]["score_de"] == 5  # der x2, und x2, die


def test_jaccard_pairs_vs_numpy(spark, docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           T.jaccard_pairs(docs, threshold=0.01, max_df=100).collect()}

    def shingles(text):
        toks = text.split()
        return {f"{a} {b}" for a, b in zip(toks, toks[1:])}

    s0, s2 = shingles(DOCS[0][1]), shingles(DOCS[2][1])
    expect = len(s0 & s2) / len(s0 | s2)
    assert out[(0, 2)] == pytest.approx(round(expect, 4))
    assert out[(0, 1)] == 1.0  # exact dup
    assert (0, 5) not in out  # unrelated
    assert (6, 7) not in out  # no shingles


def test_minhash_lsh_finds_exact_dups(spark, docs):
    out = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in
           T.minhash_lsh_pairs(docs, threshold=0.0).collect()}
    # identical shingle sets have identical minhash signatures -> all bands
    # collide -> candidate found with jaccard 1.0
    assert out[(0, 1)] == 1.0
    # near-dup 0-2: shares most shingles; not guaranteed to band-collide,
    # but if reported its jaccard must match the exact value
    if (0, 2) in out:
        assert 0.5 < out[(0, 2)] < 1.0


def test_simhash_properties(spark, docs):
    rows = {r["doc_id"]: r["simhash"] for r in T.simhash(docs).collect()}
    assert rows[0] == rows[1]  # identical docs
    ham = bin(rows[0] ^ rows[2]).count("1")
    assert ham <= 6  # near-dup: small hamming distance in 16 bits
    assert 0 <= rows[5] < 2 ** 16


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "gamma beta alpha"), (2, "alpha beta gamma"), (3, "")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["fingerprint"] for r in T.fingerprint(df).collect()}
    assert rows[0] == rows[2]
    assert rows[0] != rows[1]  # order matters
    assert rows[3] == 0  # empty doc
    # numpy/python oracle of the rolling hash
    def h(tok, nib):
        return int(hashlib.md5(tok.encode()).hexdigest()[:nib], 16)
    acc = 0
    for tok in "alpha beta gamma".split():
        acc = (acc * 31 + h(tok, 8)) % T.HASH_MOD
    assert rows[0] == acc


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()


def test_cosine_topk_vs_numpy(spark, emb):
    out = S.cosine_topk(emb, S.query_vector(), k=10).collect()
    pdf = emb.toPandas()
    mat = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    q = np.array(S.query_vector())
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(-cos, pdf["vec_id"]))[:10]
    for r, (negc, vid) in zip(out, order):
        assert r["vec_id"] == vid
        assert r["cos"] == pytest.approx(-negc, abs=1e-3)


def test_ann_recall_vs_exact(spark, emb):
    exact = [r["vec_id"] for r in S.cosine_topk(emb, S.query_vector(), k=10).collect()]
    approx = [r["vec_id"] for r in S.ann_topk(emb, S.query_vector(), k=10).collect()]
    # deterministic dataset + algorithm: recall is fixed; require a sane floor
    overlap = len(set(exact) & set(approx))
    assert overlap >= 5, f"ANN recall too low: {overlap}/10 ({approx} vs {exact})"
    # every ANN hit must carry its true cosine rank order (desc)
    cosines = [r["cos"] for r in S.ann_topk(emb, S.query_vector(), k=10).collect()]
    assert cosines == sorted(cosines, reverse=True)


def test_arrow_kernels_bit_equal_expression_twins(spark, emb):
    """The vectorized Arrow kernels (one numpy pass, sequential-fold
    accumulation) must be BIT-identical to the documented JVM array
    expressions they replaced — same bucket for every table, same
    centroid argmax (first-max tie-break), same ANN match set — on the
    full real embeddings table. This is what keeps the DuckDB oracles
    valid without re-derivation."""
    tables = [S.hyperplanes(4, 64, seed=t * 1000) for t in range(8)]
    df = emb.withColumn("bks", S.arrow_buckets_udf(tables)(F.col("embedding")))
    for t, planes in enumerate(tables):
        df = df.withColumn(f"x{t}", S.bucket_col(F.col("embedding"), planes))
    bad = df.where(
        " OR ".join(f"bks[{t}] != x{t}" for t in range(len(tables)))
    ).count()
    assert bad == 0

    # default 16-plane table (lsh_buckets' configuration)
    p16 = S.hyperplanes()
    df16 = emb.select(
        S.arrow_buckets_udf([p16])(F.col("embedding"))[0].alias("a"),
        S.bucket_col(F.col("embedding"), p16).alias("x"),
    )
    assert df16.where("a != x").count() == 0

    # centroid argmax, formula AND fitted centroids (fitted = arbitrary
    # doubles, exercises tie-break + float paths off the lattice)
    for cents in (S.ivf_centroids(), S.fit_ivf_centroids(emb, n_centroids=8, iters=3, sample=400)):
        dc = emb.select(
            S.arrow_centroid_udf(cents)(F.col("embedding")).alias("a"),
            S.centroid_col(F.col("embedding"), cents).alias("x"),
        )
        assert dc.where("a != x").count() == 0

    # ANN match column == the OR-of-bucket-equality expression
    q = S.query_vector()
    match_expr = F.lit(False)
    for t, planes in enumerate(tables):
        qb = S._query_bucket(q, planes)
        match_expr = match_expr | (S.bucket_col(F.col("embedding"), planes) == F.lit(qb))
    dm = emb.select(
        S.arrow_ann_match_udf(q, 4, 8)(F.col("embedding")).alias("a"),
        match_expr.alias("x"),
    )
    assert dm.where("a != x").count() == 0


def test_bucket_pair_scores_pushdown_equals_post_filter(spark, emb):
    """The in-kernel filters (threshold / a<b orientation / per-vector
    top-k under (cos desc, neighbor_id asc)) must select EXACTLY the
    rows a post-filter of the unfiltered kernel output selects — the
    pushdown may only bound each bucket's output, never change it."""
    planes = S.hyperplanes(4, 64, seed=0)
    b = (
        emb.select("vec_id", S._emb_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", F.sqrt(S._norm2(F.col("e"))))
        .withColumn("b0", S.arrow_buckets_udf([planes])(F.col("e"))[0])
    )
    full = S._bucket_pair_scores(b, "b0").toPandas()

    # threshold + orientation (threshold = the data's median cos, so the
    # filter provably keeps some rows and drops some rows)
    thr = float(full["cos"].median())
    got = S._bucket_pair_scores(b, "b0", threshold=thr, ordered_only=True).toPandas()
    want = full[(full["cos"] >= thr) & (full["vec_id"] < full["neighbor_id"])]
    key = lambda d: sorted(map(tuple, d[["vec_id", "neighbor_id", "cos"]].to_numpy()))
    assert key(got) == key(want)
    assert len(want) > 0  # non-vacuous

    # per-vector top-k: same total order as the global window
    k = 3
    got_k = S._bucket_pair_scores(b, "b0", topk=k).toPandas()
    want_k = (
        full.sort_values(["vec_id", "cos", "neighbor_id"], ascending=[True, False, True])
        .groupby("vec_id")
        .head(k)
    )
    assert key(got_k) == key(want_k)
    assert len(want_k) < len(full)  # the cut actually removed rows

    # end-to-end: lsh_knn_pairs WITH the in-kernel top-k cut must equal
    # the same pipeline recomputed WITHOUT it (full bucket scores ->
    # pair dedup -> global top-k in pandas)
    tables = [S.hyperplanes(4, 64, seed=t * 1000) for t in range(8)]
    ball = (
        emb.select("vec_id", S._emb_double(F.col("embedding")).alias("e"))
        .withColumn("nrm", F.sqrt(S._norm2(F.col("e"))))
        .withColumn("bks", S.arrow_buckets_udf(tables)(F.col("e")))
    )
    for t in range(8):
        ball = ball.withColumn(f"b{t}", F.col("bks")[t])
    ball = ball.drop("bks")
    import pandas as pd

    full_all = pd.concat(
        [S._bucket_pair_scores(ball, f"b{t}").toPandas() for t in range(8)]
    ).drop_duplicates(["vec_id", "neighbor_id"])
    want_knn = (
        full_all.sort_values(["vec_id", "cos", "neighbor_id"], ascending=[True, False, True])
        .groupby("vec_id")
        .head(5)
    )
    want_knn["rank"] = want_knn.groupby("vec_id").cumcount() + 1
    got_knn = S.lsh_knn_pairs(emb, k=5).toPandas()
    kk = lambda d: sorted(map(tuple, d[["vec_id", "neighbor_id", "rank"]].to_numpy()))
    assert kk(got_knn) == kk(want_knn)
    assert len(got_knn) > 0


def test_lsh_bucket_determinism_and_spread(spark, emb):
    out = S.lsh_buckets(emb).toPandas()
    assert out["bucket"].between(0, 2 ** 16 - 1).all()
    # hyperplane LSH on random vectors should use many buckets
    assert out["bucket"].nunique() > 20
    again = S.lsh_buckets(emb).toPandas()
    assert (out.sort_values("vec_id").values == again.sort_values("vec_id").values).all()


def test_dup_clusters_label_propagation(spark):
    """Connected components: chain, separate pair, singleton exclusion."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    out = {r["doc_id"]: r["cluster_id"] for r in T.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20}


def test_ivf_fit_and_recall(spark, emb):
    """Data-adaptive IVF: k-means-fitted centroids give better (or equal)
    recall than formula centroids at the same probe budget; assignments
    are deterministic and cover multiple lists."""
    exact = [r["vec_id"] for r in S.cosine_topk(emb, S.query_vector(), k=10).collect()]

    fitted = S.fit_ivf_centroids(emb, n_centroids=8, iters=4, sample=500)
    assign = S.ivf_assign(emb, fitted).toPandas()
    assert assign["centroid_id"].nunique() >= 4  # lists actually used
    again = S.ivf_assign(emb, fitted).toPandas()
    assert (assign.sort_values("vec_id").values == again.sort_values("vec_id").values).all()

    approx = [r["vec_id"] for r in
              S.ivf_topk(emb, S.query_vector(), k=10, centroids=fitted, nprobe=3).collect()]
    overlap = len(set(exact) & set(approx))
    assert overlap >= 5, f"IVF recall too low: {overlap}/10"
    # candidate fraction actually prunes: probing 3 of 8 lists reads less
    # than half the table
    probe_counts = assign.groupby("centroid_id").size()
    assert probe_counts.nlargest(3).sum() < len(assign)


def test_lsh_dup_pairs_no_crossjoin_and_exact_precision(spark, emb):
    """lsh_dup_pairs: every returned pair truly passes the exact cosine
    threshold (exact precision), and the physical plan has no cartesian
    product — candidates come from bucket equi-joins."""
    import numpy as np
    from spatial4n_spark import similarity as S

    out = S.lsh_dup_pairs(emb, threshold=0.4, n_planes=4, n_tables=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    rows = out.collect()
    pdf = emb.toPandas().set_index("vec_id")
    for r in rows:
        a = np.asarray(pdf.loc[r.vec_a, "embedding"], dtype=np.float64)
        b = np.asarray(pdf.loc[r.vec_b, "embedding"], dtype=np.float64)
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos >= 0.4 - 1e-9
        assert abs(round(cos, 4) - r.cos) <= 1e-4


def test_topk_plans_are_distributed(spark, emb):
    """cosine_topk / ivf_topk / ann_topk plan as TakeOrderedAndProject —
    map-side partial top-k, no single-reducer Window over candidates."""
    from spatial4n_spark import similarity as S

    for df in [
        S.cosine_topk(emb, S.query_vector(), k=20),
        S.ivf_topk(emb, S.query_vector(), k=10),
        S.ann_topk(emb, S.query_vector(), k=10),
    ]:
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan


def test_emb_index_pruning_and_equivalence(spark, emb, tmp_path_factory):
    """Materialized ANN index: IVF probes prune partitions (Catalyst
    PartitionFilters on centroid_id), ANN probes filter stored bucket
    columns (pushed filters, no dot-product recompute), and both return
    exactly what the scan-time operators return."""
    from spatial4n_spark.io import ann_index as AI

    path = str(tmp_path_factory.mktemp("annidx") / "emb_index")
    AI.write_emb_index(emb, path)

    q = S.query_vector()
    ivf_idx = AI.ivf_topk_indexed(spark, path, q, k=10, nprobe=4)
    ivf_ref = S.ivf_topk(emb, q, k=10, nprobe=4)
    assert sorted(map(tuple, ivf_idx.collect())) == sorted(map(tuple, ivf_ref.collect()))

    ann_idx = AI.ann_topk_indexed(spark, path, q, k=10)
    ann_ref = S.ann_topk(emb, q, k=10)
    assert sorted(map(tuple, ann_idx.collect())) == sorted(map(tuple, ann_ref.collect()))

    # plan inspection: the IVF probe must reach the scan as a partition
    # filter (directory pruning), not a post-scan predicate
    plan = ivf_idx._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "centroid_id" in plan.split("PartitionFilters", 1)[1][:200]
    # the ANN probe's bucket equalities reach the parquet reader
    ann_plan = ann_idx._jdf.queryExecution().executedPlan().toString()
    assert "bucket_t0" in ann_plan and "PushedFilters" in ann_plan


def test_emb_index_append_equals_full_build(spark, emb, tmp_path_factory):
    """Incremental maintenance: build on half the vectors, append the
    other half — every probe must return exactly what a full build
    returns (same centroids/hyperplanes, so assignment is identical)."""
    from spatial4n_spark.io import ann_index as AI

    base = str(tmp_path_factory.mktemp("annidx_inc") / "emb_index")
    full = str(tmp_path_factory.mktemp("annidx_full") / "emb_index")
    first = emb.where(F.col("vec_id") % 2 == 0)
    second = emb.where(F.col("vec_id") % 2 == 1)
    AI.write_emb_index(first, base)
    AI.append_emb_index(second, base)
    AI.write_emb_index(emb, full)

    q = S.query_vector()
    for probe in (
        lambda p: AI.ivf_topk_indexed(spark, p, q, k=10, nprobe=4),
        lambda p: AI.ann_topk_indexed(spark, p, q, k=10),
    ):
        got = sorted(map(tuple, probe(base).collect()))
        want = sorted(map(tuple, probe(full).collect()))
        assert got == want and len(want) == 10


def test_lsh_knn_recall_vs_exact(spark, emb):
    """lsh_knn_pairs recall@3 vs the exact O(n^2) baseline, and exact
    precision: every returned neighbor rank is correctly ordered."""
    from spatial4n_spark import similarity as S

    exact = S.knn_pairs(emb, k=3).collect()
    approx = S.lsh_knn_pairs(emb, k=3).collect()
    plan = S.lsh_knn_pairs(emb, k=3)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan

    exact_set = {(r.vec_id, r.neighbor_id) for r in exact}
    approx_set = {(r.vec_id, r.neighbor_id) for r in approx}
    recall = len(exact_set & approx_set) / len(exact_set)
    assert recall >= 0.35, recall  # cos~0.x neighbors; OR-amplified sign-LSH


def test_fit_ivf_sample_hard_cap(spark):
    import pytest

    from spatial4n_spark.similarity import IVF_FIT_SAMPLE_MAX, fit_ivf_centroids

    emb = spark.createDataFrame(
        [(i, [float(i)] * 4) for i in range(8)], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="driver-side"):
        fit_ivf_centroids(emb, n_centroids=2, sample=IVF_FIT_SAMPLE_MAX + 1)


def test_dup_clusters_long_chain_converges_logarithmically(spark):
    """Pointer doubling: a 200-link duplicate chain (diameter 200, the
    crawl-corpus worst case) must converge within the default 20 rounds
    — O(log d), where plain min-propagation would need ~200.  And a
    1-round budget on the same chain must raise, not return wrong ids."""
    import pytest

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 201)], "doc_a long, doc_b long"
    )
    out = {r["doc_id"]: r["cluster_id"] for r in T.dup_clusters(chain).collect()}
    assert set(out) == set(range(1, 202))
    assert set(out.values()) == {1}

    with pytest.raises(RuntimeError, match="did not converge"):
        T.dup_clusters(chain, max_iters=1)
