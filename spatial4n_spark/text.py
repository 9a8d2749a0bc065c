"""Text analysis + deduplication operators for the training-data pipeline.

All per-document work is map-side JVM expressions (split/filter/
transform/aggregate higher-order functions — no Python UDFs, no shuffle);
the only shuffles are hash-partitioned groupBys on uniform keys (md5,
shingle, band bucket), each with an explicit frequency cap so no key can
explode at the 10^12-document design scale.

Operators:
- exact_dedup         hash-groupBy duplicate groups (md5 of text)
- token_stats         whitespace tokenization counts
- quality             stopword/char-class quality scoring
- langid              marker-token language heuristic (deterministic)
- shingle_sets        distinct token n-gram shingles per doc (+max-df cap)
- jaccard_pairs       exact n-gram Jaccard near-dup pairs (shingle join)
- minhash_lsh_pairs   MinHash banding candidates + exact Jaccard verify
- simhash             16-bit SimHash fingerprint
- fingerprint         rolling polynomial hash of the token sequence

Every operator is mirrored op-for-op by a DuckDB oracle in
``spatial4n_spark.suite`` — integer/string outputs are exact; the only
doubles are ratios of integers (bit-identical across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "und"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "y"),
}

HASH_MOD = 2147483647  # 2^31 - 1, keeps the rolling hash in exact int range


def tokens_col(text: Column) -> Column:
    """Whitespace tokens, empty strings dropped (regex-split parity with
    the oracle's regexp_split_to_array)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda x: x != "")


def md5_long(col: Column, nibbles: int = 15) -> Column:
    """First ``nibbles`` hex chars of md5 as a non-negative int64.

    15 nibbles = 60 bits < 63, so the value is identical to DuckDB's
    ``('0x' || substr(md5(x),1,15))::BIGINT``.
    """
    return F.conv(F.substring(F.md5(col), 1, nibbles), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Duplicate groups by content hash. Shuffle key = md5 (uniform)."""
    return (
        docs.select(F.md5(F.col(text)).alias("text_md5"), F.col(key))
        .groupBy("text_md5")
        .agg(F.count(F.lit(1)).alias("n"), F.min(key).alias(f"min_{key}"))
    )


# BPE-ish pre-tokenizer: runs of letters, runs of digits, or single
# non-space symbols — the word-split regex family BPE vocabularies use
# (same semantics in Java regex and RE2 for the oracle)
SUBTOKEN_REGEX = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def token_stats(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    toks = tokens_col(F.col(text))
    return docs.select(
        F.col(key),
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.size(F.regexp_extract_all(F.col(text), F.lit(SUBTOKEN_REGEX), F.lit(0))).alias("n_subtokens"),
        F.length(F.col(text)).alias("n_chars_m"),
    )


def quality(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Length / stopword-ratio quality signals (integer counts + one exact
    ratio of ints)."""
    toks = tokens_col(F.col(text))
    n_tok = F.size(toks)
    n_stop = F.size(F.filter(toks, lambda x: x.isin(*STOPWORDS)))
    non_ascii = F.length(F.regexp_replace(F.col(text), r"[ -~]", ""))
    return docs.select(
        F.col(key),
        n_tok.alias("n_tokens"),
        n_stop.alias("n_stop"),
        non_ascii.alias("n_non_ascii"),
        # unrounded: exact_int/exact_int is bit-identical across engines;
        # round(x, 4) is not (tie-boundary algorithm differences)
        (n_stop / n_tok).alias("stop_ratio"),
    )


def langid(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Marker-token language heuristic; deterministic argmax with a fixed
    tie order (en > de > fr > es > und)."""
    toks = tokens_col(F.col(text))

    def marker_pred(markers):
        # closure factory: pyspark HOF lambdas must have exactly the arity
        # of the callback (default args would be bound to extra Columns)
        return lambda x: x.isin(*markers)

    scores = {
        lang: F.size(F.filter(toks, marker_pred(markers)))
        for lang, markers in LANG_MARKERS.items()
    }
    pred = F.lit("und")
    best = F.lit(0)
    # iterate in reversed priority so earlier langs win ties via >=
    for lang in reversed(list(LANG_MARKERS)):
        s = scores[lang]
        pred = F.when(s >= best, F.lit(lang)).otherwise(pred)
        best = F.when(s >= best, s).otherwise(best)
    sel = [F.col(key)] + [scores[lang].alias(f"score_{lang}") for lang in LANG_MARKERS]
    return docs.select(*sel, pred.alias("lang_pred"))


def shingle_sets(
    docs: DataFrame, n: int = 2, text: str = "text", key: str = "doc_id"
) -> DataFrame:
    """Distinct token n-gram shingles per document (the dedup unit).

    Tokenization is bound to a column in its own projection: HOF lambdas
    evaluate interpreted with no subexpression elimination, so inlining
    the regex split inside ``element_at`` re-tokenizes the document once
    per shingle element — O(L^2) per doc instead of O(L).
    """
    staged = docs.select(F.col(key), tokens_col(F.col(text)).alias("_toks"))
    toks = F.col("_toks")
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    grams = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + F.lit(k)) for k in range(n)]),
    )
    # guard: Spark's sequence(1, 0) counts *down*; docs shorter than n
    # tokens have no shingles
    grams = F.when(F.size(toks) >= F.lit(n), grams).otherwise(
        F.array().cast("array<string>")
    )
    return staged.select(F.col(key), F.array_distinct(grams).alias("shingles"))


def _spread_input(docs: DataFrame) -> DataFrame:
    """Repartition a small-partition-count input before the CPU-bound
    shingle/hash stages (HOF expressions evaluate interpreted, outside
    codegen — they must run on all cores). Single-row-group files arrive
    as one partition; at design scale inputs already have thousands of
    partitions and this is a no-op."""
    sc = docs.sparkSession.sparkContext
    if docs.rdd.getNumPartitions() < sc.defaultParallelism:
        return docs.repartition(sc.defaultParallelism)
    return docs


def _df_capped_shingles(sh: DataFrame, key: str, max_df: int) -> DataFrame:
    """Explode shingles and drop 'stop shingles' appearing in > max_df docs
    — the frequency cap that keeps the self-join key from exploding at
    scale (a shingle shared by k docs costs k^2 pairs).

    explode_outer + null filter, NOT plain explode: Catalyst's
    InferFiltersFromGenerate infers ``size(shingles) > 0`` from a plain
    explode and pushes it below the spread Repartition, inlining the whole
    tokenize+shingle expression into a Filter that runs serially on the
    pre-repartition partition (measured 10x the cost of the explode
    itself). The rule skips outer generates; the explicit null filter on
    the generated column restores identical semantics and cannot be pushed
    below the Generate."""
    ex = sh.select(key, F.explode_outer("shingles").alias("shingle")).where(
        F.col("shingle").isNotNull()
    )
    df_counts = ex.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
    return ex.join(df_counts.where(F.col("_df") <= max_df), "shingle")


def jaccard_pairs(
    docs: DataFrame,
    n: int = 2,
    threshold: float = 0.06,
    max_df: int = 50,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via shingle self-join.

    Jaccard is computed on the frequency-capped shingle sets (cap is part
    of the operator's semantics; it is what makes the join feasible at
    scale). Returns (doc_a, doc_b, jaccard) with doc_a < doc_b.
    """
    sh = shingle_sets(_spread_input(docs), n, text, key)
    ex = _df_capped_shingles(sh, key, max_df)
    sizes = ex.groupBy(key).agg(F.count(F.lit(1)).alias("sz"))
    a = ex.select(F.col(key).alias("doc_a"), "shingle")
    b = ex.select(F.col(key).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .where(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.select(F.col(key).alias("doc_a"), F.col("sz").alias("sza")), "doc_a")
        .join(sizes.select(F.col(key).alias("doc_b"), F.col("sz").alias("szb")), "doc_b")
        .withColumn("jaccard", F.col("inter") / (F.col("sza") + F.col("szb") - F.col("inter")))
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return out.select("doc_a", "doc_b", F.col("jaccard"))


def minhash_signature(sh: DataFrame, k: int = 16, key: str = "doc_id") -> DataFrame:
    """k MinHash values per doc: mh_i = min over shingles of H(shingle||'#i').

    Implemented as explode -> k flat md5 columns -> min-aggregate, NOT as
    array higher-order functions: HOF lambdas evaluate interpreted
    (outside whole-stage codegen), which made the k x |shingles| hashing
    the pipeline bottleneck (16s -> ~2s at 5k docs x 50 shingles x 16).
    The shuffle carries only (key, k longs) partial mins.
    """
    # explode_outer + null filter: see _df_capped_shingles for why a plain
    # explode here re-runs the shingle expression serially below the spread
    ex = sh.select(key, F.explode_outer("shingles").alias("_s")).where(
        F.col("_s").isNotNull()
    )
    hashed = ex.select(
        key, *[md5_long(F.concat(F.col("_s"), F.lit(f"#{i}"))).alias(f"_h{i}") for i in range(k)]
    )
    agg = hashed.groupBy(key).agg(*[F.min(f"_h{i}").alias(f"mh{i}") for i in range(k)])
    return sh.join(agg, key)


def minhash_lsh_pairs(
    docs: DataFrame,
    n: int = 2,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.0,
    text: str = "text",
    key: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH banding near-dup detection.

    Candidates = pairs sharing any band bucket (band key = md5 of the
    band's minhash values); each candidate is then verified with the
    exact Jaccard of the full shingle sets. Shuffle keys are band-bucket
    hashes (uniform); candidate generation never compares non-colliding
    pairs — the scale path vs jaccard_pairs' exact join.
    """
    rows = k // bands
    sh = shingle_sets(_spread_input(docs), n, text, key).where(F.size("shingles") > 0)
    sig = minhash_signature(sh, k)
    band_cols = [
        F.md5(F.concat_ws(",", *[F.col(f"mh{b * rows + r}") for r in range(rows)])).alias(
            f"band{b}"
        )
        for b in range(bands)
    ]
    # signatures feed `bands` self-joins + the verify joins — persist so the
    # k*|shingles| md5 work runs once (at design scale: a materialized
    # signature table)
    sig = sig.select(key, "shingles", *band_cols).persist()

    # ONE self-join on (band_index, band_hash) instead of one join per
    # band: posexplode folds the b band columns into rows, so candidate
    # generation costs a single shuffle rather than `bands` shuffles + a
    # union (measured 1.6x at sf0.1; same rows — the band index in the
    # key keeps cross-band hash collisions out, as separate joins did)
    bx = sig.select(
        F.col(key),
        F.posexplode(F.array(*[F.col(f"band{b}") for b in range(bands)])).alias(
            "bi", "bh"
        ),
    )
    left = bx.select(F.col(key).alias("doc_a"), "bi", "bh")
    right = bx.select(F.col(key).alias("doc_b"), "bi", "bh")
    pairs = (
        left.join(right, ["bi", "bh"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )

    sa = sig.select(F.col(key).alias("doc_a"), F.col("shingles").alias("sha"))
    sb = sig.select(F.col(key).alias("doc_b"), F.col("shingles").alias("shb"))
    out = (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn(
            "jaccard",
            F.col("inter") / (F.size("sha") + F.size("shb") - F.col("inter")),
        )
        .where(F.col("jaccard") >= F.lit(threshold))
    )
    return out.select("doc_a", "doc_b", F.col("jaccard"))


def dup_clusters(pairs: DataFrame, max_iters: int = 20) -> DataFrame:
    """Connected components over near-dup pairs -> (doc_id, cluster_id)
    with cluster_id = the smallest doc id in the component.

    Distributed min-label propagation WITH pointer doubling: each round
    every node adopts (a) the minimum label among itself and its
    neighbors, then (b) its label's label (path halving).  The doubling
    step makes convergence O(log diameter) rounds instead of
    O(diameter) — a duplicate CHAIN (url?a -> url?b -> ... common in
    crawl corpora) of length 10^6 converges in ~20 rounds where plain
    propagation needs 10^6.  Every step is a hash join on doc ids — no
    driver-side union-find, so it scales to billions of pairs; a
    no-label-changed aggregate exits early, and non-convergence raises
    loudly rather than returning silently wrong clusters.

    ``pairs``: (doc_a, doc_b) near-dup edges (from jaccard_pairs /
    minhash_lsh_pairs / emb_dup_pairs).
    """
    edges = pairs.select("doc_a", "doc_b")
    # symmetric closure + self edges = the propagation adjacency
    sym = edges.unionAll(
        edges.select(F.col("doc_b").alias("doc_a"), F.col("doc_a").alias("doc_b"))
    )
    nodes = sym.select(F.col("doc_a").alias("doc")).distinct()
    # localCheckpoint truncates the iterative lineage each round (20 join
    # stages deep otherwise) — the standard pattern for loops over frames
    labels = nodes.withColumn("cluster_id", F.col("doc")).localCheckpoint()

    for _ in range(max_iters):
        neigh_min = (
            sym.join(labels, sym["doc_b"] == labels["doc"])
            .groupBy(sym["doc_a"].alias("doc"))
            .agg(F.min("cluster_id").alias("_nmin"))
        )
        updated = labels.join(neigh_min, "doc", "left").select(
            "doc",
            F.least(
                F.col("cluster_id"),
                F.coalesce(F.col("_nmin"), F.col("cluster_id")),
            ).alias("cluster_id"),
        )
        # pointer doubling: adopt the label's own label.  A label is
        # always a doc id in `nodes`, so the self-join is total; labels
        # only ever DECREASE, so halving never overshoots the component
        # minimum — it just shortcuts the path to it.
        parent = updated.select(
            F.col("doc").alias("_pd"), F.col("cluster_id").alias("_pc")
        )
        updated = (
            updated.join(parent, updated["cluster_id"] == parent["_pd"], "left")
            .select(
                "doc",
                F.least(
                    F.col("cluster_id"),
                    F.coalesce(F.col("_pc"), F.col("cluster_id")),
                ).alias("cluster_id"),
            )
            .localCheckpoint()
        )
        changed = (
            updated.alias("u")
            .join(labels.alias("l"), "doc")
            .where(F.col("u.cluster_id") != F.col("l.cluster_id"))
            .limit(1)
            .count()
        )
        labels = updated
        if changed == 0:
            break
    else:
        # diameter > 2^max_iters (with doubling) would yield silently
        # wrong cluster ids — fail loudly instead
        raise RuntimeError(
            f"dup_clusters did not converge within {max_iters} rounds; "
            "increase max_iters (component diameter exceeds 2^rounds)"
        )
    return labels.select(F.col("doc").alias("doc_id"), "cluster_id")


def simhash(docs: DataFrame, bits: int = 16, text: str = "text", key: str = "doc_id") -> DataFrame:
    """SimHash fingerprint: per-bit +/-1 votes of token hashes.

    bit b of H(token) votes +1 if set else -1, weighted by occurrence;
    fingerprint bit b = 1 iff the vote sum > 0.
    """
    toks = tokens_col(F.col(text))
    hashes = F.transform(toks, lambda x: md5_long(x, 4))  # 16-bit token hash

    def bit_vote(b):
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b) % 2 == 1, F.lit(1)
        ).otherwise(F.lit(-1))

    sig = F.lit(0).cast("long")
    for b in range(bits):
        vote = F.aggregate(hashes, F.lit(0).cast("long"), bit_vote(b))
        sig = sig + F.when(vote > 0, F.lit(2 ** b).cast("long")).otherwise(F.lit(0).cast("long"))
    return docs.select(F.col(key), sig.alias("simhash"))


def fingerprint(docs: DataFrame, text: str = "text", key: str = "doc_id") -> DataFrame:
    """Rolling polynomial hash of the token sequence mod 2^31-1 (order-
    sensitive document fingerprint; exact integer arithmetic)."""
    toks = tokens_col(F.col(text))
    vals = F.transform(toks, lambda x: md5_long(x, 8))  # 32-bit token values
    fp = F.aggregate(
        vals,
        F.lit(0).cast("long"),
        lambda acc, v: (acc * F.lit(31) + v) % F.lit(HASH_MOD),
    )
    return docs.select(F.col(key), fp.alias("fingerprint"))
