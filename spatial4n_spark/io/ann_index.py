"""Materialized embedding ANN index — storage-level candidate pruning.

The similarity module's query-time operators (similarity.ann_topk /
ivf_topk) recompute bucket and centroid assignments inside the scan
filter; correct, but at 10^12 rows the scan itself is the cost. This
module is the storage half of that design (VERDICT round 1, item 5):

- ``write_emb_index`` assigns every vector its IVF centroid and its
  sign-LSH bucket in each of L hash tables in ONE pass, then writes
  parquet partitioned by ``centroid_id`` (the Iceberg analog: a hidden
  identity partition transform). Bucket ids are plain int64 columns, so
  parquet row-group min/max stats apply to them.
- ``ivf_topk_indexed`` probes nprobe inverted lists via partition
  pruning: Catalyst lists only the probed ``centroid_id=...``
  directories (shown as PartitionFilters), reading nprobe/n_centroids
  of the data without evaluating a single dot product on skipped rows.
- ``ann_topk_indexed`` matches the query's bucket per table against the
  STORED bucket columns — a pushed-down integer filter (no per-row
  hyperplane dot products at query time).

The mosaic of the tile layer (io.tables) uses the same pattern for
points; this is its embedding twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from spatial4n_spark.similarity import (
    _query_bucket,
    _topk_ranked,
    arrow_buckets_udf,
    arrow_centroid_udf,
    hyperplanes,
    ivf_centroids,
    ivf_probe_order,
    with_cosine,
)

PARTITION_COL = "centroid_id"


def write_emb_index(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
    mode: str = "overwrite",
) -> None:
    """One-pass index build: centroid + per-table buckets, partitioned write.

    All assignment math runs in two vectorized Arrow passes over the
    single scan (sequential-fold order, bit-identical to the JVM array
    expressions — see similarity._seq_dots_np); the only shuffle is the
    partitioned write's file routing.
    """
    centroids = centroids or ivf_centroids(dim=dim)
    tables = [hyperplanes(n_planes, dim, seed=t * 1000) for t in range(n_tables)]
    cent_udf = arrow_centroid_udf(centroids)
    bks_udf = arrow_buckets_udf(tables)
    out = emb.withColumn(PARTITION_COL, cent_udf(F.col("embedding"))).withColumn(
        "bks", bks_udf(F.col("embedding"))
    )
    for t in range(n_tables):
        out = out.withColumn(f"bucket_t{t}", F.col("bks")[t])
    out = out.drop("bks")
    out.write.partitionBy(PARTITION_COL).mode(mode).parquet(path)


def append_emb_index(
    emb: DataFrame,
    path: str,
    centroids: list[list[float]] | None = None,
    dim: int = 64,
    n_planes: int = 4,
    n_tables: int = 8,
) -> None:
    """Incremental index maintenance: assign the new vectors with the
    SAME centroids/hyperplanes the index was built with and append them
    into the partitioned layout (new files under the matching
    ``centroid_id=...`` directories). Probes see the new vectors
    immediately — partition pruning and the stored-bucket filters don't
    care which write created a file. The centroids must be the build's
    (IVF lists are only as good as a fixed assignment); pass the same
    ``centroids`` the build used or the default formula set."""
    write_emb_index(
        emb,
        path,
        centroids=centroids,
        dim=dim,
        n_planes=n_planes,
        n_tables=n_tables,
        mode="append",
    )


def read_emb_index(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def ivf_topk_indexed(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 10,
    centroids: list[list[float]] | None = None,
    nprobe: int = 4,
) -> DataFrame:
    """IVF probe over the materialized index: partition-pruned scan of the
    nprobe best inverted lists, then exact cosine distributed top-k."""
    centroids = centroids or ivf_centroids(dim=len(qvec))
    probe = ivf_probe_order(qvec, centroids)[:nprobe]
    cand = read_emb_index(spark, path).where(
        F.col(PARTITION_COL).isin([int(j) for j in probe])
    )
    return _topk_ranked(with_cosine(cand, qvec), k)


def ann_topk_indexed(
    spark: SparkSession,
    path: str,
    qvec: list[float],
    k: int = 10,
    n_planes: int = 4,
    n_tables: int = 8,
) -> DataFrame:
    """Multi-table LSH probe over STORED bucket columns: the filter is a
    disjunction of integer equalities on materialized columns (row-group
    skippable), not a recomputation of L*m hyperplane dot products."""
    match = F.lit(False)
    for t in range(n_tables):
        planes = hyperplanes(n_planes, len(qvec), seed=t * 1000)
        qb = _query_bucket(qvec, planes)
        match = match | (F.col(f"bucket_t{t}") == F.lit(qb))
    cand = read_emb_index(spark, path).where(match)
    return _topk_ranked(with_cosine(cand, qvec), k)
