"""spatial4n_spark — a PySpark-native spatial-join + tiling engine.

A from-scratch reimplementation of the query semantics of the Spatial4n
geometry kernel (reference: /root/reference, a .NET port of spatial4j)
as a distributed Spark engine:

- numpy geometry kernels (``spatial4n_spark.kernels``) with the reference's
  4-valued relation algebra (WITHIN/CONTAINS/INTERSECTS/DISJOINT — COVERS
  semantics, boundaries belong to the shape), dateline- and pole-aware.
- Spark-native column expressions + Arrow-vectorized pandas UDFs
  (``spatial4n_spark.functions``) — per-row Python is forbidden.
- engine operators (``spatial4n_spark.operators``): cell-indexed spatial
  join with broadcast polygon index and skew salting, kNN via cell-ring
  candidates + Window top-k, distance join, tile assignment/aggregation,
  raster chip stage, dedup / similarity / text-analysis pipeline ops.
- deterministic synthetic sources (``spatial4n_spark.sources``) for the
  image+caption table and polygon layers (seed-fixed, no external data).

Reference semantics are cited per function as ``file:line`` against
/root/reference (study-only; all code here is original).
"""

from spatial4n_spark.context import SpatialCtx
from spatial4n_spark.relation import (
    CONTAINS,
    DISJOINT,
    INTERSECTS,
    NONE,
    WITHIN,
    combine,
    intersects,
    inverse,
    rel_name,
    transpose,
)

__version__ = "0.1.0"

__all__ = [
    "SpatialCtx",
    "NONE",
    "WITHIN",
    "CONTAINS",
    "DISJOINT",
    "INTERSECTS",
    "transpose",
    "combine",
    "inverse",
    "intersects",
    "rel_name",
]
