"""STR-packed broadcast R-tree over a polygon layer's bboxes — the
north star's literally-named candidate generator ("broadcast R-tree …
plus an exact PIP refinement pass"), beside the cell-cover equi-join
(operators.spatial_join).

Why an R-tree AT ALL when the cover join exists: the cover join's
candidate quality is fixed by the chosen cell level — a polygon much
smaller than its cell drags every point in the cell through the bbox
prefilter, and a global level must fit the WORST feature.  The R-tree
adapts per feature: each polygon is indexed by its own bbox, so
candidate counts track the layer's actual geometry at every scale, with
no level to tune.  The trade is that candidate generation runs in the
Arrow batch (Python) instead of a codegen'd hash join — right when the
layer is broadcastable and feature sizes vary wildly; wrong for
beyond-broadcast layers (use spatial_join_points_polygons_df).

Design (Sort-Tile-Recursive bulk load, Leutenegger et al. 1997 — the
same packing Iceberg-era engines and libspatialindex use, implemented
from scratch on flat numpy arrays):

- leaves: the layer's bboxes sorted into √(n/B) x-slabs then by y
  within each slab (one STR pass — static layer, bulk load only);
- each upper level packs B consecutive child boxes into a parent
  min/max box (``np.minimum/maximum.reduceat`` — no per-node Python);
- a batch query walks level-by-level with FRONTIER ARRAYS: the
  (point, node) pairs still alive expand to their children via one
  repeat/cumsum per level — the whole traversal is ~log_B(n) numpy
  calls regardless of batch size, no recursion, no per-point loop.

Dateline: a wrapping bbox (min_x > max_x, Rect.cs:60-63 semantics) is
SPLIT into its two unwrapped pages at build time, both pointing at the
same feature; query pairs dedupe on (point, feature), so results match
the kernel's page logic exactly.

The tree rides to executors inside the task closure (Spark broadcasts
it with the serialized function — same mechanism as pip_udf's shape
dict), so the structure is built once on the driver and probed
everywhere: a "broadcast R-tree" in exactly the north star's sense.
"""

from __future__ import annotations

import math

import numpy as np

NODE_CAPACITY = 16


class STRtree:
    """Static bulk-loaded R-tree over (n, 4) [min_x, max_x, min_y,
    max_y] boxes; ``query_batch`` returns candidate (point, box-owner)
    pairs for a batch of points. Owners are the caller's ids (one id
    may own several boxes — e.g. dateline pages); pairs are deduped."""

    def __init__(self, boxes: np.ndarray, owners: np.ndarray, capacity: int = NODE_CAPACITY):
        boxes = np.asarray(boxes, dtype=np.float64).reshape(-1, 4)
        self.owners = np.asarray(owners, dtype=np.int64)
        if len(boxes) != len(self.owners):
            raise ValueError("boxes and owners must align")
        self.capacity = int(capacity)
        order = self._str_order(boxes, self.capacity)
        self.order = order
        leaf = boxes[order]
        self.levels = [leaf]  # levels[0] = leaf boxes, last = top
        cur = leaf
        while len(cur) > self.capacity:
            cuts = np.arange(0, len(cur), self.capacity)
            parent = np.empty((len(cuts), 4), dtype=np.float64)
            parent[:, 0] = np.minimum.reduceat(cur[:, 0], cuts)
            parent[:, 1] = np.maximum.reduceat(cur[:, 1], cuts)
            parent[:, 2] = np.minimum.reduceat(cur[:, 2], cuts)
            parent[:, 3] = np.maximum.reduceat(cur[:, 3], cuts)
            self.levels.append(parent)
            cur = parent

    @staticmethod
    def _str_order(boxes: np.ndarray, capacity: int) -> np.ndarray:
        n = len(boxes)
        if n == 0:
            return np.empty(0, dtype=np.int64)
        cx = (boxes[:, 0] + boxes[:, 1]) * 0.5
        cy = (boxes[:, 2] + boxes[:, 3]) * 0.5
        n_slabs = max(1, int(math.ceil(math.sqrt(math.ceil(n / capacity)))))
        slab = int(math.ceil(n / n_slabs))
        by_x = np.argsort(cx, kind="stable")
        parts = []
        for i in range(0, n, slab):
            part = by_x[i : i + slab]
            parts.append(part[np.argsort(cy[part], kind="stable")])
        return np.concatenate(parts)

    def query_batch(self, xs: np.ndarray, ys: np.ndarray):
        """Candidate pairs for a point batch: (point_idx, owner_id)
        arrays, deduped. One frontier expansion per tree level."""
        xs = np.asarray(xs, dtype=np.float64)
        ys = np.asarray(ys, dtype=np.float64)
        if not len(self.levels[0]) or not len(xs):
            e = np.empty(0, dtype=np.int64)
            return e, e
        top = len(self.levels) - 1
        m_top = len(self.levels[top])
        pi = np.repeat(np.arange(len(xs), dtype=np.int64), m_top)
        ni = np.tile(np.arange(m_top, dtype=np.int64), len(xs))
        cap = self.capacity
        for lvl in range(top, -1, -1):
            b = self.levels[lvl]
            keep = (
                (xs[pi] >= b[ni, 0])
                & (xs[pi] <= b[ni, 1])
                & (ys[pi] >= b[ni, 2])
                & (ys[pi] <= b[ni, 3])
            )
            pi, ni = pi[keep], ni[keep]
            if lvl == 0:
                break
            m_child = len(self.levels[lvl - 1])
            start = ni * cap
            cnt = np.minimum(cap, m_child - start)
            tot = int(cnt.sum())
            if tot == 0:
                e = np.empty(0, dtype=np.int64)
                return e, e
            offs = np.zeros(len(cnt), dtype=np.int64)
            np.cumsum(cnt[:-1], out=offs[1:])
            within = np.arange(tot, dtype=np.int64) - np.repeat(offs, cnt)
            ni = np.repeat(start, cnt) + within
            pi = np.repeat(pi, cnt)
        owner = self.owners[self.order[ni]]
        # dedupe (point, owner): dateline-split boxes share an owner
        key = pi * (self.owners.max() + 1) + owner
        _, first = np.unique(key, return_index=True)
        return pi[first], owner[first]


def layer_rtree(polygons: list, geo: bool = True) -> tuple[STRtree, list]:
    """Bulk-load an STRtree over a [(poly_id, shape)] layer's bboxes
    (dateline-wrapping boxes split into their two pages). Returns
    (tree, poly_ids) — owner i in query results is poly_ids[i]."""
    from spatial4n_spark.kernels.polygon import shape_bbox

    boxes, owners, pids = [], [], []
    for i, (pid, shape) in enumerate(polygons):
        bb = shape_bbox(shape, geo)
        pids.append(pid)
        if geo and bb.min_x > bb.max_x:  # dateline wrap: two pages
            boxes.append((bb.min_x, 180.0, bb.min_y, bb.max_y))
            boxes.append((-180.0, bb.max_x, bb.min_y, bb.max_y))
            owners += [i, i]
        else:
            boxes.append((bb.min_x, bb.max_x, bb.min_y, bb.max_y))
            owners.append(i)
    return STRtree(np.array(boxes, dtype=np.float64).reshape(-1, 4), np.array(owners)), pids
