"""Cell-cover planning: polygon -> geohash cells (full / boundary).

The driver-side "physical planner" of the spatial join (SURVEY.md §2.9,
§4.2): descend the geohash quadtree from level 1, relating each cell's
bbox to the query shape with the exact kernels:

- cell DISJOINT shape  -> pruned
- cell WITHIN shape    -> 'full' cell: every point in it matches, no
                          refinement UDF needed (the fast path)
- else                 -> recurse; at the target level it becomes a
                          'boundary' cell that needs exact PIP refinement

This mirrors the reference's bbox-gate-then-exact structure
(NtsGeometry.cs:284-287) hoisted from per-row to per-cell, which is what
makes the distributed join scale: the refinement UDF only sees points in
boundary cells.
"""

from __future__ import annotations

from spatial4n_spark.kernels.geohash import (
    BASE32,
    geohash_cell_sizes,
    geohash_decode_bbox,
    geohash_len_for_width_height,
)
from spatial4n_spark.kernels.polygon import Rect, shape_bbox
from spatial4n_spark.kernels.relate import relate
from spatial4n_spark.relation import CONTAINS, DISJOINT, WITHIN, transpose


def choose_level(shape, geo: bool = True, target_cells: int = 8) -> int:
    """Pick the geohash level whose cells are ~1/target of the shape bbox."""
    bb = shape_bbox(shape, geo)
    w = bb.width / max(target_cells, 1)
    h = (bb.max_y - bb.min_y) / max(target_cells, 1)
    lvl = geohash_len_for_width_height(max(w, 1e-9), max(h, 1e-9))
    return max(1, min(lvl, 7))


def cover_cells(shape, level: int, geo: bool = True, max_cells: int = 4096):
    """Quadtree cover of a shape. Returns (full_cells, boundary_cells).

    ``level`` is the uniform join level: every returned cell has exactly
    ``level`` characters so the point side can equi-join on a single
    cell column. Interior regions produce 'full' cells (skip refinement);
    the shape's boundary produces 'boundary' cells.
    """
    full: list[str] = []
    boundary: list[str] = []

    # if a parent cell is fully inside the shape, all 32^k children are too —
    # emit them arithmetically instead of relating each.
    def expand_full(cell: str):
        if len(cell) == level:
            full.append(cell)
            return
        for c in BASE32:
            expand_full(cell + c)

    def visit2(cell: str):
        if len(full) + len(boundary) > max_cells:
            raise ValueError(f"cell cover exceeds {max_cells} cells at level {level}")
        min_x, max_x, min_y, max_y = (float(v[0]) for v in geohash_decode_bbox([cell]))
        rel = relate(shape, Rect(min_x, max_x, min_y, max_y), geo)
        if rel == DISJOINT:
            return
        if rel == CONTAINS:
            expand_full(cell)
            return
        if len(cell) == level:
            boundary.append(cell)
            return
        for c in BASE32:
            visit2(cell + c)

    for c in BASE32:
        visit2(c)
    return full, boundary
