"""Polygon validation + repair rules.

Reference ``src/Spatial4n/IO/Nts/NtsWktShapeParser.cs:~398-436``
(ValidationRule enum: None / Error (default) / RepairConvexHull /
RepairBuffer0) applied in ``MakeShapeFromGeometry`` (:328-363); validity
itself via NTS IsValid (NtsGeometry.Validate :129-138).

Without a full geometry library, validity here = no proper
self-intersection between non-adjacent ring segments (the failure mode
the reference's repair rules exist for — bowties):

- ``error``              raise InvalidShapeError on an invalid ring
- ``repair_convex_hull`` replace the shell with its convex hull
                         (monotone-chain; holes dropped, as NTS's
                         ConvexHull does)
- ``repair_buffer0``     keep the ring and evaluate it under even-odd
                         semantics — for point containment this yields
                         exactly the region NTS Buffer(0) rebuilds (a
                         bowtie becomes its two lobes), which is what our
                         PIP kernel already computes
- ``none``               no check
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.kernels.polygon import MultiPolygon, Polygon, close_ring


class InvalidShapeError(ValueError):
    pass


def _proper_cross(p1, p2, q1, q2) -> bool:
    """Strict interior crossing of two segments (shared endpoints don't count)."""

    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
    o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
    return o1 != o2 and o3 != o4 and 0 not in (o1, o2, o3, o4)


def ring_self_intersects(ring: np.ndarray) -> bool:
    """Proper self-intersection between non-adjacent segments."""
    c = close_ring(np.asarray(ring, dtype=np.float64))
    n = len(c) - 1
    for i in range(n):
        for j in range(i + 2, n):
            if i == 0 and j == n - 1:
                continue  # first and last share the closing vertex
            if _proper_cross(c[i], c[i + 1], c[j], c[j + 1]):
                return True
    return False


def polygon_is_valid(poly) -> bool:
    members = poly.polys if isinstance(poly, MultiPolygon) else [poly]
    for m in members:
        for ring in (m.shell, *m.holes):
            if ring_self_intersects(ring):
                return False
    return True


def convex_hull(points: np.ndarray) -> np.ndarray:
    """Monotone-chain convex hull; returns a closed CCW ring."""
    pts = np.unique(np.asarray(points, dtype=np.float64), axis=0)
    if len(pts) <= 2:
        return np.vstack([pts, pts[::-1]])
    pts = pts[np.lexsort((pts[:, 1], pts[:, 0]))]

    def cross(o, a, b):
        return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])

    lower: list = []
    for p in pts:
        while len(lower) >= 2 and cross(lower[-2], lower[-1], p) <= 0:
            lower.pop()
        lower.append(p)
    upper: list = []
    for p in pts[::-1]:
        while len(upper) >= 2 and cross(upper[-2], upper[-1], p) <= 0:
            upper.pop()
        upper.append(p)
    hull = np.array(lower[:-1] + upper[:-1])
    return np.vstack([hull, hull[:1]])


def apply_validation_rule(poly, rule: str = "error"):
    """Validate/repair per the reference's ValidationRule semantics."""
    if rule == "none" or polygon_is_valid(poly):
        return poly
    if rule == "error":
        raise InvalidShapeError("self-intersecting polygon ring")
    if rule == "repair_convex_hull":
        members = poly.polys if isinstance(poly, MultiPolygon) else [poly]
        all_pts = np.vstack([m.shell for m in members])
        return Polygon(convex_hull(all_pts), ())
    if rule == "repair_buffer0":
        # even-odd evaluation of the raw ring == the Buffer(0) region for
        # point containment (a bowtie covers exactly its two lobes)
        return poly
    raise ValueError(f"unknown validation rule: {rule}")
