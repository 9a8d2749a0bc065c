"""The named geo circle x rect regression vectors from the reference's
TestShapesGeo suite (tests/Spatial4n.Tests/Shapes/TestShapesGeo.cs:163-207)
— each a case that once failed in the reference (pole wrap, dateline
backwrap, inverse circles r>90, horizontal-axis latitude).

Single source of truth for both the kernel pytest
(tests/test_kernels.py) and the ``circle_rect_relate`` gate entry, whose
DuckDB oracle is the literal VALUES pin of the expected column: any
kernel change that shifts one relate value turns the gate row red.

Vector form: (name, (cx, cy, radius_deg), (min_x, max_x, min_y, max_y),
expected). Radii given in km in the reference convert through the
engine's own km_to_deg (R=6371.0087714, DistanceUtils.cs:46).
"""

from __future__ import annotations

from spatial4n_spark.kernels.distance import km_to_deg


def _km(km: float) -> float:
    return float(km_to_deg(km))


GEO_CIRCLE_RECT_VECTORS = [
    ("bad proportion logic", (64, -70, 18), (46, 116, -86, -62), "INTERSECTS"),
    ("both touch pole", (-90, 30, 60), (-24, -16, 14, 90), "INTERSECTS"),
    ("spherical cap contains band", (0, -90, 30), (-180, 180, -90, -80), "CONTAINS"),
    ("touches pole", (0, -88, 2), (40, 60, -90, -86), "INTERSECTS"),
    ("wrong farthest opp corner", (92, 36, 46), (134, 136, 32, 80), "INTERSECTS"),
    ("edge rounding issue 2", (84, -40, 136), (-150, -80, 34, 84), "INTERSECTS"),
    ("nudge back circle", (-150, -90, 122), (0, -132, 32, 32), "CONTAINS"),
    ("wrong estimate", (-166, 59, _km(5226.2)), (36, 66, 23, 23), "DISJOINT"),
    ("bad CONTAINS dateline", (56, -50, _km(12231.5)), (108, 26, 39, 48), "INTERSECTS"),
    ("bad CONTAINS backwrap2", (112, -3, 91), (-163, 29, -38, 10), "INTERSECTS"),
    ("bad CONTAINS r x-wrap", (-139, 47, 80), (-180, 180, -3, 12), "INTERSECTS"),
    ("bad CONTAINS pwrap", (-139, 47, 80), (-180, 179, -3, 12), "INTERSECTS"),
    ("no-dist 1", (135, 21, 0), (-103, -154, -47, 52), "WITHIN"),
    ("bbox <= >= -90 bug", (-64, -84, 124), (-96, 96, -10, -10), "CONTAINS"),
    ("horiz axis not through ctr", (71, -44, 40), (15, 27, -62, -34), "INTERSECTS"),
    ("pole boundary", (-100, -12, 102), (143, 175, 4, 32), "INTERSECTS"),
    ("full circle assert", (-64, 32, 180), (47, 47, -14, 90), "CONTAINS"),
]
