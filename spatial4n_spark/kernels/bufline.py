"""Buffered-line kernels (corridor / trajectory geometry).

Semantics match reference ``src/Spatial4n/Shapes/Impl/InfBufLine.cs`` and
``BufferedLine.cs``:

- an infinite buffered line y = slope*x + intercept with buffer ``buf``
  (vertical lines store the x-intercept; InfBufLine.cs:44-59);
  point containment is line-to-point distance <= buf (:90-103);
  rect relate via the quadrant/nearest-corner logic (:61-88, :127-153)
- a BufferedLine A->B is the intersection of two such lines: the primary
  (through A,B, buffer=buf) and the perpendicular (through the midpoint,
  buffer=length/2 + buf, i.e. a *rotated rectangle* extended past the
  endpoints; BufferedLine.cs:83-95); its bbox uses the right-triangle
  bboxBuf expansion (:126-151); relate(rect) = bbox gate then the
  combination of both lines' relates (:212-233); NOT dateline-aware
  (BufferedLine.cs:28)
- geo usage pre-expands the buffer for longitude skew via
  CalcLonDegreesAtLat (BufferedLine.cs:176-195, DistanceUtils.cs:466-483)

Point membership is numpy-vectorized (the corridor-join refinement
kernel); rect relate is scalar (used per cover cell by the planner).
"""

from __future__ import annotations

import math

import numpy as np

from spatial4n_spark.kernels.distance import DEG_TO_RAD, RAD_TO_DEG
from spatial4n_spark.kernels.polygon import Rect
from spatial4n_spark.relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN


def calc_lon_degrees_at_lat(lat: float, dist_deg: float) -> float:
    """Longitude degrees spanning ``dist_deg`` at latitude ``lat``.

    DistanceUtils.CalcLonDegreesAtLat (DistanceUtils.cs:466-483) — the
    point-on-bearing formula specialized to bearing=90.
    """
    d = dist_deg * DEG_TO_RAD
    la = lat * DEG_TO_RAD
    lon_delta = math.atan2(
        math.sin(d) * math.cos(la), math.cos(d) * (1 - math.sin(la) * math.sin(la))
    )
    return lon_delta * RAD_TO_DEG


class InfBufLine:
    """Infinite buffered line. InfBufLine.cs:28-191."""

    __slots__ = ("slope", "intercept", "buf", "dist_denom_inv")

    def __init__(self, slope: float, px: float, py: float, buf: float):
        self.slope = slope
        if math.isinf(slope):
            self.intercept = px  # x-intercept for vertical lines
            self.dist_denom_inv = float("nan")
        else:
            self.intercept = py - slope * px
            self.dist_denom_inv = 1.0 / math.sqrt(slope * slope + 1.0)
        self.buf = buf

    def distance_unbuffered(self, px, py):
        """Vectorized line-to-point distance. InfBufLine.cs:100-110."""
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        if math.isinf(self.slope):
            return np.abs(px - self.intercept)
        return np.abs(py - self.slope * px - self.intercept) * self.dist_denom_inv

    def contains(self, px, py):
        return self.distance_unbuffered(px, py) <= self.buf

    def quadrant(self, px: float, py: float) -> int:
        """1-4 = NE, NW, SW, SE relative to the line. InfBufLine.cs:115-145."""
        if math.isinf(self.slope):
            return 1 if px > self.intercept else 2
        above = py >= self.slope * px + self.intercept
        if self.slope > 0:
            return 2 if above else 4
        return 1 if above else 3

    def relate_rect(self, r: Rect) -> np.int8:
        """InfBufLine.Relate (InfBufLine.cs:61-88)."""
        _OPP = (None, 3, 4, 1, 2)

        def corner(quad):
            x = r.max_x if quad in (1, 4) else r.min_x
            y = r.max_y if quad in (1, 2) else r.min_y
            return x, y

        cx = (r.min_x + r.max_x) / 2
        cy = (r.min_y + r.max_y) / 2
        c_quad = self.quadrant(cx, cy)
        near = corner(_OPP[c_quad])
        if bool(self.contains(near[0], near[1])):
            far = corner(c_quad)
            if bool(self.contains(far[0], far[1])):
                return CONTAINS
            return INTERSECTS
        if self.quadrant(near[0], near[1]) == c_quad:
            return DISJOINT
        return INTERSECTS


class BufLine:
    """Buffered segment A->B (rotated rectangle). BufferedLine.cs:54-260."""

    __slots__ = ("ax", "ay", "bx", "by", "buf", "primary", "perp", "bbox")

    def __init__(self, ax: float, ay: float, bx: float, by: float, buf: float):
        self.ax, self.ay, self.bx, self.by, self.buf = ax, ay, bx, by, buf
        dx, dy = bx - ax, by - ay
        cx, cy = ax + dx / 2, ay + dy / 2
        if dx == 0 and dy == 0:
            self.primary = InfBufLine(0.0, cx, cy, buf)
            self.perp = InfBufLine(float("inf"), cx, cy, buf)
        else:
            # C# double division yields +/-inf for dx==0 (vertical); the
            # sign of inf is irrelevant to distance/quadrant logic
            slope = dy / dx if dx != 0 else float("inf")
            self.primary = InfBufLine(slope, cx, cy, buf)
            length = math.sqrt(dx * dx + dy * dy)
            # perpendicular buffer extends past the endpoints by buf
            self.perp = InfBufLine(
                -dx / dy if dy != 0 else float("inf"), cx, cy, length / 2 + buf
            )
        self.bbox = self._compute_bbox()

    def _compute_bbox(self) -> Rect:
        ax, ay, bx, by, buf = self.ax, self.ay, self.bx, self.by, self.buf
        if bx - ax == 0:  # vertical (or degenerate point); BufferedLine.cs:99-117
            return Rect(ax - buf, ax + buf, min(ay, by) - buf, max(ay, by) + buf)
        slope = self.primary.slope
        bbox_buf = buf * (1 + abs(slope)) * self.primary.dist_denom_inv
        return Rect(
            min(ax, bx) - bbox_buf,
            max(ax, bx) + bbox_buf,
            min(ay, by) - bbox_buf,
            max(ay, by) + bbox_buf,
        )

    def contains(self, px, py):
        """Vectorized membership: within buffer of BOTH lines.
        BufferedLine.cs:236-244."""
        return self.primary.contains(px, py) & self.perp.contains(px, py)

    def relate_rect(self, r: Rect) -> np.int8:
        """BufferedLine.Relate(IRectangle) (BufferedLine.cs:212-233)."""
        from spatial4n_spark.kernels.bbox import rect_relate_rect

        bbox_r = np.int8(
            rect_relate_rect(
                self.bbox.min_x, self.bbox.max_x, self.bbox.min_y, self.bbox.max_y,
                r.min_x, r.max_x, r.min_y, r.max_y, geo=False,
            )[0]
        )
        if bbox_r in (DISJOINT, WITHIN):
            return bbox_r
        res = self.primary.relate_rect(r)
        if res == DISJOINT:
            return DISJOINT
        res_opp = self.perp.relate_rect(r)
        if res_opp == DISJOINT:
            return DISJOINT
        if res == res_opp:
            return res
        return INTERSECTS


def expand_buf_for_longitude_skew(ay: float, by: float, buf: float) -> float:
    """BufferedLine.ExpandBufForLongitudeSkew (BufferedLine.cs:176-195)."""
    max_lat = max(abs(ay), abs(by))
    new_buf = calc_lon_degrees_at_lat(max_lat, buf)
    return max(new_buf, buf)


class BufLineString:
    """Polyline of buffered segments (BufferedLineString.cs:32-311):
    membership = any segment contains; relate folds member relations with
    the ShapeCollection Combine semantics."""

    def __init__(self, coords, buf: float, expand_geo_skew: bool = False):
        coords = np.asarray(coords, dtype=np.float64)
        self.buf = buf
        self.segments: list[BufLine] = []
        if len(coords) == 1:
            coords = np.vstack([coords, coords])
        for (ax, ay), (bx, by) in zip(coords[:-1], coords[1:]):
            b = expand_buf_for_longitude_skew(ay, by, buf) if expand_geo_skew else buf
            self.segments.append(BufLine(float(ax), float(ay), float(bx), float(by), b))

    def contains(self, px, py):
        px = np.atleast_1d(np.asarray(px, dtype=np.float64))
        out = np.zeros(px.shape, dtype=bool)
        for seg in self.segments:
            out |= seg.contains(px, py)
        return out

    def relate_rect(self, r: Rect) -> np.int8:
        from spatial4n_spark.relation import combine, transpose

        rel = None
        for seg in self.segments:
            sr = seg.relate_rect(r)
            rel = sr if rel is None else transpose(combine(transpose(rel), transpose(sr)))
        return np.int8(rel if rel is not None else DISJOINT)
