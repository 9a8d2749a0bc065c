"""WKT parser/writer with the reference's CQL extensions.

Grammar per reference ``src/Spatial4n/IO/WktShapeParser.cs`` (dispatch
:183-224) and ``src/Spatial4n/IO/Nts/NtsWktShapeParser.cs``:

- POINT, MULTIPOINT (optional inner parens, :286-305), LINESTRING,
  MULTILINESTRING, POLYGON/MULTIPOLYGON with holes, GEOMETRYCOLLECTION
  (recursive :387-402)
- ENVELOPE (CQL ext) with arg order **x1, x2, y2, y1** and REQUIRED commas
  (:318-334; 'ENVELOPE (10 30 45 25)' must fail)
- BUFFER(shape, dist): buffered point => circle (:234-245)
- EMPTY for every type; Z/M dimensions parsed and dropped (:43-45)
- coordinates inside a single coordinate are whitespace-separated only:
  'POINT (100, 90)' must fail (WktShapeParserTest.cs:70-181)
- polygons that are axis-aligned rectangles collapse to Rect, with
  DatelineRule Width180: collapsed rects wider than 180 deg invert to
  dateline-crossing (NtsWktShapeParser.cs:141-194)
- rect construction nudges a 180/-180 edge so a rect merely touching the
  dateline doesn't 'cross' it (SpatialContext.MakeRectangle :257-291)
"""

from __future__ import annotations

import math
import re

import numpy as np

from spatial4n_spark.kernels.polygon import (
    Circle,
    GeometryCollection,
    LineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
    Rect,
)


class WktParseError(ValueError):
    pass


class InvalidShapeError(ValueError):
    """Reference InvalidShapeException (world-bounds / ring validity)."""


_TOKEN_RE = re.compile(
    r"\s*(?:(?P<num>[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)|(?P<word>[A-Za-z][A-Za-z0-9_]*)|(?P<punct>[(),]))"
)


class _Tokens:
    def __init__(self, s: str):
        self.s = s
        self.pos = 0

    def peek(self):
        m = _TOKEN_RE.match(self.s, self.pos)
        if not m:
            return None
        if m.group("num") is not None:
            return ("num", float(m.group("num")), m.end())
        if m.group("word") is not None:
            return ("word", m.group("word"), m.end())
        return ("punct", m.group("punct"), m.end())

    def next(self):
        t = self.peek()
        if t is None:
            raise WktParseError(f"unexpected end/garbage at {self.pos}: {self.s[self.pos:self.pos+20]!r}")
        self.pos = t[2]
        return t

    def expect_punct(self, ch):
        t = self.next()
        if t[0] != "punct" or t[1] != ch:
            raise WktParseError(f"expected {ch!r} at {self.pos}, got {t[1]!r}")

    def try_punct(self, ch) -> bool:
        t = self.peek()
        if t and t[0] == "punct" and t[1] == ch:
            self.pos = t[2]
            return True
        return False

    def try_word(self, word) -> bool:
        t = self.peek()
        if t and t[0] == "word" and t[1].upper() == word:
            self.pos = t[2]
            return True
        return False

    def number(self) -> float:
        t = self.next()
        if t[0] != "num":
            raise WktParseError(f"expected number, got {t[1]!r}")
        return t[1]

    def at_end(self) -> bool:
        return self.peek() is None and self.pos >= len(self.s.rstrip()) - 0 and not self.s[self.pos :].strip()


EMPTY_POINT = Point(float("nan"), float("nan"))


def _skip_dims(t: _Tokens):
    """Z/M/ZM dimension flags are parsed and dropped (WktShapeParser.cs:43-45)."""
    nxt = t.peek()
    if nxt and nxt[0] == "word" and nxt[1].upper() in ("Z", "M", "ZM"):
        t.next()


def _coord(t: _Tokens):
    """One coordinate: x y [z [m]] — whitespace separated, NO commas inside."""
    x = t.number()
    y = t.number()
    # extra numeric dims (Z/M values) are dropped
    while True:
        nxt = t.peek()
        if nxt and nxt[0] == "num":
            t.next()
        else:
            break
    return x, y


def _coord_seq(t: _Tokens) -> np.ndarray:
    t.expect_punct("(")
    coords = [_coord(t)]
    while t.try_punct(","):
        coords.append(_coord(t))
    t.expect_punct(")")
    return np.asarray(coords, dtype=np.float64)


def _maybe_empty(t: _Tokens) -> bool:
    return t.try_word("EMPTY")


def make_rect(min_x, max_x, min_y, max_y, geo: bool = True) -> Rect:
    """Rect constructor with the reference's normalization.

    SpatialContext.MakeRectangle (:257-291): rejects minY > maxY; when geo,
    nudges an edge at exactly +/-180 so a rect that merely touches the
    dateline is not classified as crossing it.
    """
    if min_y > max_y:
        raise InvalidShapeError(f"maxY must be >= minY: {min_y} to {max_y}")
    if geo:
        if min_x != max_x:  # non-degenerate
            if min_x == 180.0:
                min_x = -180.0
            if max_x == -180.0:
                max_x = 180.0
    return Rect(float(min_x), float(max_x), float(min_y), float(max_y))


def _maybe_collapse_rect(poly: Polygon, geo: bool = True):
    """Axis-aligned 4-corner polygon -> Rect (NtsWktShapeParser.cs:141-194).

    DatelineRule Width180 (default): a collapsed rect wider than 180 deg
    inverts to dateline-crossing.
    """
    if poly.holes:
        return poly
    c = poly.shell
    if len(c) and np.array_equal(c[0], c[-1]):
        c = c[:-1]
    if len(c) != 4:
        return poly
    xs = sorted(set(c[:, 0].tolist()))
    ys = sorted(set(c[:, 1].tolist()))
    if len(xs) != 2 or len(ys) != 2:
        return poly
    # each edge must be axis-aligned
    cc = np.vstack([c, c[:1]])
    for i in range(4):
        if cc[i, 0] != cc[i + 1, 0] and cc[i, 1] != cc[i + 1, 1]:
            return poly
    min_x, max_x = xs[0], xs[1]
    if geo and (max_x - min_x) > 180.0:
        # Width180 dateline rule: invert to dateline-crossing
        min_x, max_x = max_x, min_x
        return Rect(min_x, max_x, ys[0], ys[1])
    return make_rect(min_x, max_x, ys[0], ys[1], geo)


def _parse_shape(t: _Tokens, geo: bool = True):
    tok = t.next()
    if tok[0] != "word":
        raise WktParseError(f"expected shape keyword, got {tok[1]!r}")
    kw = tok[1].upper()
    _skip_dims(t)

    if kw == "POINT":
        if _maybe_empty(t):
            return EMPTY_POINT
        t.expect_punct("(")
        x, y = _coord(t)
        t.expect_punct(")")
        return Point(x, y)

    if kw == "MULTIPOINT":
        if _maybe_empty(t):
            return MultiPoint(np.empty((0, 2)))
        t.expect_punct("(")
        coords = []
        while True:
            if t.try_punct("("):  # optional per-point parens
                coords.append(_coord(t))
                t.expect_punct(")")
            else:
                coords.append(_coord(t))
            if not t.try_punct(","):
                break
        t.expect_punct(")")
        return MultiPoint(np.asarray(coords, dtype=np.float64))

    if kw == "ENVELOPE":
        if _maybe_empty(t):
            return Rect(float("nan"), float("nan"), float("nan"), float("nan"))
        # CQL arg order x1, x2, y2, y1 — commas REQUIRED (WktShapeParser.cs:318-334)
        t.expect_punct("(")
        x1 = t.number()
        t.expect_punct(",")
        x2 = t.number()
        t.expect_punct(",")
        y2 = t.number()
        t.expect_punct(",")
        y1 = t.number()
        t.expect_punct(")")
        return make_rect(x1, x2, y1, y2, geo)

    if kw in ("LINESTRING", "MULTILINESTRING"):
        if _maybe_empty(t):
            return LineString(np.empty((0, 2)))
        if kw == "LINESTRING":
            return LineString(_coord_seq(t))
        t.expect_punct("(")
        parts = [_coord_seq(t)]
        while t.try_punct(","):
            parts.append(_coord_seq(t))
        t.expect_punct(")")
        return GeometryCollection(tuple(LineString(p) for p in parts))

    if kw == "POLYGON":
        if _maybe_empty(t):
            return Polygon(np.empty((0, 2)))
        return _parse_polygon_body(t, geo)

    if kw == "MULTIPOLYGON":
        if _maybe_empty(t):
            return MultiPolygon(())
        t.expect_punct("(")
        polys = [_parse_polygon_body(t, geo, collapse=False)]
        while t.try_punct(","):
            polys.append(_parse_polygon_body(t, geo, collapse=False))
        t.expect_punct(")")
        return MultiPolygon(tuple(polys))

    if kw == "GEOMETRYCOLLECTION":
        if _maybe_empty(t):
            return GeometryCollection(())
        t.expect_punct("(")
        shapes = [_parse_shape(t, geo)]
        while t.try_punct(","):
            shapes.append(_parse_shape(t, geo))
        t.expect_punct(")")
        return GeometryCollection(tuple(shapes))

    if kw == "BUFFER":
        # BUFFER(shape, dist): buffered point => circle (WktShapeParser.cs:234-245)
        t.expect_punct("(")
        inner = _parse_shape(t, geo)
        t.expect_punct(",")
        dist = t.number()
        t.expect_punct(")")
        if isinstance(inner, Point):
            return Circle(inner.x, inner.y, dist, geo=geo)
        if isinstance(inner, LineString):
            return LineString(inner.coords, buffer=dist)
        if isinstance(inner, (Polygon, MultiPolygon, Rect)):
            # GetBuffered on polygons (NtsGeometry.cs:203-211); a
            # rect-collapsed polygon buffers to a Rect (RectangleImpl.cs:83)
            from spatial4n_spark.kernels.polybuf import buffer_polygon

            return buffer_polygon(inner, dist, geo=geo)
        raise WktParseError(f"BUFFER of {type(inner).__name__} not supported")

    if kw == "CIRCLE":
        # engine convenience: CIRCLE (x y d=r) legacy-ish form not required;
        # kept unsupported for strict parity
        raise WktParseError("CIRCLE keyword not supported; use BUFFER(POINT(x y), r)")

    raise WktParseError(f"unknown shape keyword {kw!r}")


def _parse_polygon_body(t: _Tokens, geo: bool, collapse: bool = True):
    t.expect_punct("(")
    rings = [_coord_seq(t)]
    while t.try_punct(","):
        rings.append(_coord_seq(t))
    t.expect_punct(")")
    poly = Polygon(rings[0], tuple(rings[1:]))
    return _maybe_collapse_rect(poly, geo) if collapse else poly


def parse_wkt(wkt: str, geo: bool = True):
    """Parse a WKT string into a shape. Raises WktParseError on bad input."""
    t = _Tokens(wkt)
    shape = _parse_shape(t, geo)
    if t.peek() is not None or t.s[t.pos :].strip():
        raise WktParseError(f"trailing garbage after shape: {t.s[t.pos:]!r}")
    return shape


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15 and not math.isnan(v):
        return str(int(v))
    return repr(v)


def _ring_wkt(c: np.ndarray) -> str:
    return "(" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in c) + ")"


def to_wkt(shape) -> str:
    """Canonical WKT of a shape (ENVELOPE/BUFFER for rect/circle)."""
    if isinstance(shape, Point):
        if shape.is_empty:
            return "POINT EMPTY"
        return f"POINT ({_fmt(shape.x)} {_fmt(shape.y)})"
    if isinstance(shape, Rect):
        return f"ENVELOPE ({_fmt(shape.min_x)}, {_fmt(shape.max_x)}, {_fmt(shape.max_y)}, {_fmt(shape.min_y)})"
    if isinstance(shape, Circle):
        return f"BUFFER(POINT({_fmt(shape.x)} {_fmt(shape.y)}), {_fmt(shape.radius)})"
    if isinstance(shape, MultiPoint):
        if len(shape.coords) == 0:
            return "MULTIPOINT EMPTY"
        return "MULTIPOINT " + _ring_wkt(shape.coords)
    if isinstance(shape, LineString):
        if len(shape.coords) == 0:
            return "LINESTRING EMPTY"
        base = "LINESTRING " + _ring_wkt(shape.coords)
        return f"BUFFER({base}, {_fmt(shape.buffer)})" if shape.buffer else base
    if isinstance(shape, Polygon):
        rings = ", ".join(_ring_wkt(r) for r in shape.rings())
        return f"POLYGON ({rings})"
    if isinstance(shape, MultiPolygon):
        bodies = ", ".join("(" + ", ".join(_ring_wkt(r) for r in p.rings()) + ")" for p in shape.polys)
        return f"MULTIPOLYGON ({bodies})"
    if isinstance(shape, GeometryCollection):
        if not shape.shapes:
            return "GEOMETRYCOLLECTION EMPTY"
        return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(s) for s in shape.shapes) + ")"
    raise TypeError(type(shape))
