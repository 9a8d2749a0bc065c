"""Property-based WKT codec fuzz (io/wkt.py): for randomly generated
shapes of every kind, ``parse_wkt(to_wkt(s)) == s`` exactly —
``to_wkt`` emits full-precision reprs, so the round trip must be
lossless, including dateline-crossing rectangles (minx > maxx),
buffered lines, holes, and nested collections.  Complements the pinned
22-shape corpus (wkt_codec gate row) with generative coverage, and
cross-checks the NTS-variant parser on the standard-WKT subset."""

from __future__ import annotations

import math

import numpy as np
from hypothesis import given, settings, strategies as st

from spatial4n_spark.io.wkt import parse_wkt, to_wkt
from spatial4n_spark.io.wkt_nts import parse_wkt_reader
from spatial4n_spark.kernels.polygon import (
    Circle,
    GeometryCollection,
    LineString,
    MultiPoint,
    Point,
    Polygon,
    Rect,
)

fin = st.floats(
    min_value=-179.0, max_value=179.0, allow_nan=False, allow_infinity=False
)
lat = st.floats(
    min_value=-89.0, max_value=89.0, allow_nan=False, allow_infinity=False
)


@st.composite
def points(draw):
    return Point(draw(fin), draw(lat))


@st.composite
def rects(draw):
    y1, y2 = sorted((draw(lat), draw(lat)))
    # minx > maxx is LEGAL: a dateline-crossing rectangle
    return Rect(draw(fin), draw(fin), y1, y2)


@st.composite
def circles(draw):
    return Circle(
        draw(fin), draw(lat),
        draw(st.floats(min_value=0.001, max_value=90.0,
                       allow_nan=False, allow_infinity=False)),
    )


@st.composite
def multipoints(draw):
    n = draw(st.integers(1, 6))
    c = np.array([[draw(fin), draw(lat)] for _ in range(n)], dtype=np.float64)
    return MultiPoint(c)


@st.composite
def linestrings(draw):
    n = draw(st.integers(2, 6))
    c = np.array([[draw(fin), draw(lat)] for _ in range(n)], dtype=np.float64)
    buf = draw(st.one_of(st.just(0.0), st.floats(
        min_value=0.1, max_value=5.0, allow_nan=False, allow_infinity=False)))
    return LineString(c, buffer=buf)


@st.composite
def polygons(draw):
    """Star-convex ring around a center: always simple, never collapses
    to a rectangle (irrational-ish vertex spread)."""
    cx = draw(st.floats(min_value=-160, max_value=160,
                        allow_nan=False, allow_infinity=False))
    cy = draw(st.floats(min_value=-70, max_value=70,
                        allow_nan=False, allow_infinity=False))
    n = draw(st.integers(3, 8))
    r = draw(st.floats(min_value=0.5, max_value=8.0,
                       allow_nan=False, allow_infinity=False))
    ang = np.sort(np.linspace(0.07, 2 * math.pi, n, endpoint=False)
                  + draw(st.floats(min_value=0.0, max_value=0.05,
                                   allow_nan=False)))
    ring = np.stack(
        [cx + r * np.cos(ang), cy + r * np.sin(ang)], axis=1
    )
    ring = np.vstack([ring, ring[:1]])
    return Polygon(ring)


SHAPES = st.one_of(points(), rects(), circles(), multipoints(),
                   linestrings(), polygons())


def _same(a, b) -> bool:
    """Structural equality via canonical WKT: ``to_wkt`` emits
    full-precision reprs, so string equality is value equality (the
    shapes hold numpy arrays, whose ``==`` is elementwise)."""
    return type(a) is type(b) and to_wkt(a) == to_wkt(b)


@given(s=SHAPES)
@settings(max_examples=300, deadline=None)
def test_wkt_roundtrip_identity(s):
    assert _same(parse_wkt(to_wkt(s)), s)


@given(ss=st.lists(SHAPES, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_wkt_collection_roundtrip(ss):
    gc = GeometryCollection(ss)
    assert _same(parse_wkt(to_wkt(gc)), gc)


@given(s=st.one_of(points(), multipoints(), polygons()))
@settings(max_examples=150, deadline=None)
def test_cross_parser_agreement_on_standard_wkt(s):
    """The NTS WKTReader-variant parser and the native parser must agree
    on the standard-WKT subset (ENVELOPE/BUFFER are native extensions
    the NTS grammar rejects; linestrings may carry buffers)."""
    w = to_wkt(s)
    nts_shape = parse_wkt_reader(w)[0]  # (shape, z) — Z preserved
    assert _same(nts_shape, parse_wkt(w))


def _binary_canon(s):
    """The binary codec's DOCUMENTED canonicalization (mirroring the
    reference's tag set): MultiPoint writes as a collection of points.
    Everything else round-trips identically (buffered lines are
    REJECTED outright — see test_binary_rejects_buffered_line)."""
    if isinstance(s, MultiPoint):
        return GeometryCollection(
            tuple(Point(float(x), float(y)) for x, y in s.coords)
        )
    if isinstance(s, GeometryCollection):
        return GeometryCollection(tuple(_binary_canon(m) for m in s.shapes))
    return s


def _has_buffered_line(s) -> bool:
    if isinstance(s, LineString) and s.buffer:
        return True
    if isinstance(s, GeometryCollection):
        return any(_has_buffered_line(m) for m in s.shapes)
    return False


@given(s=SHAPES)
@settings(max_examples=300, deadline=None)
def test_binary_roundtrip_is_canonicalization(s):
    """The binary codec (io/binary.py, the reference's BinaryCodec
    analog) round-trips every generated shape bit-exactly in double
    mode, up to its documented canonicalization.  Buffered lines have
    no wire representation and must raise (BinaryCodec.cs throws
    'Unsupported shape' for BufferedLineString) — silently dropping the
    buffer would be a round-trip that changes geometry semantics."""
    import pytest

    from spatial4n_spark.io.binary import shape_from_bytes, shape_to_bytes

    if _has_buffered_line(s):
        with pytest.raises(ValueError, match="buffered"):
            shape_to_bytes(s)
        return
    assert _same(shape_from_bytes(shape_to_bytes(s)), _binary_canon(s))


@given(ss=st.lists(SHAPES, min_size=1, max_size=4))
@settings(max_examples=100, deadline=None)
def test_binary_collection_roundtrip(ss):
    import pytest

    from spatial4n_spark.io.binary import shape_from_bytes, shape_to_bytes

    gc = GeometryCollection(ss)
    if _has_buffered_line(gc):
        with pytest.raises(ValueError, match="buffered"):
            shape_to_bytes(gc)
        return
    assert _same(shape_from_bytes(shape_to_bytes(gc)), _binary_canon(gc))


def test_binary_rejects_buffered_line():
    """The pinned fail-fast contract: BUFFER(LINESTRING...) parses fine
    but the binary codec refuses it, matching the reference."""
    import pytest

    from spatial4n_spark.io.binary import shape_to_bytes

    s = parse_wkt("BUFFER(LINESTRING(0 0, 10 0), 2)")
    with pytest.raises(ValueError, match="buffered line"):
        shape_to_bytes(s)
    # an unbuffered line still writes (tag-5 WKB)
    assert len(shape_to_bytes(parse_wkt("LINESTRING(0 0, 10 0)"))) > 0
