"""NTS WKTReader-variant parser — full-string standard WKT.

Mirrors reference ``src/Spatial4n/IO/Nts/NtsWktReaderShapeParser.cs:30-60``,
the alternate parser that hands the ENTIRE string to NTS's WKTReader.
Documented differences from the default parser (``io/wkt.py``):

- **no ENVELOPE / BUFFER** — those are Spatial4n CQL extensions the NTS
  grammar rejects (:33-34); here they raise ``WktParseError``;
- **Z coordinates are saved into the geometry** (:36) instead of being
  parsed-and-dropped — ``parse_wkt_reader`` returns ``(shape, z_parts)``
  where ``z_parts`` mirrors the coordinate structure (None when the
  input carries no Z);
- **per-coordinate verification** (CheckCoordinates, :111-160):
  out-of-world-bounds coordinates raise ``InvalidShapeError``
  (VerifyX/VerifyY on the ORIGINAL values, so the ``norm_wrap_longitude``
  flag is observably inert — see ``_check_coords`` for the parity note).
  The default parser only bounds-checks rects.

Rectangle-shaped polygons still collapse to Rect (``geom.IsRectangle ->
MakeRectFromPoly``, :92-95), through the same Width180 dateline rule as
the default parser.

The engine keeps ONE shape algebra: MULTI* inputs map to the same
MultiPoint / MultiPolygon / GeometryCollection classes as the default
parser (the reference's distinction — NTS IGeometryCollection subclasses
vs ShapeCollection — is a host-library artifact with no observable
relate/area semantics here).
"""

from __future__ import annotations

import numpy as np

from spatial4n_spark.io.wkt import (
    InvalidShapeError,
    WktParseError,
    _maybe_collapse_rect,
    _maybe_empty,
    _skip_dims,
    _Tokens,
    EMPTY_POINT,
)
from spatial4n_spark.kernels.norm import norm_lon_deg
from spatial4n_spark.kernels.polygon import (
    GeometryCollection,
    LineString,
    MultiPoint,
    MultiPolygon,
    Point,
    Polygon,
)


def _coord_z(t: _Tokens):
    """One coordinate: x y [z [m]]; returns (x, y, z_or_nan)."""
    x = t.number()
    y = t.number()
    z = np.nan
    extra = 0
    while True:
        nxt = t.peek()
        if nxt and nxt[0] == "num":
            t.next()
            if extra == 0:
                z = nxt[1]
            extra += 1
        else:
            break
    return x, y, z


def _coord_seq_z(t: _Tokens):
    t.expect_punct("(")
    coords = [_coord_z(t)]
    while t.try_punct(","):
        coords.append(_coord_z(t))
    t.expect_punct(")")
    arr = np.asarray(coords, dtype=np.float64)
    return arr[:, :2], arr[:, 2]


def _check_coords(xy: np.ndarray, geo: bool, norm_wrap_longitude: bool) -> np.ndarray:
    """CheckCoordinates (NtsWktReaderShapeParser.cs:111-160).

    Parity note: the reference's filter normalizes the sequence but then
    calls VerifyX/VerifyY on the ORIGINAL values (Filter :129-151), so an
    out-of-bounds X throws InvalidShapeException even with
    norm_wrap_longitude enabled — and since NormLonDEG is the identity on
    in-range values (DistanceUtils.cs NormLonDEG fast path), the wrap flag
    is observably inert in this parser. It is kept (and applied after the
    original-value verification, exactly as the reference orders it) for
    API parity only.
    """
    if xy.size == 0:
        return xy
    x, y = xy[:, 0], xy[:, 1]
    if geo:
        if np.any((x < -180.0) | (x > 180.0)):
            bad = x[(x < -180.0) | (x > 180.0)][0]
            raise InvalidShapeError(f"Bad X value {bad} is not in boundary Rect(-180,180)")
        if np.any((y < -90.0) | (y > 90.0)):
            bad = y[(y < -90.0) | (y > 90.0)][0]
            raise InvalidShapeError(f"Bad Y value {bad} is not in boundary Rect(-90,90)")
    if geo and norm_wrap_longitude:
        xy = np.column_stack([norm_lon_deg(x), y])
    return xy


def _parse(t: _Tokens, geo: bool, wrap: bool):
    tok = t.next()
    if tok[0] != "word":
        raise WktParseError(f"expected shape keyword, got {tok[1]!r}")
    kw = tok[1].upper()
    _skip_dims(t)

    if kw == "POINT":
        if _maybe_empty(t):
            return EMPTY_POINT, None
        t.expect_punct("(")
        x, y, z = _coord_z(t)
        t.expect_punct(")")
        xy = _check_coords(np.array([[x, y]]), geo, wrap)
        zs = None if np.isnan(z) else np.array([z])
        return Point(xy[0, 0], xy[0, 1]), zs

    if kw == "MULTIPOINT":
        if _maybe_empty(t):
            return MultiPoint(np.empty((0, 2))), None
        t.expect_punct("(")
        coords = []
        while True:
            if t.try_punct("("):
                coords.append(_coord_z(t))
                t.expect_punct(")")
            else:
                coords.append(_coord_z(t))
            if not t.try_punct(","):
                break
        t.expect_punct(")")
        arr = np.asarray(coords, dtype=np.float64)
        xy = _check_coords(arr[:, :2], geo, wrap)
        zs = None if np.isnan(arr[:, 2]).all() else arr[:, 2]
        return MultiPoint(xy), zs

    if kw in ("LINESTRING", "MULTILINESTRING"):
        if _maybe_empty(t):
            return LineString(np.empty((0, 2))), None
        if kw == "LINESTRING":
            xy, z = _coord_seq_z(t)
            xy = _check_coords(xy, geo, wrap)
            return LineString(xy), (None if np.isnan(z).all() else z)
        t.expect_punct("(")
        parts = [_coord_seq_z(t)]
        while t.try_punct(","):
            parts.append(_coord_seq_z(t))
        t.expect_punct(")")
        lines, zs, any_z = [], [], False
        for xy, z in parts:
            xy = _check_coords(xy, geo, wrap)
            lines.append(LineString(xy))
            has = not np.isnan(z).all()
            any_z = any_z or has
            zs.append(z if has else None)
        return GeometryCollection(tuple(lines)), (zs if any_z else None)

    if kw == "POLYGON":
        if _maybe_empty(t):
            return Polygon(np.empty((0, 2))), None
        return _polygon_body(t, geo, wrap, collapse=True)

    if kw == "MULTIPOLYGON":
        if _maybe_empty(t):
            return MultiPolygon(()), None
        t.expect_punct("(")
        polys, zs, any_z = [], [], False
        while True:
            poly, z = _polygon_body(t, geo, wrap, collapse=False)
            polys.append(poly)
            any_z = any_z or z is not None
            zs.append(z)
            if not t.try_punct(","):
                break
        t.expect_punct(")")
        return MultiPolygon(tuple(polys)), (zs if any_z else None)

    if kw == "GEOMETRYCOLLECTION":
        if _maybe_empty(t):
            return GeometryCollection(()), None
        t.expect_punct("(")
        shapes, zs, any_z = [], [], False
        while True:
            s, z = _parse(t, geo, wrap)
            shapes.append(s)
            any_z = any_z or z is not None
            zs.append(z)
            if not t.try_punct(","):
                break
        t.expect_punct(")")
        return GeometryCollection(tuple(shapes)), (zs if any_z else None)

    if kw in ("ENVELOPE", "BUFFER", "CIRCLE"):
        # NTS grammar has no Spatial4n CQL extensions (reader-variant :33-34)
        raise WktParseError(f"{kw} is a Spatial4n extension; the NTS reader grammar rejects it")

    raise WktParseError(f"unknown shape keyword {kw!r}")


def _polygon_body(t: _Tokens, geo: bool, wrap: bool, collapse: bool):
    t.expect_punct("(")
    rings = [_coord_seq_z(t)]
    while t.try_punct(","):
        rings.append(_coord_seq_z(t))
    t.expect_punct(")")
    xys, zs, any_z = [], [], False
    for xy, z in rings:
        xys.append(_check_coords(xy, geo, wrap))
        has = not np.isnan(z).all()
        any_z = any_z or has
        zs.append(z if has else None)
    poly = Polygon(xys[0], tuple(xys[1:]))
    shape = _maybe_collapse_rect(poly, geo) if collapse else poly
    return shape, (zs if any_z else None)


def parse_wkt_reader(wkt: str, geo: bool = True, norm_wrap_longitude: bool = False):
    """Parse standard WKT the way the reference's NtsWktReaderShapeParser
    does: full-string grammar, no CQL extensions, Z preserved.

    Returns ``(shape, z)`` — ``z`` is None when the input has no Z values,
    else an ndarray (point/line) or a nested list mirroring the ring /
    part structure. ``norm_wrap_longitude`` mirrors the context flag of
    the same name (default off, as in SpatialContextFactory).
    """
    if wkt is None:
        raise TypeError("wktString must not be None")  # :57-58 guard clause
    t = _Tokens(wkt)
    shape, z = _parse(t, geo, norm_wrap_longitude)
    if t.peek() is not None or t.s[t.pos:].strip():
        raise WktParseError(f"trailing garbage after shape: {t.s[t.pos:]!r}")
    return shape, z
