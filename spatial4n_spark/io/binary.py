"""Binary shape codec — byte-compatible with the reference's format.

Reference ``src/Spatial4n/IO/BinaryCodec.cs``: one tag byte
(Point=1, Rect=2, Circle=3, Collection=4, Geometry=5; :40-57) followed by
little-endian payloads (C# BinaryWriter):

- Point:      x, y                    (two float64)
- Rect:       minX, maxX, minY, maxY  (:220-246 write order)
- Circle:     center x, y, radius
- Collection: member-type byte (0 = heterogeneous), int32 count, then
              each member written in full (tag included)
- Geometry:   raw WKB, self-delimiting (NtsBinaryCodec.cs:258 — the NTS
              codec streams WKBWriter output with no length prefix);
              polygons/multipolygons/linestrings use standard OGC WKB
              (little-endian marker 1; types 2/3/6)

The reference's optional FloatingSingle precision (floats instead of
doubles) is supported via ``use_float``.
"""

from __future__ import annotations

import struct

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

TYPE_POINT, TYPE_RECT, TYPE_CIRCLE, TYPE_COLLECTION, TYPE_GEOMETRY = 1, 2, 3, 4, 5

WKB_LINESTRING, WKB_POLYGON, WKB_MULTIPOLYGON = 2, 3, 6


class _Writer:
    def __init__(self, use_float: bool = False):
        self.parts: list[bytes] = []
        self.dim_fmt = "<f" if use_float else "<d"

    def byte(self, v: int):
        self.parts.append(struct.pack("<B", v))

    def i32(self, v: int):
        self.parts.append(struct.pack("<i", v))

    def dim(self, v: float):
        self.parts.append(struct.pack(self.dim_fmt, float(v)))

    def raw(self, b: bytes):
        self.parts.append(b)

    def bytes(self) -> bytes:
        return b"".join(self.parts)


class _Reader:
    def __init__(self, buf: bytes, use_float: bool = False):
        self.buf = memoryview(buf)
        self.pos = 0
        self.dim_fmt = "<f" if use_float else "<d"
        self.dim_size = 4 if use_float else 8

    def byte(self) -> int:
        v = self.buf[self.pos]
        self.pos += 1
        return v

    def i32(self) -> int:
        (v,) = struct.unpack_from("<i", self.buf, self.pos)
        self.pos += 4
        return v

    def dim(self) -> float:
        (v,) = struct.unpack_from(self.dim_fmt, self.buf, self.pos)
        self.pos += self.dim_size
        return v

    def u32(self) -> int:
        (v,) = struct.unpack_from("<I", self.buf, self.pos)
        self.pos += 4
        return v

    def f64(self) -> float:
        (v,) = struct.unpack_from("<d", self.buf, self.pos)
        self.pos += 8
        return v


# ---------------------------------------------------------------------------
# WKB (geometry payload; always float64 per OGC)
# ---------------------------------------------------------------------------


def _wkb_ring(w: _Writer, coords: np.ndarray):
    w.raw(struct.pack("<I", len(coords)))
    w.raw(np.asarray(coords, dtype="<f8").tobytes())


def _write_wkb(w: _Writer, shape):
    w.byte(1)  # little-endian marker
    if isinstance(shape, LineString):
        w.raw(struct.pack("<I", WKB_LINESTRING))
        _wkb_ring(w, np.asarray(shape.coords))
    elif isinstance(shape, Polygon):
        w.raw(struct.pack("<I", WKB_POLYGON))
        rings = [shape.shell, *shape.holes]
        w.raw(struct.pack("<I", len(rings)))
        for r in rings:
            _wkb_ring(w, np.asarray(r))
    elif isinstance(shape, MultiPolygon):
        w.raw(struct.pack("<I", WKB_MULTIPOLYGON))
        w.raw(struct.pack("<I", len(shape.polys)))
        for p in shape.polys:
            _write_wkb(w, p)
    else:
        raise TypeError(f"WKB write: unsupported {type(shape).__name__}")


def _read_wkb(r: _Reader):
    endian = r.byte()
    if endian != 1:
        raise ValueError("only little-endian WKB supported")
    gtype = r.u32()
    if gtype == WKB_LINESTRING:
        n = r.u32()
        coords = np.frombuffer(r.buf, dtype="<f8", count=2 * n, offset=r.pos).reshape(n, 2)
        r.pos += 16 * n
        return LineString(coords.copy())
    if gtype == WKB_POLYGON:
        n_rings = r.u32()
        rings = []
        for _ in range(n_rings):
            n = r.u32()
            c = np.frombuffer(r.buf, dtype="<f8", count=2 * n, offset=r.pos).reshape(n, 2)
            r.pos += 16 * n
            rings.append(c.copy())
        return Polygon(rings[0], tuple(rings[1:]))
    if gtype == WKB_MULTIPOLYGON:
        n = r.u32()
        return MultiPolygon(tuple(_read_wkb(r) for _ in range(n)))
    raise ValueError(f"WKB read: unsupported geometry type {gtype}")


# ---------------------------------------------------------------------------
# shape codec
# ---------------------------------------------------------------------------


def _write_shape(w: _Writer, shape, geo: bool):
    if isinstance(shape, Point):
        w.byte(TYPE_POINT)
        w.dim(shape.x)
        w.dim(shape.y)
    elif isinstance(shape, Rect):
        w.byte(TYPE_RECT)
        w.dim(shape.min_x)
        w.dim(shape.max_x)
        w.dim(shape.min_y)
        w.dim(shape.max_y)
    elif isinstance(shape, Circle):
        w.byte(TYPE_CIRCLE)
        w.dim(shape.x)
        w.dim(shape.y)
        w.dim(shape.radius)
    elif isinstance(shape, GeometryCollection):
        w.byte(TYPE_COLLECTION)
        w.byte(0)  # heterogeneous members (BinaryCodec.cs WriteCollection)
        w.i32(len(shape.shapes))
        for s in shape.shapes:
            _write_shape(w, s, geo)
    elif isinstance(shape, MultiPoint):
        # the reference parses MULTIPOINT into a ShapeCollection of points
        # (WktShapeParser.ParseMulti), which BinaryCodec writes as a
        # Collection — mirror that byte layout; reads return the
        # equivalent GeometryCollection of points
        w.byte(TYPE_COLLECTION)
        w.byte(0)
        w.i32(len(shape.coords))
        for x, y in np.asarray(shape.coords, dtype=np.float64):
            w.byte(TYPE_POINT)
            w.dim(x)
            w.dim(y)
    else:
        # tag-5 WKB carries GEOMETRY only: a LineString's buffer has no
        # representation in the wire format, so the reference's
        # BinaryCodec throws "Unsupported shape" for BufferedLineString
        # (BinaryCodec.cs WriteShape) — match that fail-fast contract
        # rather than silently dropping the buffer (a round-trip that
        # changes geometry semantics).  Buffered lines round-trip
        # through WKT's BUFFER(...) form, not through this codec.
        if isinstance(shape, LineString) and shape.buffer:
            raise ValueError(
                "unsupported shape for the binary codec: buffered "
                "line-string (the wire format has no buffer field; "
                "use the WKT BUFFER(...) form instead)"
            )
        w.byte(TYPE_GEOMETRY)
        _write_wkb(w, shape)


def _read_shape(r: _Reader, geo: bool):
    tag = r.byte()
    if tag == TYPE_POINT:
        return Point(r.dim(), r.dim())
    if tag == TYPE_RECT:
        return Rect(r.dim(), r.dim(), r.dim(), r.dim())
    if tag == TYPE_CIRCLE:
        return Circle(r.dim(), r.dim(), r.dim(), geo=geo)
    if tag == TYPE_COLLECTION:
        member_type = r.byte()
        n = r.i32()
        if member_type != 0:
            raise ValueError(f"unsupported collection member type {member_type}")
        return GeometryCollection(tuple(_read_shape(r, geo) for _ in range(n)))
    if tag == TYPE_GEOMETRY:
        return _read_wkb(r)
    raise ValueError(f"unsupported shape tag byte {tag}")


def shape_to_bytes(shape, geo: bool = True, use_float: bool = False) -> bytes:
    w = _Writer(use_float)
    _write_shape(w, shape, geo)
    return w.bytes()


def shape_from_bytes(buf: bytes, geo: bool = True, use_float: bool = False):
    r = _Reader(buf, use_float)
    s = _read_shape(r, geo)
    if r.pos != len(buf):
        raise ValueError(f"trailing bytes after shape ({len(buf) - r.pos})")
    return s
