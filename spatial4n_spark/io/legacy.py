"""Legacy string shape format + point parsing utilities.

Reference ``src/Spatial4n/IO/LegacyShapeReadWriterFormat.cs:46-204``:

- write: point "X Y"; rect "MinX MinY MaxX MaxY"; circle "Circle(X Y d=R)"
  (six-decimal fixed format)
- read: "Circle(...)"/"CIRCLE(...)" with "d="/"distance="/bare radius;
  a comma inside a token means "lat,lon" order (ReadLatCommaLonPoint);
  otherwise "x y" = point, "minX minY maxX maxY" = rect; extra tokens are
  an error

and ``src/Spatial4n/IO/ParseUtils.cs:46-172``: ParsePoint / ParseLatitudeLongitude
(comma- or space-separated lat,lon pair).
"""

from __future__ import annotations

from spatial4n_spark.kernels.polygon import Circle, Point, Rect
from spatial4n_spark.io.wkt import InvalidShapeError, make_rect


def write_legacy(shape, fmt: str = "{:.6f}") -> str:
    if isinstance(shape, Point):
        return f"{fmt.format(shape.x)} {fmt.format(shape.y)}"
    if isinstance(shape, Rect):
        return (
            f"{fmt.format(shape.min_x)} {fmt.format(shape.min_y)} "
            f"{fmt.format(shape.max_x)} {fmt.format(shape.max_y)}"
        )
    if isinstance(shape, Circle):
        return f"Circle({fmt.format(shape.x)} {fmt.format(shape.y)} d={fmt.format(shape.radius)})"
    raise TypeError(f"legacy format: unsupported {type(shape).__name__}")


def _num(tok: str, s: str) -> float:
    """float() that reports malformed numbers as invalid-shape errors
    (the reference parser's contract — never a bare ValueError)."""
    try:
        return float(tok)
    except ValueError:
        raise InvalidShapeError(f"bad number {tok!r} :: {s}") from None


def _lat_comma_lon(token: str) -> Point:
    lat_s, lon_s = token.split(",", 1)
    return Point(_num(lon_s, token), _num(lat_s, token))  # comma form is lat,lon order


def read_legacy(s: str, geo: bool = True):
    """Parse the legacy format; returns Point/Rect/Circle or None when the
    string starts with a letter but isn't a Circle (caller may try other
    parsers — the reference's contract)."""
    if not s:
        raise InvalidShapeError("empty legacy shape string")
    if s[0].isalpha():
        if not (s.startswith("Circle(") or s.startswith("CIRCLE(")):
            return None
        idx = s.rfind(")")
        if idx <= 0:
            return None
        body = s[len("Circle("):idx]
        tokens = [t for t in body.split(" ") if t]
        if len(tokens) < 2:
            raise InvalidShapeError(f"Circle needs a center and a distance :: {s}")
        i = 0
        if "," in tokens[i]:
            pt = _lat_comma_lon(tokens[i])
        else:
            x = _num(tokens[i], s)
            i += 1
            if i >= len(tokens) - 1:
                raise InvalidShapeError(f"Circle needs a center and a distance :: {s}")
            y = _num(tokens[i], s)
            pt = Point(x, y)
        i += 1
        arg = tokens[i]
        eq = arg.find("=")
        if eq > 0:
            k, v = arg[:eq], arg[eq + 1:]
            if k not in ("d", "distance"):
                raise InvalidShapeError(f"unknown arg: {k} :: {s}")
            d = _num(v, s)
        else:
            d = _num(arg, s)
        if i < len(tokens) - 1:
            raise InvalidShapeError(f"Extra arguments: {tokens[i + 1]} :: {s}")
        return Circle(pt.x, pt.y, d, geo=geo)

    if "," in s:
        return _lat_comma_lon(s)
    tokens = [t for t in s.split(" ") if t]
    if len(tokens) < 2 or len(tokens) == 3:
        raise InvalidShapeError(f"expected 2 (point) or 4 (rect) numbers: {s}")
    p0, p1 = _num(tokens[0], s), _num(tokens[1], s)
    if len(tokens) > 2:
        p2, p3 = _num(tokens[2], s), _num(tokens[3], s)
        if len(tokens) > 4:
            raise InvalidShapeError(f"Only 4 numbers supported (rect) but found more: {s}")
        return make_rect(p0, p2, p1, p3, geo=geo)
    return Point(p0, p1)


def parse_point(s: str) -> Point:
    """ParseUtils.ParsePoint: 'x y' or 'x,y' (x,y order)."""
    parts = [p for p in s.replace(",", " ").split(" ") if p]
    if len(parts) != 2:
        raise InvalidShapeError(f"expected two coordinates: {s!r}")
    return Point(_num(parts[0], s), _num(parts[1], s))


def parse_lat_lon(s: str) -> tuple[float, float]:
    """ParseUtils.ParseLatitudeLongitude: 'lat,lon' (or space-separated)
    -> (lat, lon)."""
    parts = [p for p in s.replace(",", " ").split(" ") if p]
    if len(parts) != 2:
        raise InvalidShapeError(f"expected lat,lon: {s!r}")
    return _num(parts[0], s), _num(parts[1], s)
