from spatial4n_spark.io.wkt import (
    InvalidShapeError,
    WktParseError,
    parse_wkt,
    to_wkt,
)
from spatial4n_spark.io.wkt_nts import parse_wkt_reader

__all__ = [
    "parse_wkt",
    "parse_wkt_reader",
    "to_wkt",
    "WktParseError",
    "InvalidShapeError",
]
