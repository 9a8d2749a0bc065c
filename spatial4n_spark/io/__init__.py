from spatial4n_spark.io.wkt import (
    InvalidShapeError,
    WktParseError,
    parse_wkt,
    to_wkt,
)

__all__ = ["parse_wkt", "to_wkt", "WktParseError", "InvalidShapeError"]
