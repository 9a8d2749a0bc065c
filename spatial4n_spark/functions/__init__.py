from spatial4n_spark.functions.native import (
    cell_id_int,
    haversine_deg,
    haversine_km,
    rect_contains_point,
    within_radius_km,
)
from spatial4n_spark.functions.udfs import (
    geohash_bbox_udf,
    geohash_udf,
    haversine_km_udf,
    pip_udf,
    relate_wkt_udf,
)

__all__ = [
    "haversine_km",
    "haversine_deg",
    "rect_contains_point",
    "within_radius_km",
    "cell_id_int",
    "geohash_udf",
    "geohash_bbox_udf",
    "pip_udf",
    "relate_wkt_udf",
    "haversine_km_udf",
]
