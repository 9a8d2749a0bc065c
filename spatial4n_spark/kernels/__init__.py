"""Pure-numpy geometry kernels (no Spark imports).

Every kernel takes/returns numpy arrays (scalars broadcast) so the Spark
layer can wrap them in Arrow-vectorized pandas UDFs with no per-row Python.
"""

from spatial4n_spark.kernels.norm import norm_lat_deg, norm_lon_deg
from spatial4n_spark.kernels.geodesic import (  # noqa: F401
    WGS84_A,
    WGS84_F,
    vincenty_direct,
    vincenty_inverse_m,
)
from spatial4n_spark.kernels.distance import (
    DEG_TO_RAD,
    EARTH_EQUATORIAL_RADIUS_KM,
    EARTH_MEAN_RADIUS_KM,
    RAD_TO_DEG,
    deg_to_km,
    dist_cartesian,
    dist_haversine_rad,
    dist_law_of_cosines_rad,
    dist_vincenty_rad,
    distance_deg,
    km_to_deg,
    point_on_bearing_rad,
    vector_distance,
)
from spatial4n_spark.kernels.bbox import (
    rect_contains_point,
    rect_relate_rect,
    relate_range,
    relate_x_range,
    relate_y_range,
)
from spatial4n_spark.kernels.circle import (
    circle_bbox,
    circle_delta_lon_deg,
    circle_lat_horiz_axis_deg,
    circle_relate_rect,
    geo_circle_relate_rect,
)
from spatial4n_spark.kernels.geohash import (
    geohash_cell_sizes,
    geohash_decode_bbox,
    geohash_decode_center,
    geohash_encode,
    geohash_encode_str,
    geohash_len_for_width_height,
    geohash_neighbors,
    geohash_sub_cells,
)
