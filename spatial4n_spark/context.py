"""Engine configuration — the analog of the reference's SpatialContext.

Reference ``src/Spatial4n/Context/SpatialContext.cs:39-447``: geo (spherical,
lat/lon degrees, world bounds [-180,180]x[-90,90]) vs cartesian (euclidean
plane); default distance calculator is haversine when geo, cartesian
otherwise (:100-109); optional normWrapLongitude wraps X on NormX
(:132,:185-190).

In the Spark engine this is a plain dataclass captured in UDF closures —
zero per-row cost. It also owns engine-level planning knobs (cell level,
salt factor) that the reference, being a scalar library, does not have.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SpatialCtx:
    geo: bool = True
    calculator: str = "haversine"  # haversine | lawofcosines | vincenty | cartesian
    norm_wrap_longitude: bool = False
    # world bounds
    min_x: float = -180.0
    max_x: float = 180.0
    min_y: float = -90.0
    max_y: float = 90.0
    # engine knobs (no reference counterpart)
    cell_level: int = 4  # geohash precision used for tiling / join partitioning
    # S2 level of equivalent granularity: geohash level g resolves
    # ~2.5*g bits per axis over 360 deg, an S2 level L resolves L bits
    # per axis over ~90 deg (one face) -> equal cell width at
    # L = 2.5*g - 2 (g=4 -> L=8, ~0.35 deg cells both ways)
    s2_cell_level: int = 8
    salt_buckets: int = 8  # salting factor for hot cells
    hot_cell_threshold: int = 200_000  # rows per cell before salting kicks in

    def __post_init__(self):
        if not self.geo:
            object.__setattr__(self, "min_x", -1.7976931348623157e308)
            object.__setattr__(self, "max_x", 1.7976931348623157e308)
            object.__setattr__(self, "min_y", -1.7976931348623157e308)
            object.__setattr__(self, "max_y", 1.7976931348623157e308)
            if self.calculator == "haversine":
                object.__setattr__(self, "calculator", "cartesian")


GEO = SpatialCtx(geo=True)
CARTESIAN = SpatialCtx(geo=False, calculator="cartesian")
