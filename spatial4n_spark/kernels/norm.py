"""Longitude/latitude normalization.

Semantics match reference ``src/Spatial4n/Distance/DistanceUtils.cs:295-319``
(NormLonDEG / NormLatDEG) including the edge cases: values already in range
are returned bit-identically (no precision drift), +180 is preserved for
positive inputs that land exactly on the seam, and latitude folds across
the poles.
"""

from __future__ import annotations

import numpy as np


def norm_lon_deg(lon_deg):
    """Wrap longitude into [-180, 180]. DistanceUtils.cs:295-306."""
    lon = np.asarray(lon_deg, dtype=np.float64)
    scalar = lon.shape == ()
    lon = np.atleast_1d(lon)
    in_range = (lon >= -180.0) & (lon <= 180.0)
    # np.mod is non-negative (sign of divisor); the reference's C#-style
    # signed remainder branches collapse to `off - 180` under np.mod,
    # except the off==0 & lon>0 case which maps to +180.
    off = np.mod(lon + 180.0, 360.0)
    wrapped = off - 180.0
    wrapped = np.where((off == 0.0) & (lon > 0.0), 180.0, wrapped)
    out = np.where(in_range, lon, wrapped)
    return float(out[0]) if scalar else out


def norm_lat_deg(lat_deg):
    """Fold latitude into [-90, 90]. DistanceUtils.cs:313-319."""
    lat = np.asarray(lat_deg, dtype=np.float64)
    scalar = lat.shape == ()
    lat = np.atleast_1d(lat)
    in_range = (lat >= -90.0) & (lat <= 90.0)
    # C# % keeps the dividend's sign -> np.fmod, then abs, as the reference.
    off = np.abs(np.fmod(lat + 90.0, 360.0))
    folded = np.where(off <= 180.0, off, 360.0 - off) - 90.0
    out = np.where(in_range, lat, folded)
    return float(out[0]) if scalar else out
