"""Ellipsoidal geodesic distance (Vincenty inverse), vectorized.

Beyond the reference's distance set: Spatial4n's calculators are all
SPHERICAL (haversine / law-of-cosines / spherical Vincenty,
DistanceUtils.cs:512-593) — real-world image geotags live on WGS84,
where the sphere is off by up to ~0.5%.  This kernel is the classic
Vincenty (1975) inverse solution on the ellipsoid, a public-domain
algorithm, implemented as pure numpy over arrays (the engine's UDFs
batch it via Arrow).

Accuracy: ~0.5 mm on convergent pairs.  Vincenty's known failure mode
is NEARLY ANTIPODAL pairs, where the lambda iteration oscillates; those
lanes return NaN (converged=False) rather than a silently-wrong number
— the honest contract for a batch engine, where a NaN row is filterable
and a plausible-but-off-by-kilometers row is not.  (Karney's method
closes that gap; out of scope here.)

Validation anchors (tests/test_geodesic.py): the equator arc is exactly
a*sigma (the equator is a geodesic of known length), the WGS84 quarter
meridian is 10_001_965.729 m, one degree of latitude at the equator is
110_574.3 m, and f=0 degenerates to the great circle bit-for-bit
against kernels.distance.
"""

from __future__ import annotations

import numpy as np

WGS84_A = 6378137.0
WGS84_F = 1.0 / 298.257223563


def vincenty_inverse_m(
    lat1,
    lon1,
    lat2,
    lon2,
    a: float = WGS84_A,
    f: float = WGS84_F,
    max_iter: int = 100,
    tol: float = 1e-12,
):
    """Geodesic distance in METERS between (lat, lon) degree arrays on
    the (a, f) ellipsoid.  Returns (dist_m, converged): non-converged
    lanes (nearly antipodal) carry NaN.  ``f=0`` gives the exact sphere
    (great-circle) distance on radius ``a``."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    lat2 = np.asarray(lat2, dtype=np.float64)
    lon2 = np.asarray(lon2, dtype=np.float64)
    b = a * (1.0 - f)

    p1, l1 = np.radians(lat1), np.radians(lon1)
    p2, l2 = np.radians(lat2), np.radians(lon2)
    U1 = np.arctan((1.0 - f) * np.tan(p1))
    U2 = np.arctan((1.0 - f) * np.tan(p2))
    L = l2 - l1
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sinU2, cosU2 = np.sin(U2), np.cos(U2)

    lam = L.copy()
    converged = np.zeros(lam.shape, dtype=bool)
    # iteration state captured at convergence time
    sin_sig = np.zeros_like(lam)
    cos_sig = np.ones_like(lam)
    sigma = np.zeros_like(lam)
    cos2_alpha = np.ones_like(lam)
    cos_2sigm = np.ones_like(lam)
    coincident = np.zeros(lam.shape, dtype=bool)

    active = np.ones(lam.shape, dtype=bool)
    for _ in range(int(max_iter)):
        if not active.any():
            break
        sl, cl = np.sin(lam), np.cos(lam)
        t1 = cosU2 * sl
        t2 = cosU1 * sinU2 - sinU1 * cosU2 * cl
        ss = np.sqrt(t1 * t1 + t2 * t2)
        cs = sinU1 * sinU2 + cosU1 * cosU2 * cl
        sig = np.arctan2(ss, cs)
        zero = ss == 0.0  # coincident / same point: distance 0
        with np.errstate(divide="ignore", invalid="ignore"):
            sin_alpha = np.where(zero, 0.0, cosU1 * cosU2 * sl / np.where(zero, 1.0, ss))
        c2a = 1.0 - sin_alpha * sin_alpha
        eq = c2a == 0.0  # both points on the equator
        with np.errstate(divide="ignore", invalid="ignore"):
            c2sm = np.where(
                eq, 0.0, cs - 2.0 * sinU1 * sinU2 / np.where(eq, 1.0, c2a)
            )
        C = f / 16.0 * c2a * (4.0 + f * (4.0 - 3.0 * c2a))
        lam_new = L + (1.0 - C) * f * sin_alpha * (
            sig
            + C * ss * (c2sm + C * cs * (-1.0 + 2.0 * c2sm * c2sm))
        )
        done_now = active & (np.abs(lam_new - lam) < tol)
        upd = active
        sin_sig = np.where(upd, ss, sin_sig)
        cos_sig = np.where(upd, cs, cos_sig)
        sigma = np.where(upd, sig, sigma)
        cos2_alpha = np.where(upd, c2a, cos2_alpha)
        cos_2sigm = np.where(upd, c2sm, cos_2sigm)
        coincident = np.where(upd, zero, coincident)
        lam = np.where(active, lam_new, lam)
        converged |= done_now
        active &= ~done_now

    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))
    dsig = B * sin_sig * (
        cos_2sigm
        + B / 4.0 * (
            cos_sig * (-1.0 + 2.0 * cos_2sigm * cos_2sigm)
            - B / 6.0 * cos_2sigm
            * (-3.0 + 4.0 * sin_sig * sin_sig)
            * (-3.0 + 4.0 * cos_2sigm * cos_2sigm)
        )
    )
    dist = b * A * (sigma - dsig)
    dist = np.where(coincident & converged, 0.0, dist)
    dist = np.where(converged, dist, np.nan)
    return dist, converged


def vincenty_direct(
    lat1,
    lon1,
    azimuth_deg,
    s_m,
    a: float = WGS84_A,
    f: float = WGS84_F,
    max_iter: int = 100,
    tol: float = 1e-12,
):
    """Destination point: start (lat, lon) degrees, initial bearing
    (degrees clockwise from north), distance in meters along the
    geodesic on the (a, f) ellipsoid -> (lat2, lon2) degrees — the
    DIRECT Vincenty problem (always convergent, unlike the inverse).
    The ellipsoidal twin of the reference-parity spherical
    point-on-bearing (kernels/distance.py point_on_bearing family);
    ``f=0`` reproduces the sphere exactly.  Roundtrip closure with
    ``vincenty_inverse_m`` is pytest-pinned to sub-millimeter."""
    lat1 = np.asarray(lat1, dtype=np.float64)
    lon1 = np.asarray(lon1, dtype=np.float64)
    alpha1 = np.radians(np.asarray(azimuth_deg, dtype=np.float64))
    s = np.asarray(s_m, dtype=np.float64)
    b = a * (1.0 - f)

    p1 = np.radians(lat1)
    U1 = np.arctan((1.0 - f) * np.tan(p1))
    sinU1, cosU1 = np.sin(U1), np.cos(U1)
    sa1, ca1 = np.sin(alpha1), np.cos(alpha1)
    sigma1 = np.arctan2(np.tan(U1), ca1)
    sin_alpha = cosU1 * sa1
    cos2_alpha = 1.0 - sin_alpha * sin_alpha
    u2 = cos2_alpha * (a * a - b * b) / (b * b)
    A = 1.0 + u2 / 16384.0 * (4096.0 + u2 * (-768.0 + u2 * (320.0 - 175.0 * u2)))
    B = u2 / 1024.0 * (256.0 + u2 * (-128.0 + u2 * (74.0 - 47.0 * u2)))

    sigma = s / (b * A)
    for _ in range(int(max_iter)):
        two_sigm = 2.0 * sigma1 + sigma
        dsig = B * np.sin(sigma) * (
            np.cos(two_sigm)
            + B / 4.0 * (
                np.cos(sigma) * (-1.0 + 2.0 * np.cos(two_sigm) ** 2)
                - B / 6.0 * np.cos(two_sigm)
                * (-3.0 + 4.0 * np.sin(sigma) ** 2)
                * (-3.0 + 4.0 * np.cos(two_sigm) ** 2)
            )
        )
        new_sigma = s / (b * A) + dsig
        if np.all(np.abs(new_sigma - sigma) < tol):
            sigma = new_sigma
            break
        sigma = new_sigma

    ss, cs = np.sin(sigma), np.cos(sigma)
    two_sigm = 2.0 * sigma1 + sigma
    p2 = np.arctan2(
        sinU1 * cs + cosU1 * ss * ca1,
        (1.0 - f) * np.sqrt(
            sin_alpha * sin_alpha
            + (sinU1 * ss - cosU1 * cs * ca1) ** 2
        ),
    )
    lam = np.arctan2(ss * sa1, cosU1 * cs - sinU1 * ss * ca1)
    C = f / 16.0 * cos2_alpha * (4.0 + f * (4.0 - 3.0 * cos2_alpha))
    L = lam - (1.0 - C) * f * sin_alpha * (
        sigma
        + C * ss * (np.cos(two_sigm) + C * cs * (-1.0 + 2.0 * np.cos(two_sigm) ** 2))
    )
    lon2 = ((np.degrees(np.radians(lon1) + L) + 540.0) % 360.0) - 180.0
    return np.degrees(p2), lon2
