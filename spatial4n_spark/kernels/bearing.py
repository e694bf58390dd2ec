"""Destination-point-on-bearing kernels, vectorized.

Semantics: DistanceUtils.PointOnBearingRAD (DistanceUtils.cs:222-283)
including its inline lon/lat re-normalization (pole flip), plus the
cartesian variant (CartesianDistCalc.cs:70-91). Used for synthetic data
generation and the reference's randomized-test replay.
"""
from __future__ import annotations

import numpy as np

from .normalize import to_degrees, to_radians

_D90 = np.pi / 2.0
_D180 = np.pi


def point_on_bearing_rad(start_lat, start_lon, dist_rad, bearing_rad):
    """Returns (lon2, lat2) in radians. DistanceUtils.cs:222-283."""
    start_lat, start_lon, dist_rad, bearing_rad = (
        np.asarray(a, dtype=np.float64) for a in (start_lat, start_lon, dist_rad, bearing_rad))
    cos_ad = np.cos(dist_rad)
    cos_sl = np.cos(start_lat)
    sin_ad = np.sin(dist_rad)
    sin_sl = np.sin(start_lat)
    sin_lat2 = sin_sl * cos_ad + cos_sl * sin_ad * np.cos(bearing_rad)
    lat2 = np.arcsin(np.clip(sin_lat2, -1.0, 1.0))
    lon2 = start_lon + np.arctan2(np.sin(bearing_rad) * sin_ad * cos_sl,
                                  cos_ad - sin_sl * sin_lat2)
    # normalize lon first (mirror of the two branches in the reference)
    lon2 = np.where(lon2 > _D180, -1.0 * (_D180 - (lon2 - _D180)), lon2)
    lon2 = np.where(lon2 < -_D180, (lon2 + _D180) + _D180, lon2)
    # normalize lat - could flip poles
    hi = lat2 > _D90
    lo = lat2 < -_D90
    lat2 = np.where(hi, _D90 - (lat2 - _D90), lat2)
    lat2 = np.where(lo, -_D90 - (lat2 + _D90), lat2)
    flip = hi | lo
    lon2 = np.where(flip, np.where(lon2 < 0, lon2 + _D180, lon2 - _D180), lon2)
    return lon2, lat2


def geo_point_on_bearing_deg(x, y, dist_deg, bearing_deg):
    """(lon,lat,dist,bearing) degrees -> (lon2, lat2) degrees.

    Mirrors GeodesicSphereDistCalc.PointOnBearing (:31-46) incl. the
    dist==0 identity shortcut.
    """
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dist_deg = np.asarray(dist_deg, dtype=np.float64)
    lon2, lat2 = point_on_bearing_rad(to_radians(y), to_radians(x),
                                      to_radians(dist_deg), to_radians(bearing_deg))
    lon2, lat2 = to_degrees(lon2), to_degrees(lat2)
    zero = dist_deg == 0
    return np.where(zero, x, lon2), np.where(zero, y, lat2)


def cartesian_point_on_bearing(x, y, dist, bearing_deg):
    """CartesianDistCalc.PointOnBearing (CartesianDistCalc.cs:70-91)."""
    b = to_radians(bearing_deg)
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    return x + np.sin(b) * dist, y + np.cos(b) * dist
