"""Coordinate normalization and unit conversions, vectorized.

Semantics: Spatial4n.Core/Distance/DistanceUtils.cs:290-314 (norm),
:41-70 (constants), :589-638 (conversions). Constants copied exactly so
distance fixtures match bit-for-bit.
"""
from __future__ import annotations

import numpy as np

DEGREES_TO_RADIANS = np.pi / 180.0
RADIANS_TO_DEGREES = 1.0 / DEGREES_TO_RADIANS
EARTH_MEAN_RADIUS_KM = 6371.0087714
EARTH_EQUATORIAL_RADIUS_KM = 6378.1370
DEGREES_TO_KILOMETERS = DEGREES_TO_RADIANS * EARTH_MEAN_RADIUS_KM
KILOMETERS_TO_DEGREES = 1.0 / DEGREES_TO_KILOMETERS
# DistanceUtils.cs:95-112 — exact constants
KM_TO_MILES = 0.621371192
MILES_TO_KM = 1.0 / KM_TO_MILES
EARTH_MEAN_RADIUS_MI = EARTH_MEAN_RADIUS_KM * KM_TO_MILES
EARTH_EQUATORIAL_RADIUS_MI = EARTH_EQUATORIAL_RADIUS_KM * KM_TO_MILES


def to_radians(deg):
    return np.asarray(deg, dtype=np.float64) * DEGREES_TO_RADIANS


def to_degrees(rad):
    return np.asarray(rad, dtype=np.float64) * RADIANS_TO_DEGREES


def dist_to_degrees(dist, radius=EARTH_MEAN_RADIUS_KM):
    """Distance in radius units -> degrees. DistanceUtils.cs:589-592."""
    return to_degrees(np.asarray(dist, dtype=np.float64) / radius)


def degrees_to_dist(degrees, radius=EARTH_MEAN_RADIUS_KM):
    """Degrees -> distance in radius units. DistanceUtils.cs:599-602."""
    return to_radians(degrees) * radius


def norm_lon_deg(lon):
    """Wrap longitude into [-180, 180]. DistanceUtils.cs:290-301.

    Values already in range pass through untouched (avoids precision
    shifting); +360k offsets reduce mod 360; an exact positive multiple
    of 360 above 180 maps to +180 (e.g. 360+180 -> 180, not -180).
    """
    lon = np.asarray(lon, dtype=np.float64)
    scalar = lon.ndim == 0
    lon = np.atleast_1d(lon)
    out = lon.copy()
    need = ~((lon >= -180.0) & (lon <= 180.0))
    if need.any():
        v = lon[need]
        off = np.mod(v + 180.0, 360.0)  # python-style mod: result in [0,360)
        res = np.where(off < 0, 180.0 + off, -180.0 + off)
        res = np.where((off == 0) & (v > 0), 180.0, res)
        out[need] = res
    return out[0] if scalar else out


def norm_lat_deg(lat):
    """Fold latitude into [-90, 90]. DistanceUtils.cs:308-314."""
    lat = np.asarray(lat, dtype=np.float64)
    scalar = lat.ndim == 0
    lat = np.atleast_1d(lat)
    out = lat.copy()
    need = ~((lat >= -90.0) & (lat <= 90.0))
    if need.any():
        v = lat[need]
        # C# % keeps the sign of the dividend; abs() after matches np.fmod+abs
        off = np.abs(np.fmod(v + 90.0, 360.0))
        out[need] = np.where(off <= 180.0, off, 360.0 - off) - 90.0
    return out[0] if scalar else out
