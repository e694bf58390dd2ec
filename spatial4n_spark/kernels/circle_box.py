"""Circle bounding-box kernels (the radius-query -> bbox expansion).

Semantics: DistanceUtils.CalcBoxByDistFromPtDEG (DistanceUtils.cs:321-384),
CalcBoxByDistFromPt_deltaLonDEG (:390-402),
CalcBoxByDistFromPt_latHorizAxisDEG (:411-433),
CalcLonDegreesAtLat (:456-473). All branches vectorized as masks.

These feed the distributed distance-join: circle -> bbox -> covering
cell set, and the GeoCircle relate kernel (horizontal-axis latitude).
"""
from __future__ import annotations

import numpy as np

from .normalize import norm_lon_deg, to_degrees, to_radians


def delta_lon_deg(lat, dist_deg):
    """Half the width of a circle's bbox. DistanceUtils.cs:390-402.

    asin(sin(d)/cos(lat)); NaN (circle crosses a pole meridian) -> 90.
    """
    lat = np.asarray(lat, dtype=np.float64)
    dist_deg = np.asarray(dist_deg, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.arcsin(np.sin(to_radians(dist_deg)) / np.cos(to_radians(lat)))
    out = np.where(np.isnan(r), 90.0, to_degrees(r))
    return np.where(dist_deg == 0, 0.0, out)


def lat_horiz_axis_deg(lat, dist_deg):
    """Latitude of the circle's widest (left-right) axis on a sphere.

    DistanceUtils.cs:411-433 incl. the pole snap branches.
    """
    lat = np.asarray(lat, dtype=np.float64)
    dist_deg = np.asarray(dist_deg, dtype=np.float64)
    with np.errstate(invalid="ignore", divide="ignore"):
        r = np.arcsin(np.sin(to_radians(lat)) / np.cos(to_radians(dist_deg)))
    out = to_degrees(r)
    # NaN fallback ordered as in the reference: lat>0 -> 90, lat<0 -> -90, else lat
    nan = np.isnan(r)
    out = np.where(nan & (lat > 0), 90.0, out)
    out = np.where(nan & (lat < 0), -90.0, out)
    out = np.where(nan & (lat == 0), lat, out)
    out = np.where(lat + dist_deg >= 90.0, 90.0, out)
    out = np.where(lat - dist_deg <= -90.0, -90.0, out)
    return np.where(dist_deg == 0, lat, out)


def geo_circle_bbox(x, y, dist_deg):
    """Geo bbox of circle (lon=x, lat=y, radius deg) -> (minx,maxx,miny,maxy).

    DistanceUtils.CalcBoxByDistFromPtDEG (DistanceUtils.cs:321-384):
    r==0 -> point box; r>=180 -> world; pole-touch -> lon span 180 or 360;
    else asin-based delta-lon. The result may cross the dateline
    (minx > maxx).
    """
    x = np.atleast_1d(np.asarray(x, dtype=np.float64))
    y = np.atleast_1d(np.asarray(y, dtype=np.float64))
    d = np.atleast_1d(np.asarray(dist_deg, dtype=np.float64))
    x, y, d = np.broadcast_arrays(x, y, d)

    maxy = y + d
    miny = y - d
    touches_pole = (maxy >= 90.0) | (miny <= -90.0)
    passes_pole = (maxy > 90.0) | (miny < -90.0)

    dl = delta_lon_deg(y, d)
    minx = np.where(touches_pole,
                    np.where(passes_pole, -180.0, norm_lon_deg(x - 90.0)),
                    norm_lon_deg(x - dl))
    maxx = np.where(touches_pole,
                    np.where(passes_pole, 180.0, norm_lon_deg(x + 90.0)),
                    norm_lon_deg(x + dl))
    maxy = np.minimum(maxy, 90.0)
    miny = np.maximum(miny, -90.0)

    world = d >= 180.0
    minx = np.where(world, -180.0, minx)
    maxx = np.where(world, 180.0, maxx)
    miny = np.where(world, -90.0, miny)
    maxy = np.where(world, 90.0, maxy)

    zero = d == 0
    minx = np.where(zero, x, minx)
    maxx = np.where(zero, x, maxx)
    miny = np.where(zero, y, miny)
    maxy = np.where(zero, y, maxy)
    return minx, maxx, miny, maxy


def cartesian_circle_bbox(x, y, dist):
    """CartesianDistCalc.CalcBoxByDistFromPt (CartesianDistCalc.cs:93-108)."""
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    return x - dist, x + dist, y - dist, y + dist


def lon_degrees_at_lat(lat, dist):
    """Longitude degrees spanning `dist` at latitude `lat`.

    DistanceUtils.CalcLonDegreesAtLat (DistanceUtils.cs:456-473); used for
    longitude-skew buffer expansion of buffered lines.
    """
    d = to_radians(np.asarray(dist, dtype=np.float64))
    sl = to_radians(np.asarray(lat, dtype=np.float64))
    cos_ad, cos_sl = np.cos(d), np.cos(sl)
    sin_ad, sin_sl = np.sin(d), np.sin(sl)
    return to_degrees(np.arctan2(sin_ad * cos_sl, cos_ad * (1.0 - sin_sl * sin_sl)))
