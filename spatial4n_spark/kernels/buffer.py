"""GetBuffered(distance) kernels, vectorized.

Reference semantics:
- Rect (Impl/RectangleImpl.cs:76-114): geo path checks pole touch
  (north first) -> world-wrap lon rect with clamped lat; otherwise
  lat expands by the distance and lon by the delta-lon at the rect's
  closest-to-pole latitude (maxY for any non-degenerate rect — the
  reference picks maxY whenever height > 0), world-wrapping lon when
  2*lonDistance + width >= 360. Cartesian path clamps to world bounds.
- Point (Impl/PointImpl.cs:67-70): buffered point IS a circle of
  radius = distance.
- Circle (Impl/CircleImpl.cs:78-81): radius grows by the distance
  (MakeCircle clamps > 180 upstream, handled by the caller).
"""
from __future__ import annotations

import numpy as np

from .circle_box import delta_lon_deg
from .normalize import norm_lon_deg


def buffer_rect(minx, maxx, miny, maxy, dist, geo: bool = True):
    """Vectorized rect GetBuffered -> (minx, maxx, miny, maxy)."""
    minx = np.asarray(minx, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    if not geo:
        return (np.maximum(-180.0, minx - dist), np.minimum(180.0, maxx + dist),
                np.maximum(-90.0, miny - dist), np.minimum(90.0, maxy + dist))
    north = maxy + dist >= 90.0
    south = miny - dist <= -90.0
    closest = np.where(maxy - miny > 0.0, maxy, miny)
    dl = delta_lon_deg(closest, dist)
    width = maxx - minx
    width = np.where(width < 0.0, width + 360.0, width)
    wrap = dl * 2.0 + width >= 360.0
    ominx = np.where(wrap, -180.0, norm_lon_deg(minx - dl))
    omaxx = np.where(wrap, 180.0, norm_lon_deg(maxx + dl))
    pole = north | south
    rminx = np.where(pole, -180.0, ominx)
    rmaxx = np.where(pole, 180.0, omaxx)
    rminy = np.where(north, np.maximum(-90.0, miny - dist),
                     np.where(south, -90.0, miny - dist))
    rmaxy = np.where(north, 90.0,
                     np.where(south, np.minimum(90.0, maxy + dist),
                              maxy + dist))
    return rminx, rmaxx, rminy, rmaxy
