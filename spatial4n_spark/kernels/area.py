"""Area kernels (degrees^2 units, matching the reference).

Semantics: GeodesicSphereDistCalc.Area(rect) (GeodesicSphereDistCalc
.cs:58-66, proportional to |sin(lat1)-sin(lat2)| * width), Area(circle)
spherical cap (:68-73), Euclidean variants (RectangleImpl.cs:118-128,
CircleImpl.cs:66-76). Whole-earth area == 4*pi*r^2 with r in degrees
(TestDistances.TestArea fixture).
"""
from __future__ import annotations

import numpy as np

from .normalize import RADIANS_TO_DEGREES, to_radians
from .relate_rect import rect_width

_RADIUS_DEG = RADIANS_TO_DEGREES  # sphere radius expressed in degrees


def geo_rect_area(minx, maxx, miny, maxy):
    """Spherical rect (lat-lon band patch) area in deg^2."""
    lat1 = to_radians(miny)
    lat2 = to_radians(maxy)
    return (np.pi / 180.0) * _RADIUS_DEG * _RADIUS_DEG * \
        np.abs(np.sin(lat1) - np.sin(lat2)) * rect_width(minx, maxx)


def geo_circle_area(radius_deg):
    """Spherical cap area in deg^2."""
    lat = to_radians(90.0 - np.asarray(radius_deg, dtype=np.float64))
    return 2.0 * np.pi * _RADIUS_DEG * _RADIUS_DEG * (1.0 - np.sin(lat))


def euclidean_rect_area(minx, maxx, miny, maxy):
    return (np.asarray(maxx, dtype=np.float64) - minx) * (np.asarray(maxy, dtype=np.float64) - miny)


def euclidean_circle_area(radius):
    r = np.asarray(radius, dtype=np.float64)
    return np.pi * r * r
