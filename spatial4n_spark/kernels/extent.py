"""Longitude-smart bbox union (the st_extent aggregation core).

Semantics: Impl/Range.cs LongitudeRange (:107-203) — ExpandTo picks the
narrower circular union of two longitude ranges (dateline-aware), used
by ShapeCollection.ComputeBoundingBox (ShapeCollection.cs:67-91).
"""
from __future__ import annotations

import numpy as np


def _lon_center(lo, hi):
    c = (lo + hi + (360.0 if lo > hi else 0.0)) / 2.0
    return c - 360.0 if c > 180.0 else c


def _lon_contains(lo, hi, v):
    if lo > hi:  # crosses dateline
        return v >= lo or v <= hi
    return lo <= v <= hi


def _circular_diff(a, b):
    d = a - b
    if d <= 180:
        return d if d >= -180 else d + 360
    return d - 360


def lon_range_expand(lo1, hi1, lo2, hi2):
    """LongitudeRange.ExpandTo (Range.cs:182-202): smallest circular
    union of two longitude ranges. Returns (lo, hi); may cross dateline."""
    if _circular_diff(_lon_center(lo1, hi1), _lon_center(lo2, hi2)) <= 0:
        a = (lo1, hi1)
        b = (lo2, hi2)
    else:
        a = (lo2, hi2)
        b = (lo1, hi1)
    new_min = b if _lon_contains(b[0], b[1], a[0]) else a
    new_max = a if _lon_contains(a[0], a[1], b[1]) else b
    if new_min is new_max:
        return new_min
    if new_min is b and new_max is a:
        return (-180.0, 180.0)
    return (new_min[0], new_max[1])


def union_bboxes(boxes):
    """Fold (minx,maxx,miny,maxy) boxes into one dateline-aware bbox.

    ShapeCollection.ComputeBoundingBox analog (ShapeCollection.cs:67-91).
    """
    boxes = [b for b in boxes if not any(np.isnan(v) for v in b)]
    if not boxes:
        nan = float("nan")
        return (nan, nan, nan, nan)
    lo, hi = boxes[0][0], boxes[0][1]
    miny = min(b[2] for b in boxes)
    maxy = max(b[3] for b in boxes)
    for b in boxes[1:]:
        lo, hi = lon_range_expand(lo, hi, b[0], b[1])
    return (lo, hi, miny, maxy)
