"""Buffered-line relate kernels (Euclidean-only, like the reference).

Semantics: Spatial4n.Core/Shapes/Impl/BufferedLine.cs (ctor bbox math
:60-155, Relate :194-219, ExpandBufForLongitudeSkew :170-182) and
Impl/InfBufLine.cs (point distance :96-103, quadrant logic :121-143,
rect relate :60-86). A buffered line is a rotated-rectangle region:
the intersection of two infinite buffered lines (primary + perpendicular
through the segment midpoint).

A buffered linestring relates as the union of its segments (each point
CONTAINS if any segment contains; per the reference BufferedLineString
is a ShapeCollection of BufferedLine, ShapeCollection.cs:131-161).
"""
from __future__ import annotations

import numpy as np

from .circle_box import lon_degrees_at_lat
from .relation import CONTAINS, DISJOINT, INTERSECTS


class BufLineParams:
    """Vectorized precompute of per-segment line parameters.

    ax, ay, bx, by, buf are arrays (one row per segment).
    """

    def __init__(self, ax, ay, bx, by, buf):
        ax, ay, bx, by, buf = (np.asarray(a, dtype=np.float64)
                               for a in (ax, ay, bx, by, buf))
        ax, ay, bx, by, buf = np.broadcast_arrays(ax, ay, bx, by, buf)
        dy = by - ay
        dx = bx - ax
        cx = ax + dx / 2.0
        cy = ay + dy / 2.0
        degenerate = (dx == 0) & (dy == 0)
        with np.errstate(divide="ignore", invalid="ignore"):
            slope_p = np.where(degenerate, 0.0, dy / dx)          # primary
            slope_q = np.where(degenerate, np.inf, -dx / dy)      # perpendicular
        length = np.sqrt(dx * dx + dy * dy)
        self.buf_p = buf
        self.buf_q = np.where(degenerate, buf, length / 2.0 + buf)
        # line i: y = slope*x + intercept (x-intercept when vertical)
        self.slope_p = slope_p
        self.icept_p = np.where(np.isinf(slope_p), cx, cy - slope_p * cx)
        with np.errstate(invalid="ignore"):
            self.denom_p = np.where(np.isinf(slope_p), np.nan,
                                    1.0 / np.sqrt(slope_p * slope_p + 1.0))
        self.slope_q = slope_q
        self.icept_q = np.where(np.isinf(slope_q), cx, cy - slope_q * cx)
        with np.errstate(invalid="ignore"):
            self.denom_q = np.where(np.isinf(slope_q), np.nan,
                                    1.0 / np.sqrt(slope_q * slope_q + 1.0))


def _inf_line_distance(slope, icept, denom, px, py):
    """InfBufLine.DistanceUnbuffered (InfBufLine.cs:96-103)."""
    vert = np.isinf(slope)
    d_vert = np.abs(px - icept)
    with np.errstate(invalid="ignore"):
        d_gen = np.abs(py - slope * px - icept) * denom
    return np.where(vert, d_vert, d_gen)


def buffered_line_contains(ax, ay, bx, by, buf, px, py):
    """BufferedLine.Contains (BufferedLine.cs:215-219): inside both
    infinite buffered lines."""
    p = BufLineParams(ax, ay, bx, by, buf)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    in_p = _inf_line_distance(p.slope_p, p.icept_p, p.denom_p, px, py) <= p.buf_p
    in_q = _inf_line_distance(p.slope_q, p.icept_q, p.denom_q, px, py) <= p.buf_q
    return in_p & in_q


def line_point_distance(ax, ay, bx, by, px, py):
    """Perpendicular distance from point to the segment's primary
    infinite line (the quantity asserted by BufferedLineTest.cs:68-97)."""
    p = BufLineParams(ax, ay, bx, by, 0.0)
    return _inf_line_distance(p.slope_p, p.icept_p, p.denom_p,
                              np.asarray(px, dtype=np.float64),
                              np.asarray(py, dtype=np.float64))


def _quadrant(slope, icept, px, py):
    """InfBufLine.Quadrant (InfBufLine.cs:121-143)."""
    vert = np.isinf(slope)
    with np.errstate(invalid="ignore"):
        y_at = slope * px + icept
    above = py >= y_at
    q_gen = np.where(slope > 0, np.where(above, 2, 4), np.where(above, 1, 3))
    q_vert = np.where(px > icept, 1, 2)
    return np.where(vert, q_vert, q_gen)


_OPPOSITE = np.array([-1, 3, 4, 1, 2])


def _corner_by_quadrant(minx, maxx, miny, maxy, quad):
    x = np.where((quad == 1) | (quad == 4), maxx, minx)
    y = np.where((quad == 1) | (quad == 2), maxy, miny)
    return x, y


def _inf_line_relate_rect(slope, icept, denom, buf, minx, maxx, miny, maxy, cx, cy):
    """InfBufLine.Relate(rect) (InfBufLine.cs:60-86)."""
    def contains(px, py):
        return _inf_line_distance(slope, icept, denom, px, py) <= buf

    c_quad = _quadrant(slope, icept, cx, cy)
    near_x, near_y = _corner_by_quadrant(minx, maxx, miny, maxy, _OPPOSITE[c_quad])
    near_in = contains(near_x, near_y)
    far_x, far_y = _corner_by_quadrant(minx, maxx, miny, maxy, c_quad)
    far_in = contains(far_x, far_y)
    near_quad_same = _quadrant(slope, icept, near_x, near_y) == c_quad
    out = np.where(near_in,
                   np.where(far_in, CONTAINS, INTERSECTS),
                   np.where(near_quad_same, DISJOINT, INTERSECTS))
    return out.astype(np.int8)


def relate_buffered_line_rect(ax, ay, bx, by, buf, minx, maxx, miny, maxy,
                              world=(-180.0, 180.0, -90.0, 90.0)):
    """BufferedLine.Relate(rect) (BufferedLine.cs:194-213).

    bbox gate (DISJOINT / WITHIN), then both infinite lines must agree.
    """
    from .relate_rect import relate_rect_rect
    from .relation import WITHIN
    p = BufLineParams(ax, ay, bx, by, buf)
    ax, ay, bx, by, buf = (np.atleast_1d(np.asarray(a, dtype=np.float64))
                           for a in (ax, ay, bx, by, buf))
    minx, maxx, miny, maxy = (np.atleast_1d(np.asarray(a, dtype=np.float64))
                              for a in (minx, maxx, miny, maxy))
    # bbox per ctor (BufferedLine.cs:92-154)
    vert = (bx - ax) == 0
    with np.errstate(invalid="ignore"):
        bbox_buf = buf * (1.0 + np.abs(p.slope_p)) * p.denom_p
    bbox_buf = np.where(vert, buf, bbox_buf)
    lminx = np.minimum(ax, bx) - bbox_buf
    lmaxx = np.maximum(ax, bx) + bbox_buf
    lminy = np.minimum(ay, by) - np.where(vert, buf, bbox_buf)
    lmaxy = np.maximum(ay, by) + np.where(vert, buf, bbox_buf)
    lminx = np.maximum(world[0], lminx)
    lmaxx = np.minimum(world[1], lmaxx)
    lminy = np.maximum(world[2], lminy)
    lmaxy = np.minimum(world[3], lmaxy)
    bbox_rel = relate_rect_rect(lminx, lmaxx, lminy, lmaxy,
                                minx, maxx, miny, maxy, geo=False)
    rcx = (minx + maxx) / 2.0
    rcy = (miny + maxy) / 2.0
    rel_p = _inf_line_relate_rect(p.slope_p, p.icept_p, p.denom_p, p.buf_p,
                                  minx, maxx, miny, maxy, rcx, rcy)
    rel_q = _inf_line_relate_rect(p.slope_q, p.icept_q, p.denom_q, p.buf_q,
                                  minx, maxx, miny, maxy, rcx, rcy)
    merged = np.where(rel_p == rel_q, rel_p, INTERSECTS).astype(np.int8)
    merged = np.where((rel_p == DISJOINT) | (rel_q == DISJOINT), DISJOINT, merged)
    out = np.where((bbox_rel == DISJOINT) | (bbox_rel == WITHIN), bbox_rel, merged)
    return out.astype(np.int8)


def expand_buf_for_longitude_skew(ay, by, buf):
    """BufferedLine.ExpandBufForLongitudeSkew (BufferedLine.cs:170-182)."""
    max_lat = np.maximum(np.abs(np.asarray(ay, dtype=np.float64)),
                         np.abs(np.asarray(by, dtype=np.float64)))
    return lon_degrees_at_lat(max_lat, buf)


def linestring_contains_point(xs, ys, buf, px, py):
    """Buffered linestring (one polyline) contains points: any segment
    contains. xs/ys = the polyline vertices; px/py = point batch."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    if len(xs) == 0:
        return np.zeros(px.shape, dtype=bool)
    if len(xs) == 1:
        return buffered_line_contains(xs[0], ys[0], xs[0], ys[0], buf, px, py)
    out = np.zeros(px.shape, dtype=bool)
    for i in range(len(xs) - 1):
        out |= buffered_line_contains(xs[i], ys[i], xs[i + 1], ys[i + 1], buf, px, py)
    return out
