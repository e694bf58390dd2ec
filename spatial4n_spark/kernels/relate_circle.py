"""Circle relate kernels — cartesian Circle and spherical GeoCircle.

Semantics: Spatial4n.Core/Shapes/Impl/CircleImpl.cs (phase-1 bbox gate
:127-141, phase-2 closest/farthest-corner analysis :143-223, circle
vs circle :235-247) and Impl/GeoCircle.cs (inverse-circle trick for
r > 90 :46-75,:107-111, pole-wrap algorithm :169-230, corner counting
:235-271, horizontal-axis latitude :80-95).

Vectorization strategy: phase 1 runs on the full batch; phase 2
branches (no-dateline fast path, dateline corner logic, pole wrap,
inverse circle) each run vectorized on their row subset — rare globe
geometry doesn't slow the common path.
"""
from __future__ import annotations

import numpy as np

from .circle_box import geo_circle_bbox, lat_horiz_axis_deg
from .distance import cartesian_distance, geo_distance_deg
from .normalize import norm_lat_deg, norm_lon_deg
from .relation import CONTAINS, DISJOINT, INTERSECTS, WITHIN, _INVERSE
from .relate_rect import relate_rect_rect, relate_x_range, relate_y_range, rect_width


def circle_contains_xy(cx, cy, r, px, py, geo: bool = True, calculator: str = "haversine"):
    """Circle.Contains (CircleImpl.cs:83-86): distance(center, p) <= radius.

    An ulp-scaled tolerance absorbs libm rounding differences vs .NET at
    mathematically-exact boundaries (the reference's own "edge rounding
    issue" fixture, TestShapesGeo.cs:182, sits exactly on the boundary:
    circle(0,66,r=156) vs the south pole is a true distance of 156).
    """
    r = np.asarray(r, dtype=np.float64)
    eps = 32.0 * np.spacing(np.maximum(np.abs(r), 1.0))
    if geo:
        return geo_distance_deg(cx, cy, px, py, calculator) <= r + eps
    return cartesian_distance(cx, cy, px, py) <= r + eps


def relate_circle_point(cx, cy, r, px, py, geo: bool = True, calculator: str = "haversine"):
    """Circle.Relate(point) -> CONTAINS or DISJOINT. CircleImpl.cs:122-125."""
    inside = circle_contains_xy(cx, cy, r, px, py, geo, calculator)
    return np.where(inside, CONTAINS, DISJOINT).astype(np.int8)


def relate_circle_circle(cx1, cy1, r1, cx2, cy2, r2, geo: bool = True,
                         calculator: str = "haversine"):
    """Circle.Relate(circle): ring arithmetic. CircleImpl.cs:235-247."""
    if geo:
        cross = geo_distance_deg(cx1, cy1, cx2, cy2, calculator)
    else:
        cross = cartesian_distance(cx1, cy1, cx2, cy2)
    r1 = np.asarray(r1, dtype=np.float64)
    r2 = np.asarray(r2, dtype=np.float64)
    out = np.full(np.broadcast(cross, r1).shape, INTERSECTS, dtype=np.int8)
    out = np.where((cross < r2) & (cross + r1 <= r2), WITHIN, out)
    out = np.where((cross < r1) & (cross + r2 <= r1), CONTAINS, out)
    out = np.where(cross > r1 + r2, DISJOINT, out)
    return out


def _ulp(v):
    """Distance to the next representable double above |v| (C# Ulp for
    positive finite values, GeoCircle.cs:280-291)."""
    return np.spacing(np.abs(v))


def _phase2_corner_logic(cx, cy, r, horiz_y, rminx, rmaxx, rminy, rmaxy, bbox_sect,
                         geo: bool, calculator: str):
    """Circle.RelateRectanglePhase2 (CircleImpl.cs:143-223). No dateline.

    Returns DISJOINT / CONTAINS / INTERSECTS.
    """
    def contains(px, py):
        return circle_contains_xy(cx, cy, r, px, py, geo, calculator)

    x_axis = cx
    y_axis = horiz_y
    # closest & farthest X within the rect relative to the circle's x axis
    lo_x = x_axis < rminx
    hi_x = x_axis > rmaxx
    closest_x = np.where(lo_x, rminx, np.where(hi_x, rmaxx, x_axis))
    far_inner_x = np.where(rmaxx - x_axis > x_axis - rminx, rmaxx, rminx)
    farthest_x = np.where(lo_x, rmaxx, np.where(hi_x, rminx, far_inner_x))
    lo_y = y_axis < rminy
    hi_y = y_axis > rmaxy
    closest_y = np.where(lo_y, rminy, np.where(hi_y, rmaxy, y_axis))
    far_inner_y = np.where(rmaxy - y_axis > y_axis - rminy, rmaxy, rminy)
    farthest_y = np.where(lo_y, rmaxy, np.where(hi_y, rminy, far_inner_y))

    out = np.full(np.broadcast(closest_x, closest_y).shape, CONTAINS, dtype=np.int8)
    # geodetic extra farthest-Y check when the rect crosses the horizontal axis
    spans_y_axis = ~lo_y & ~hi_y
    geo_extra = (cy != y_axis) & spans_y_axis
    other_y = np.where(farthest_y == rmaxy, rminy, rmaxy)
    out = np.where(geo_extra & ~contains(farthest_x, other_y), INTERSECTS, out)
    out = np.where(~contains(farthest_x, farthest_y), INTERSECTS, out)
    out = np.where(bbox_sect != CONTAINS, INTERSECTS, out)
    # disjoint test only applies when rect doesn't straddle either axis
    off_axes = (~(~lo_x & ~hi_x)) & (~spans_y_axis)
    out = np.where(off_axes & ~contains(closest_x, closest_y), DISJOINT, out)
    return out


def _geo_wraps_pole(cx, cy, r, rminx, rmaxx, rminy, rmaxy, bminx, bmaxx, calculator):
    """GeoCircle.RelateRectangleCircleWrapsPole (GeoCircle.cs:169-230)."""
    def contains(px, py):
        return circle_contains_xy(cx, cy, r, px, py, True, calculator)

    n = np.broadcast(cx, rminx).shape
    out = np.full(n, np.int8(-1), dtype=np.int8)

    # whole-globe circle
    out = np.where(r == 180.0, CONTAINS, out)

    y_top = cy + r
    y_bot = cy - r
    top_wrap = y_top > 90.0
    bot_wrap = ~top_wrap & (y_bot < -90.0)
    in_top_cap = top_wrap & (rminy >= 90.0 - (y_top - 90.0))
    in_bot_cap = bot_wrap & (rmaxy <= -90.0 + (-90.0 - y_bot))
    out = np.where((out == -1) & (in_top_cap | in_bot_cap), CONTAINS, out)

    undecided = out == -1
    out = np.where(undecided & (rect_width(rminx, rmaxx) == 360.0), INTERSECTS, out)

    undecided = out == -1
    corners = _num_corners_intersect(contains, rminx, rmaxx, rminy, rmaxy)
    front_x = cx
    back_x = np.where(front_x <= 0, front_x + 180.0, front_x - 180.0)
    back_hits = relate_x_range(rminx, rmaxx, back_x, back_x, geo=True) != DISJOINT
    front_hits = relate_x_range(rminx, rmaxx, front_x, front_x, geo=True) != DISJOINT
    all4 = undecided & (corners == 4)
    none0 = undecided & (corners == 0)
    partial = undecided & (corners == 1)
    out = np.where(all4, np.where(back_hits, INTERSECTS, CONTAINS), out)
    out = np.where(none0, np.where(front_hits, INTERSECTS, DISJOINT), out)
    out = np.where(partial, INTERSECTS, out)
    return out


def _num_corners_intersect(contains, rminx, rmaxx, rminy, rmaxy):
    """0 none / 1 partial / 4 all corners inside. GeoCircle.cs:235-271."""
    c1 = contains(rminx, rminy)
    c2 = contains(rminx, rmaxy)
    c3 = contains(rmaxx, rminy)
    c4 = contains(rmaxx, rmaxy)
    total = (c1.astype(np.int8) + c2.astype(np.int8) + c3.astype(np.int8) + c4.astype(np.int8))
    return np.where(total == 4, 4, np.where(total == 0, 0, 1)).astype(np.int8)


def _geo_phase2_dateline(cx, cy, r, horiz_y, rminx, rmaxx, rminy, rmaxy,
                         bminx, bmaxx, calculator):
    """GeoCircle.RelateRectanglePhase2 dateline corner logic (GeoCircle.cs:126-167)."""
    def contains(px, py):
        return circle_contains_xy(cx, cy, r, px, py, True, calculator)

    n = np.broadcast(cx, rminx).shape
    out = np.full(n, np.int8(-1), dtype=np.int8)

    # solid longitude band has no corners to test
    out = np.where(rect_width(rminx, rmaxx) == 360.0, INTERSECTS, out)

    undecided = out == -1
    corners = _num_corners_intersect(contains, rminx, rmaxx, rminy, rmaxy)
    x_int = relate_x_range(rminx, rmaxx, bminx, bmaxx, geo=True)
    all4 = undecided & (corners == 4)
    out = np.where(all4, np.where(x_int == WITHIN, CONTAINS, INTERSECTS), out)
    out = np.where(undecided & (corners == 1), INTERSECTS, out)

    undecided = out == -1
    # circle's horizontal axis crosses the rect
    x_axis_hit = ((relate_y_range(rminy, rmaxy, horiz_y, horiz_y) != DISJOINT)
                  & (x_int != DISJOINT))
    out = np.where(undecided & x_axis_hit, INTERSECTS, out)
    undecided = out == -1
    # circle's vertical axis crosses the rect
    y_axis_hit = ((relate_x_range(rminx, rmaxx, cx, cx, geo=True) != DISJOINT)
                  & (relate_y_range(rminy, rmaxy, cy - r, cy + r) != DISJOINT))
    out = np.where(undecided & y_axis_hit, INTERSECTS, out)
    return np.where(out == -1, DISJOINT, out)


def relate_circle_rect(cx, cy, r, rminx, rmaxx, rminy, rmaxy,
                       geo: bool = True, calculator: str = "haversine",
                       _allow_inverse: bool = True):
    """Circle.Relate(rect) -> relation code, full batch.

    Phase 1: relate of the circle's (cached, dateline-aware) bbox —
    CircleImpl.cs:127-141 incl. the bbox==rect identity edge case.
    Phase 2 dispatch per GeoCircle.RelateRectanglePhase2 (:107-167).
    """
    cx, cy, r = (np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in (cx, cy, r))
    rminx, rmaxx, rminy, rmaxy = (
        np.atleast_1d(np.asarray(a, dtype=np.float64)) for a in (rminx, rmaxx, rminy, rmaxy))
    cx, cy, r, rminx, rmaxx, rminy, rmaxy = np.broadcast_arrays(
        cx, cy, r, rminx, rmaxx, rminy, rmaxy)
    n = cx.shape[0]

    if geo:
        bminx, bmaxx, bminy, bmaxy = geo_circle_bbox(cx, cy, r)
    else:
        bminx, bmaxx = cx - r, cx + r
        bminy, bmaxy = cy - r, cy + r

    bbox_sect = relate_rect_rect(bminx, bmaxx, bminy, bmaxy,
                                 rminx, rmaxx, rminy, rmaxy, geo=geo)
    out = np.full(n, np.int8(-1), dtype=np.int8)
    out = np.where((bbox_sect == DISJOINT) | (bbox_sect == WITHIN), bbox_sect, out)
    identity = ((bbox_sect == CONTAINS) & (bminx == rminx) & (bmaxx == rmaxx)
                & (bminy == rminy) & (bmaxy == rmaxy))
    out = np.where(identity, WITHIN, out)

    todo = out == -1
    if not todo.any():
        return out

    if not geo:
        idx = np.nonzero(todo)[0]
        out[idx] = _phase2_corner_logic(
            cx[idx], cy[idx], r[idx], cy[idx], rminx[idx], rmaxx[idx],
            rminy[idx], rmaxy[idx], bbox_sect[idx], False, calculator)
        return out

    # --- GeoCircle phase 2 dispatch ---
    # horizontal-axis latitude, clamped into the bbox (GeoCircle.cs:80-93)
    horiz_y = np.clip(lat_horiz_axis_deg(cy, r), bminy, bmaxy)

    # (a) r > 90 (and not whole globe): relate the shrunken inverse circle
    inv = todo & (r > 90.0) & (r < 180.0) & _allow_inverse
    if inv.any():
        idx = np.nonzero(inv)[0]
        back_r0 = 180.0 - r[idx]
        back_x = norm_lon_deg(cx[idx] + 180.0)
        back_y = norm_lat_deg(cy[idx] + 180.0)
        shrink = np.maximum(_ulp(np.abs(back_y) + back_r0), _ulp(np.abs(back_x) + back_r0))
        back_r = back_r0 - shrink
        sub = relate_circle_rect(back_x, back_y, back_r,
                                 rminx[idx], rmaxx[idx], rminy[idx], rmaxy[idx],
                                 geo=True, calculator=calculator, _allow_inverse=False)
        out[idx] = _INVERSE[sub]
        todo = todo & ~inv

    # (b) circle wraps a pole (bbox spans all longitudes), incl. r == 180
    box_w = rect_width(bminx, bmaxx)
    pole = todo & (box_w == 360.0)
    if pole.any():
        idx = np.nonzero(pole)[0]
        out[idx] = _geo_wraps_pole(cx[idx], cy[idx], r[idx],
                                   rminx[idx], rmaxx[idx], rminy[idx], rmaxy[idx],
                                   bminx[idx], bmaxx[idx], calculator)
        todo = todo & ~pole

    # (c) fast path: no dateline involvement on either side
    box_cross = bminx > bmaxx
    rect_cross = rminx > rmaxx
    plain = todo & ~box_cross & ~rect_cross
    if plain.any():
        idx = np.nonzero(plain)[0]
        out[idx] = _phase2_corner_logic(
            cx[idx], cy[idx], r[idx], horiz_y[idx], rminx[idx], rmaxx[idx],
            rminy[idx], rmaxy[idx], bbox_sect[idx], True, calculator)
        todo = todo & ~plain

    # (d) dateline-crossing corner logic
    if todo.any():
        idx = np.nonzero(todo)[0]
        out[idx] = _geo_phase2_dateline(
            cx[idx], cy[idx], r[idx], horiz_y[idx], rminx[idx], rmaxx[idx],
            rminy[idx], rmaxy[idx], bminx[idx], bmaxx[idx], calculator)
    return out
