"""Randomized relate testing with point-sampling verdict verification —
the port of RectIntersectionTestHelper.TestRelateWithRectangle
(Spatial4n.Tests/shape/RectIntersectionTestHelper.cs:46-170) and the
transpose invariant (RandomizedShapeTest.cs:199-243).

Pairs are generated (fixed seed) until every verdict class occurred
>= MIN_PER_CLASS times; each verdict is then cross-checked by random
point sampling:
  CONTAINS  (s contains r)  => every sampled point of r is inside s
  WITHIN    (s within r)    => every sampled point of s is inside r
  DISJOINT                  => no sampled point of r is inside s
  INTERSECTS                => an inside AND an outside point of r exist
Random point in a circle follows the reference's recipe: destination
point at (rand*radius, rand*360deg) via PointOnBearing
(RandomizedShapeTest.cs:326-333).
"""
import numpy as np
import pytest

from spatial4n_spark.kernels.bearing import geo_point_on_bearing_deg
from spatial4n_spark.kernels.relate_circle import (circle_contains_xy,
                                                   relate_circle_rect)
from spatial4n_spark.kernels.relate_rect import (relate_rect_point,
                                                 relate_rect_rect)
from spatial4n_spark.kernels.relation import (CONTAINS, DISJOINT, INTERSECTS,
                                              WITHIN, transpose)

MIN_PER_CLASS = 20
N_SAMPLE = 30
RNG = np.random.default_rng(42)


def _rand_rects(rng, n):
    """Random geo rects, dateline-crossing allowed (width <= 180)."""
    cx = rng.uniform(-180, 180, n)
    w = rng.uniform(0.1, 180, n)
    minx = cx - w / 2
    maxx = cx + w / 2
    minx = np.where(minx < -180, minx + 360, minx)
    maxx = np.where(maxx > 180, maxx - 360, maxx)
    y1 = rng.uniform(-90, 90, n)
    y2 = rng.uniform(-90, 90, n)
    return minx, maxx, np.minimum(y1, y2), np.maximum(y1, y2)


def _points_in_rect(rng, minx, maxx, miny, maxy, k):
    w = maxx - minx
    if w < 0:
        w += 360.0
    lon = minx + rng.uniform(0, 1, k) * w
    lon = np.where(lon > 180, lon - 360, lon)
    lat = rng.uniform(miny, maxy, k)
    return lon, lat


def _points_in_circle(rng, cx, cy, r, k):
    dist = rng.uniform(0, 1, k) * r
    brg = rng.uniform(0, 360, k)
    return geo_point_on_bearing_deg(np.full(k, cx), np.full(k, cy),
                                    dist, brg)


def _rect_contains(minx, maxx, miny, maxy, px, py):
    return relate_rect_point(np.full_like(px, minx), np.full_like(px, maxx),
                             np.full_like(px, miny), np.full_like(px, maxy),
                             px, py, geo=True) == CONTAINS


def _rect_intersection(a, b):
    """Intersection bbox of two (possibly dateline-crossing) rects in
    A's unwrapped frame, or None when the overlap has ~zero area
    (boundary touch). Used to guarantee an inside sample for
    INTERSECTS verdicts — random sampling misses sliver overlaps."""
    aminx, amaxx, aminy, amaxy = a
    bminx, bmaxx, bminy, bmaxy = b
    amaxx_u = amaxx + 360 if amaxx < aminx else amaxx
    bmaxx_u = bmaxx + 360 if bmaxx < bminx else bmaxx
    ix0 = iy0 = ix1 = iy1 = None
    for shift in (-360.0, 0.0, 360.0):
        lo = max(aminx, bminx + shift)
        hi = min(amaxx_u, bmaxx_u + shift)
        if hi - lo > 1e-9:
            ix0, ix1 = lo, hi
            break
    iy0 = max(aminy, bminy)
    iy1 = min(amaxy, bmaxy)
    if ix0 is None or iy1 - iy0 <= 1e-9:
        return None
    return ix0, ix1, iy0, iy1


def test_circle_rect_randomized_with_point_sampling():
    counts = {CONTAINS: 0, WITHIN: 0, DISJOINT: 0, INTERSECTS: 0}
    inconclusive = 0
    rounds = 0
    while min(counts.values()) < MIN_PER_CLASS and rounds < 40:
        rounds += 1
        n = 2000
        minx, maxx, miny, maxy = _rand_rects(RNG, n)
        cx = RNG.uniform(-180, 180, n)
        cy = RNG.uniform(-85, 85, n)
        r = RNG.uniform(0.1, 120, n)
        rel = relate_circle_rect(cx, cy, r, minx, maxx, miny, maxy, geo=True)
        for i in range(n):
            v = int(rel[i])
            if counts.get(v, MIN_PER_CLASS) >= MIN_PER_CLASS + 20:
                continue
            counts[v] = counts.get(v, 0) + 1
            px, py = _points_in_rect(RNG, minx[i], maxx[i], miny[i],
                                     maxy[i], N_SAMPLE)
            in_circle = circle_contains_xy(np.full(N_SAMPLE, cx[i]),
                                           np.full(N_SAMPLE, cy[i]),
                                           np.full(N_SAMPLE, r[i]),
                                           px, py, geo=True)
            if v == CONTAINS:
                assert in_circle.all(), (i, cx[i], cy[i], r[i],
                                         minx[i], maxx[i], miny[i], maxy[i])
            elif v == DISJOINT:
                assert not in_circle.any(), (i, cx[i], cy[i], r[i],
                                             minx[i], maxx[i], miny[i], maxy[i])
            elif v == WITHIN:
                qx, qy = _points_in_circle(RNG, cx[i], cy[i], r[i], N_SAMPLE)
                ok = _rect_contains(minx[i], maxx[i], miny[i], maxy[i], qx, qy)
                assert ok.all(), (i, cx[i], cy[i], r[i],
                                  minx[i], maxx[i], miny[i], maxy[i])
            elif v == INTERSECTS:
                # must find both an inside and an outside point of r;
                # sliver overlaps can defeat random sampling, so an
                # unresolved pair is marked inconclusive (bounded below)
                found_in = in_circle.any()
                found_out = (~in_circle).any()
                for _ in range(20):
                    if found_in and found_out:
                        break
                    px, py = _points_in_rect(RNG, minx[i], maxx[i], miny[i],
                                             maxy[i], N_SAMPLE)
                    inc = circle_contains_xy(np.full(N_SAMPLE, cx[i]),
                                             np.full(N_SAMPLE, cy[i]),
                                             np.full(N_SAMPLE, r[i]),
                                             px, py, geo=True)
                    found_in |= inc.any()
                    found_out |= (~inc).any()
                if not (found_in and found_out):
                    counts[v] -= 1
                    inconclusive += 1
    assert min(counts.values()) >= MIN_PER_CLASS, counts
    # sliver-overlap skips must stay rare or the check proves nothing
    assert inconclusive <= MIN_PER_CLASS, inconclusive


def test_rect_rect_randomized_with_point_sampling():
    counts = {CONTAINS: 0, WITHIN: 0, DISJOINT: 0, INTERSECTS: 0}
    rounds = 0
    while min(counts.values()) < MIN_PER_CLASS and rounds < 40:
        rounds += 1
        n = 2000
        aminx, amaxx, aminy, amaxy = _rand_rects(RNG, n)
        bminx, bmaxx, bminy, bmaxy = _rand_rects(RNG, n)
        rel = relate_rect_rect(aminx, amaxx, aminy, amaxy,
                               bminx, bmaxx, bminy, bmaxy, geo=True)
        # transpose invariant on the whole batch
        rel_t = relate_rect_rect(bminx, bmaxx, bminy, bmaxy,
                                 aminx, amaxx, aminy, amaxy, geo=True)
        assert (transpose(rel) == rel_t).all()
        for i in range(n):
            v = int(rel[i])
            if counts.get(v, MIN_PER_CLASS) >= MIN_PER_CLASS + 20:
                continue
            counts[v] = counts.get(v, 0) + 1
            px, py = _points_in_rect(RNG, bminx[i], bmaxx[i], bminy[i],
                                     bmaxy[i], N_SAMPLE)
            in_a = _rect_contains(aminx[i], amaxx[i], aminy[i], amaxy[i],
                                  px, py)
            if v == CONTAINS:
                assert in_a.all(), i
            elif v == DISJOINT:
                assert not in_a.any(), i
            elif v == WITHIN:
                qx, qy = _points_in_rect(RNG, aminx[i], amaxx[i], aminy[i],
                                         amaxy[i], N_SAMPLE)
                in_b = _rect_contains(bminx[i], bmaxx[i], bminy[i], bmaxy[i],
                                      qx, qy)
                assert in_b.all(), i
            elif v == INTERSECTS:
                # inside point: sample the intersection bbox directly
                # (guaranteed hit; random B-sampling misses slivers)
                inter = _rect_intersection(
                    (aminx[i], amaxx[i], aminy[i], amaxy[i]),
                    (bminx[i], bmaxx[i], bminy[i], bmaxy[i]))
                if inter is not None:
                    lon = RNG.uniform(inter[0], inter[1], N_SAMPLE)
                    lon = np.where(lon > 180, lon - 360, lon)
                    lat = RNG.uniform(inter[2], inter[3], N_SAMPLE)
                    assert _rect_contains(aminx[i], amaxx[i], aminy[i],
                                          amaxy[i], lon, lat).any(), i
                # outside point: some of B outside A (skip near-contain
                # slivers random sampling can't hit)
                found_out = (~in_a).any()
                for _ in range(20):
                    if found_out:
                        break
                    px, py = _points_in_rect(RNG, bminx[i], bmaxx[i],
                                             bminy[i], bmaxy[i], N_SAMPLE)
                    found_out |= (~_rect_contains(aminx[i], amaxx[i],
                                                  aminy[i], amaxy[i],
                                                  px, py)).any()
                if not found_out:
                    counts[v] -= 1  # near-containment sliver: retry class
    assert min(counts.values()) >= MIN_PER_CLASS, counts
