"""Rect relate kernels: deterministic grid sweeps from the reference.

Source: Spatial4n.Tests/shape/AbstractTestShapes.cs:98-148
(TestRectIntersect grid), RectangleImpl relate semantics.
"""
import numpy as np
import pytest

from spatial4n_spark.kernels import relation as R
from spatial4n_spark.kernels.relate_rect import (
    rect_width, relate_rect_point, relate_rect_rect)


INCR = 45
Y = 20


def _rect(left, right):
    """Geo rect from left/right lon (may wrap) at fixed +-Y."""
    if right - left >= 360:
        return (-180.0, 180.0, -Y, Y)
    minx = float(((left + 180) % 360) - 180)
    maxx = float(((right + 180) % 360) - 180)
    # normalize +180 edge like MakeRectangle does
    if minx == 180 and minx != maxx:
        minx = -180.0
    if maxx == -180 and minx != maxx:
        maxx = 180.0
    return (minx, maxx, -Y, Y)


def test_rect_intersect_grid():
    """AbstractTestShapes.TestRectIntersect (:98-148): for every left and
    width in 45-degree steps (incl. dateline crossers), containment of
    sub-rects, disjointness of shifted rects, straddling intersections."""
    for left in range(-180, 180 + 1, INCR):
        for right in range(left, left + 360 + 1, INCR):
            r = _rect(left, right)
            width = right - left
            # vs itself: CONTAINS or WITHIN (equal shapes)
            rel_self = int(relate_rect_rect(*r, *r, geo=True))
            assert rel_self in (R.CONTAINS, R.WITHIN)
            assert float(rect_width(r[0], r[1])) == pytest.approx(min(width, 360) % 360
                                                                  if width != 360 else 360)

            if width != 0 and width != 360:
                # contained sub-rect (shrunk on both sides)
                sub = _rect(left + INCR // 3, right - INCR // 3)
                sub = (sub[0], sub[1], -Y + 5, Y - 5)
                assert int(relate_rect_rect(*r, *sub, geo=True)) == R.CONTAINS
                assert int(relate_rect_rect(*sub, *r, geo=True)) == R.WITHIN
            if width < 300:
                # disjoint: shifted fully past the right edge
                dis = _rect(right + INCR // 2, right + INCR - INCR // 4)
                assert int(relate_rect_rect(*r, *dis, geo=True)) == R.DISJOINT, (r, dis)
                # straddling the right edge
                if width > 0:
                    strad = _rect(right - INCR // 4, right + INCR // 2)
                    assert int(relate_rect_rect(*r, *strad, geo=True)) == R.INTERSECTS


def test_rect_point_dateline():
    # rect crossing the dateline: (170 -> -170)
    r = (170.0, -170.0, -10.0, 10.0)
    assert int(relate_rect_point(*r, 175.0, 0.0)) == R.CONTAINS
    assert int(relate_rect_point(*r, -175.0, 0.0)) == R.CONTAINS
    assert int(relate_rect_point(*r, 180.0, 0.0)) == R.CONTAINS
    assert int(relate_rect_point(*r, -180.0, 0.0)) == R.CONTAINS
    assert int(relate_rect_point(*r, 0.0, 0.0)) == R.DISJOINT
    assert int(relate_rect_point(*r, 175.0, 20.0)) == R.DISJOINT


def test_rect_point_plain():
    r = (10.0, 30.0, 25.0, 45.0)
    assert int(relate_rect_point(*r, 20.0, 30.0)) == R.CONTAINS
    assert int(relate_rect_point(*r, 10.0, 25.0)) == R.CONTAINS  # boundary counts
    assert int(relate_rect_point(*r, 9.999, 30.0)) == R.DISJOINT
    # cartesian mode: no wraparound
    assert int(relate_rect_point(*r, 20.0, 30.0, geo=False)) == R.CONTAINS
    assert int(relate_rect_point(170.0, -170.0, -10.0, 10.0, 175.0, 0.0, geo=False)) == R.DISJOINT


def test_world_wrap_rects():
    world = (-180.0, 180.0, -90.0, 90.0)
    small = (10.0, 20.0, 10.0, 20.0)
    assert int(relate_rect_rect(*world, *small, geo=True)) == R.CONTAINS
    assert int(relate_rect_rect(*small, *world, geo=True)) == R.WITHIN
    assert int(relate_rect_rect(*world, *world, geo=True)) == R.CONTAINS


def test_transpose_invariant_random():
    """relate(a,b) == transpose(relate(b,a)) (RandomizedShapeTest.cs:199-243)."""
    rng = np.random.RandomState(7)
    n = 3000
    def rand_rect(k):
        minx = rng.uniform(-180, 180, k)
        w = rng.choice([0, 5, 30, 90, 180, 270], k)
        maxx = ((minx + w + 180) % 360) - 180
        y1 = rng.uniform(-90, 90, k)
        y2 = rng.uniform(-90, 90, k)
        return minx, maxx, np.minimum(y1, y2), np.maximum(y1, y2)
    a = rand_rect(n)
    b = rand_rect(n)
    ab = relate_rect_rect(*a, *b, geo=True)
    ba = relate_rect_rect(*b, *a, geo=True)
    np.testing.assert_array_equal(ab, R.transpose(ba))


def test_relation_algebra():
    assert int(R.transpose(R.CONTAINS)) == R.WITHIN
    assert int(R.transpose(R.WITHIN)) == R.CONTAINS
    assert int(R.transpose(R.DISJOINT)) == R.DISJOINT
    assert int(R.combine(R.DISJOINT, R.CONTAINS)) == R.CONTAINS
    assert int(R.combine(R.WITHIN, R.WITHIN)) == R.WITHIN
    assert int(R.combine(R.DISJOINT, R.WITHIN)) == R.INTERSECTS
    assert int(R.combine(R.CONTAINS, R.WITHIN)) == R.INTERSECTS
    assert int(R.inverse(R.DISJOINT)) == R.CONTAINS
    assert int(R.inverse(R.CONTAINS)) == R.DISJOINT
    assert int(R.inverse(R.WITHIN)) == R.INTERSECTS
    assert int(R.inverse(R.INTERSECTS)) == R.INTERSECTS
