"""Randomized property harness for polygon validation/repair (round 3).

Mirrors the reference's randomized-testing strategy (SURVEY §5.3) for
the NtsWktShapeParser validation rules: random polygons — some simple,
some scrambled into self-intersection — must be classified exactly like
a brute-force O(E^2) segment checker, and the repairs must satisfy the
reference-documented postconditions (TestPolygonRepair):
buffer0 lobes are simple and area-positive; convexHull CONTAINS
buffer0; `none` never rejects a closed ring.
"""
import numpy as np
import pytest

from spatial4n_spark.kernels import wkt

RNG = np.random.default_rng(193)


def _rand_simple_ring(n):
    """Star-shaped (hence simple) ring around a random center.

    Angles are evenly spaced with bounded jitter so every angular gap
    stays < pi — that keeps the center interior, which is what makes a
    radial-sweep polygon provably simple (a free-sorted uniform draw
    can cluster into a wedge and self-cross at the closing edge)."""
    cx, cy = RNG.uniform(-50, 50), RNG.uniform(-30, 30)
    step = 2 * np.pi / n
    angles = (np.arange(n) * step
              + RNG.uniform(-0.4, 0.4, n) * step)
    radii = RNG.uniform(2.0, 12.0, n)
    pts = [(cx + r * np.cos(a), cy + r * np.sin(a))
           for a, r in zip(angles, radii)]
    return pts + [pts[0]]


def _scrambled_ring(n):
    """Shuffle a simple ring's vertex order — almost surely
    self-intersecting for n >= 4 (retry until the brute checker says
    non-simple)."""
    for _ in range(50):
        ring = _rand_simple_ring(n)
        inner = ring[:-1]
        RNG.shuffle(inner)
        cand = inner + [inner[0]]
        if _brute_self_intersects(cand):
            return cand
    raise AssertionError("could not scramble a non-simple ring")


def _brute_self_intersects(ring) -> bool:
    """Independent O(E^2) float checker (shapely-style semantics):
    any contact between non-adjacent segments = non-simple."""
    pts = ring[:-1]
    n = len(pts)

    def seg_intersect(p1, p2, p3, p4):
        d = lambda a, b, c: (b[0] - a[0]) * (c[1] - a[1]) - \
            (b[1] - a[1]) * (c[0] - a[0])
        d1, d2 = d(p3, p4, p1), d(p3, p4, p2)
        d3, d4 = d(p1, p2, p3), d(p1, p2, p4)
        if ((d1 > 0) != (d2 > 0)) and ((d3 > 0) != (d4 > 0)):
            return True

        def on(a, b, c):
            return (d(a, b, c) == 0
                    and min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
                    and min(a[1], b[1]) <= c[1] <= max(a[1], b[1]))
        return on(p3, p4, p1) or on(p3, p4, p2) or on(p1, p2, p3) \
            or on(p1, p2, p4)

    for i in range(n):
        for j in range(i + 1, n):
            if j == i + 1 or (i == 0 and j == n - 1):
                continue
            if seg_intersect(pts[i], pts[(i + 1) % n],
                             pts[j], pts[(j + 1) % n]):
                return True
    return False


def _wkt_of(ring):
    return "POLYGON((" + ", ".join(f"{x!r} {y!r}" for x, y in ring) + "))"


def _area2(rec):
    total = 0.0
    ro = rec["ring_offsets"]
    for a, b in zip(ro[:-1], ro[1:]):
        total += abs(wkt._signed_area2(
            list(zip(rec["xs"][a:b], rec["ys"][a:b]))))
    return total


def test_randomized_simple_rings_accepted():
    for _ in range(40):
        ring = _rand_simple_ring(int(RNG.integers(4, 12)))
        assert not _brute_self_intersects(ring)
        rec = wkt.parse_shape(_wkt_of(ring))  # default = error rule
        assert rec["kind"] in (wkt.KIND_POLYGON, wkt.KIND_RECT)


def test_randomized_validation_matches_brute_checker():
    agree = 0
    for _ in range(60):
        n = int(RNG.integers(4, 10))
        ring = _rand_simple_ring(n) if RNG.random() < 0.5 \
            else _scrambled_ring(n)
        brute_bad = _brute_self_intersects(ring)
        try:
            wkt.parse_shape(_wkt_of(ring))
            engine_bad = False
        except wkt.WktParseError:
            engine_bad = True
        assert engine_bad == brute_bad, (ring, brute_bad)
        agree += 1
    assert agree == 60


def test_randomized_repairs_satisfy_postconditions():
    checked = 0
    for _ in range(25):
        ring = _scrambled_ring(int(RNG.integers(5, 9)))
        w = _wkt_of(ring)
        with pytest.raises(wkt.WktParseError):
            wkt.parse_shape(w)
        # `none` accepts
        assert wkt.parse_shape(w, validation_rule="none")["kind"] \
            == wkt.KIND_POLYGON
        buf0 = wkt.parse_shape(w, validation_rule="repairBuffer0")
        hull = wkt.parse_shape(w, validation_rule="repairConvexHull")
        assert _area2(buf0) > 0 and _area2(hull) > 0
        # every buffer0 lobe is simple
        ro = buf0["ring_offsets"]
        for a, b in zip(ro[:-1], ro[1:]):
            lobe = list(zip(buf0["xs"][a:b], buf0["ys"][a:b]))
            assert not _brute_self_intersects(lobe), lobe
        # hull postconditions, exact-arithmetic form (the CONTAINS
        # relate on the fixed bow-tie lives in test_wkt_validation; on
        # random inputs the noded lobe vertices sit exactly ON hull
        # edges and ulp excursions make a relate assert flaky): the
        # hull is convex, and every ORIGINAL vertex is on or inside
        # every hull edge's half-plane.
        hx, hy = hull["xs"], hull["ys"]
        nh = len(hx) - 1  # closed ring
        for e in range(nh):
            ex, ey = hx[e + 1] - hx[e], hy[e + 1] - hy[e]
            crosses = [ex * (y - hy[e]) - ey * (x - hx[e])
                       for x, y in ring]
            assert min(crosses) >= -1e-9 * max(1.0, max(map(abs, crosses)))
        # buffer0 preserves the ring's even-odd interior: probe the
        # original ring's even-odd verdicts at random points
        from spatial4n_spark.kernels.pip import points_in_polygon
        px = RNG.uniform(-70, 70, 200)
        py = RNG.uniform(-50, 50, 200)
        oxs = np.array([p[0] for p in ring])
        oys = np.array([p[1] for p in ring])
        before = points_in_polygon(px, py, oxs, oys,
                                   np.array([0, len(ring)]))
        after = points_in_polygon(px, py, np.asarray(buf0["xs"]),
                                  np.asarray(buf0["ys"]),
                                  np.asarray(buf0["ring_offsets"]))
        assert np.array_equal(before, after)
        checked += 1
    assert checked == 25
