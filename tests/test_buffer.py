"""GetBuffered kernel tests — TestShapesGeo.cs:115-129 fixtures plus
explicit branch coverage (pole wrap, world wrap, cartesian clamp)."""
import numpy as np

from spatial4n_spark.kernels.buffer import buffer_rect


def _buf1(minx, maxx, miny, maxy, d, geo=True):
    r = buffer_rect(np.array([minx]), np.array([maxx]),
                    np.array([miny]), np.array([maxy]),
                    np.array([d]), geo=geo)
    return tuple(float(v[0]) for v in r)


def _width(minx, maxx):
    w = maxx - minx
    return w + 360.0 if w < 0 else w


def test_point_rect_buffer_fixture():
    # TestShapesGeo.cs:115: rect(0,0,0,0).GetBuffered(10) == rect(-10,10,-10,10)
    assert _buf1(0, 0, 0, 0, 10) == (-10.0, 10.0, -10.0, 10.0)


def test_buffered_contains_original_and_width_rule():
    # TestShapesGeo.cs:116-127 randomized invariants
    rng = np.random.default_rng(5)
    n = 300
    cx = rng.uniform(-180, 180, n)
    w = rng.uniform(0, 360, n)
    minx = cx - w / 2
    maxx = cx + w / 2
    minx = np.where(minx < -180, minx + 360, minx)
    maxx = np.where(maxx > 180, maxx - 360, maxx)
    y1, y2 = rng.uniform(-90, 90, n), rng.uniform(-90, 90, n)
    miny, maxy = np.minimum(y1, y2), np.maximum(y1, y2)
    d = rng.integers(0, 91, n).astype(np.float64)
    bminx, bmaxx, bminy, bmaxy = buffer_rect(minx, maxx, miny, maxy, d)
    ow = np.where(maxx - minx < 0, maxx - minx + 360, maxx - minx)
    bw = np.where(bmaxx - bminx < 0, bmaxx - bminx + 360, bmaxx - bminx)
    wrap = ow + 2 * d >= 360
    assert np.allclose(bw[wrap], 360.0)
    # buffered rect contains the original (lat always; lon unless wrapped)
    assert (bminy <= miny + 1e-9).all() and (bmaxy >= maxy - 1e-9).all()
    grow = ~wrap & (np.abs(maxy) < 89) & (np.abs(miny) < 89) & \
        (maxy + d < 90) & (miny - d > -90)
    assert (bw[grow] - ow[grow] >= 2 * d[grow] - 1e-9).all()


def test_high_lat_lon_skew_expansion():
    # TestShapesGeo.cs:128: rect(0,10,0,89).GetBuffered(0.5) width > 11
    bminx, bmaxx, _, _ = _buf1(0, 10, 0, 89, 0.5)
    assert _width(bminx, bmaxx) > 11.0


def test_pole_touch_north_world_wraps():
    r = _buf1(10, 20, 60, 85, 10)
    assert r == (-180.0, 180.0, 50.0, 90.0)


def test_pole_touch_south_world_wraps():
    r = _buf1(10, 20, -85, -60, 10)
    assert r == (-180.0, 180.0, -90.0, -50.0)


def test_world_wrap_by_lon_skew():
    # wide rect at high lat: 2*deltaLon + width >= 360 -> lon world wrap
    bminx, bmaxx, bminy, bmaxy = _buf1(-170, 170, 80, 85, 4)
    assert (bminx, bmaxx) == (-180.0, 180.0)
    assert bminy == 76.0 and bmaxy == 89.0


def test_dateline_crossing_rect_buffer():
    bminx, bmaxx, bminy, bmaxy = _buf1(175, -175, -10, 10, 2)
    assert bminy == -12.0 and bmaxy == 12.0
    assert bminx < 175.0 and bminx > 170.0     # expanded westward
    assert bmaxx > -175.0 and bmaxx < -170.0   # expanded eastward
    assert _width(bminx, bmaxx) > 14.0


def test_cartesian_clamps_to_world_bounds():
    assert _buf1(-179, 179, -89, 89, 5, geo=False) == \
        (-180.0, 180.0, -90.0, 90.0)
    assert _buf1(0, 1, 0, 1, 2, geo=False) == (-2.0, 3.0, -2.0, 3.0)
