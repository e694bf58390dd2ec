"""Distance-oracle property sweep for polygon GetBuffered
(kernels/buffer.buffer_polygon, the NtsGeometry.cs:175-180 analog):
a sample point belongs to buffer(P, d) iff its distance to P is <= d.
On the exact (convex) path the only slack is the documented inscribed-
arc band — max inward deviation d*(1 - cos(ARC_STEP/2)) — so the sweep
asserts strictly outside that band: dist <= d*(1-band) => inside,
dist > d => outside. Hole erosion is exact half-plane clipping (no
band); holed cases exercise it with a shrunken-copy hole."""
import numpy as np

from spatial4n_spark.kernels.buffer import (ARC_STEP, _convex_hull,
                                            buffer_polygon)
from spatial4n_spark.kernels.pip import points_in_polygon


def _pip(xs, ys, off, px, py):
    return points_in_polygon(px, py, np.asarray(xs), np.asarray(ys),
                             np.asarray(off))


def _dist_to_poly(px, py, xs, ys, off):
    inside = _pip(xs, ys, off, px, py)
    d = np.full(len(px), np.inf)
    for k in range(len(off) - 1):
        rx = np.asarray(xs[off[k]:off[k + 1]])
        ry = np.asarray(ys[off[k]:off[k + 1]])
        ex, ey = np.roll(rx, -1) - rx, np.roll(ry, -1) - ry
        l2 = ex * ex + ey * ey
        l2s = np.where(l2 == 0, 1, l2)
        for i in range(len(px)):
            t = np.clip(((px[i] - rx) * ex + (py[i] - ry) * ey) / l2s, 0, 1)
            dd = (px[i] - (rx + t * ex)) ** 2 + (py[i] - (ry + t * ey)) ** 2
            d[i] = min(d[i], float(dd.min()))
    return np.where(inside, 0.0, np.sqrt(d))


def test_buffer_polygon_distance_oracle():
    rng = np.random.default_rng(3)
    band = 1 - np.cos(ARC_STEP / 2)
    cases = 0
    for trial in range(40):
        pts = rng.uniform(-2, 2, (int(rng.integers(4, 12)), 2))
        hx, hy = _convex_hull(pts[:, 0], pts[:, 1])
        if len(hx) < 3:
            continue
        d = float(rng.uniform(0.1, 1.0))
        off = [0, len(hx)]
        xs, ys = list(hx), list(hy)
        if rng.random() < 0.5:  # convex hole strictly inside
            cx, cy = hx.mean(), hy.mean()
            ihx, ihy = cx + 0.35 * (hx - cx), cy + 0.35 * (hy - cy)
            xs += list(ihx)
            ys += list(ihy)
            off.append(off[-1] + len(ihx))
        oxs, oys, ooff, approx = buffer_polygon(xs, ys, off, d)
        assert not approx  # convex path is the exact one
        cases += 1
        px = rng.uniform(-4, 4, 400)
        py = rng.uniform(-4, 4, 400)
        dist = _dist_to_poly(px, py, xs, ys, off)
        got = _pip(oxs, oys, ooff, px, py)
        must_in = dist <= d * (1 - band) - 1e-9
        must_out = dist > d + 1e-9
        assert not (must_in & ~got).any(), f"trial {trial}: in-point lost"
        assert not (must_out & got).any(), f"trial {trial}: out-point gained"
    assert cases >= 30
