"""Douglas-Peucker polyline/polygon simplification, vectorized.

Engine-added scale operator (no reference analog — Spatial4n has no
simplifier): corpus-scale polygons (the Russia fixture's coastline,
OSM admin boundaries with 1e5+ vertices) make the exact refine kernels
the cost center of the two-layer join; simplifying the build side to a
tolerance below the cell size keeps the candidate semantics while
cutting refine vertices by orders of magnitude. Tolerance is in
degrees, planar on lon/lat (same coordinate plane every relate kernel
uses).

Algorithm: classic Douglas-Peucker with an explicit stack (no Python
recursion limits) and the point-to-segment distance computed for ALL
points of a span in one NumPy pass per split — O(n) vector work per
stack pop, O(n log n) expected total per ring.

Guarantees (property-tested in tests/test_simplify.py):
- output vertices are a subsequence of the input (first/last kept);
- every dropped vertex lies within `tolerance` of the simplified
  chain (the DP invariant);
- rings keep their closure convention (first==last preserved) and
  never drop below a triangle; degenerate rings pass through;
- idempotent: simplify(simplify(p)) == simplify(p).
"""
from __future__ import annotations

import numpy as np


def _dp_mask(xs: np.ndarray, ys: np.ndarray, tol: float) -> np.ndarray:
    """Keep-mask of one open polyline under Douglas-Peucker."""
    n = len(xs)
    keep = np.zeros(n, dtype=bool)
    keep[0] = keep[n - 1] = True
    if n <= 2:
        return keep
    tol2 = tol * tol
    stack = [(0, n - 1)]
    while stack:
        a, b = stack.pop()
        if b - a < 2:
            continue
        ax, ay, bx, by = xs[a], ys[a], xs[b], ys[b]
        sx, sy = xs[a + 1:b], ys[a + 1:b]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (sx - ax) ** 2 + (sy - ay) ** 2
        else:
            # squared perpendicular distance to the SEGMENT (clamped
            # projection), all interior points in one pass
            t = ((sx - ax) * dx + (sy - ay) * dy) / seg2
            t = np.clip(t, 0.0, 1.0)
            d2 = (sx - (ax + t * dx)) ** 2 + (sy - (ay + t * dy)) ** 2
        i = int(np.argmax(d2))
        if d2[i] > tol2:
            m = a + 1 + i
            keep[m] = True
            stack.append((a, m))
            stack.append((m, b))
    return keep


def simplify_ring(xs, ys, tolerance: float) -> tuple[np.ndarray, np.ndarray]:
    """Simplify one ring (closed: first==last) or open polyline.

    Closed rings are split at vertex 0 (kept as the anchor); if the
    result would degenerate below a triangle the ring is returned
    unsimplified (small rings are already cheap).
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    n = len(xs)
    if n <= 4 or tolerance <= 0.0:
        return xs, ys
    closed = xs[0] == xs[-1] and ys[0] == ys[-1]
    if closed:
        # anchor both ends at vertex 0; also force-keep the farthest
        # vertex from the anchor so the split segment is never the
        # whole (zero-length) chord
        far = 1 + int(np.argmax((xs[1:-1] - xs[0]) ** 2
                                + (ys[1:-1] - ys[0]) ** 2))
        keep = _dp_mask(xs[:far + 1], ys[:far + 1], tolerance)
        keep2 = _dp_mask(xs[far:], ys[far:], tolerance)
        mask = np.zeros(n, dtype=bool)
        mask[:far + 1] = keep
        mask[far:] |= keep2
        if mask.sum() < 4:  # triangle + closure minimum
            return xs, ys
        return xs[mask], ys[mask]
    mask = _dp_mask(xs, ys, tolerance)
    return xs[mask], ys[mask]


def simplify_polygon(xs, ys, ring_offsets, tolerance: float):
    """Simplify every ring of a (multi)polygon independently.

    Returns (xs, ys, ring_offsets) with the same ring count and part
    structure — holes stay holes; only vertex counts shrink.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    offs = np.asarray(ring_offsets, dtype=np.int64)
    out_x, out_y, out_off = [], [], [0]
    for k in range(len(offs) - 1):
        rx, ry = simplify_ring(xs[offs[k]:offs[k + 1]],
                               ys[offs[k]:offs[k + 1]], tolerance)
        out_x.append(rx)
        out_y.append(ry)
        out_off.append(out_off[-1] + len(rx))
    return (np.concatenate(out_x) if out_x else xs,
            np.concatenate(out_y) if out_y else ys,
            np.asarray(out_off, dtype=np.int64))


def max_deviation(xs, ys, sx, sy) -> float:
    """Max distance from original vertices to the simplified chain —
    the DP guarantee checker (test oracle, not a hot path)."""
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    sx = np.asarray(sx, dtype=np.float64)
    sy = np.asarray(sy, dtype=np.float64)
    if len(sx) < 2:
        return 0.0
    best = np.full(len(xs), np.inf)
    for i in range(len(sx) - 1):
        ax, ay, bx, by = sx[i], sy[i], sx[i + 1], sy[i + 1]
        dx, dy = bx - ax, by - ay
        seg2 = dx * dx + dy * dy
        if seg2 == 0.0:
            d2 = (xs - ax) ** 2 + (ys - ay) ** 2
        else:
            t = np.clip(((xs - ax) * dx + (ys - ay) * dy) / seg2, 0.0, 1.0)
            d2 = (xs - (ax + t * dx)) ** 2 + (ys - (ay + t * dy)) ** 2
        best = np.minimum(best, d2)
    return float(np.sqrt(best.max()))
