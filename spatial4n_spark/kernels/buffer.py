"""GetBuffered(distance) kernels, vectorized.

Reference semantics:
- Rect (Impl/RectangleImpl.cs:76-114): geo path checks pole touch
  (north first) -> world-wrap lon rect with clamped lat; otherwise
  lat expands by the distance and lon by the delta-lon at the rect's
  closest-to-pole latitude (maxY for any non-degenerate rect — the
  reference picks maxY whenever height > 0), world-wrapping lon when
  2*lonDistance + width >= 360. Cartesian path clamps to world bounds.
- Point (Impl/PointImpl.cs:67-70): buffered point IS a circle of
  radius = distance.
- Circle (Impl/CircleImpl.cs:78-81): radius grows by the distance
  (MakeCircle clamps > 180 upstream, handled by the caller).
"""
from __future__ import annotations

import numpy as np

from .circle_box import delta_lon_deg
from .normalize import norm_lon_deg


def buffer_rect(minx, maxx, miny, maxy, dist, geo: bool = True):
    """Vectorized rect GetBuffered -> (minx, maxx, miny, maxy)."""
    minx = np.asarray(minx, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    dist = np.asarray(dist, dtype=np.float64)
    if not geo:
        return (np.maximum(-180.0, minx - dist), np.minimum(180.0, maxx + dist),
                np.maximum(-90.0, miny - dist), np.minimum(90.0, maxy + dist))
    north = maxy + dist >= 90.0
    south = miny - dist <= -90.0
    closest = np.where(maxy - miny > 0.0, maxy, miny)
    dl = delta_lon_deg(closest, dist)
    width = maxx - minx
    width = np.where(width < 0.0, width + 360.0, width)
    wrap = dl * 2.0 + width >= 360.0
    ominx = np.where(wrap, -180.0, norm_lon_deg(minx - dl))
    omaxx = np.where(wrap, 180.0, norm_lon_deg(maxx + dl))
    pole = north | south
    rminx = np.where(pole, -180.0, ominx)
    rmaxx = np.where(pole, 180.0, omaxx)
    rminy = np.where(north, np.maximum(-90.0, miny - dist),
                     np.where(south, -90.0, miny - dist))
    rmaxy = np.where(north, 90.0,
                     np.where(south, np.minimum(90.0, maxy + dist),
                              maxy + dist))
    return rminx, rmaxx, rminy, rmaxy


# ---------------------------------------------------------------------------
# Polygon GetBuffered (NtsGeometry.cs:175-180 delegates to the JTS/NTS
# planar Buffer op; semantics here are the same PLANAR degree-space
# Minkowski sum, built from scratch).
#
# Exactness contract (documented approximation levels):
# - CONVEX exterior ring: exact Minkowski sum polygon ⊕ disc(d) with
#   round joins; vertex arcs are discretized at <= ARC_STEP radians with
#   the exact edge-normal angles as arc endpoints, so the result is a
#   convex polygon INSCRIBED in the true buffer (max inward deviation =
#   d * (1 - cos(ARC_STEP/2)) ~= 0.48% of d at the default step).
# - CONCAVE exterior ring: buffered convex hull — a documented
#   conservative SUPERSET (round-join offsets of concave rings
#   self-intersect; resolving that union is the full polygon-clipping
#   problem the reference outsources to NTS).
# - Holes (odd even-odd nesting depth): eroded by d via half-plane
#   clipping of the (hull of the) hole; a hole that collapses is
#   dropped — exactly what the true buffer does.
# - Shells whose buffers would overlap (bbox test) degrade to one
#   buffered hull of all shells: even-odd parity would otherwise turn
#   the overlap into a phantom hole where NTS unions.
# ---------------------------------------------------------------------------

ARC_STEP = np.pi / 16.0  # 8 segments per quadrant, JTS default fidelity


# ring primitives shared with the union kernel — single source so a
# robustness fix lands once (code-review r4)
from .union import _ensure_ccw, _signed_area2  # noqa: E402


def _ring_open(xs, ys):
    """Drop a repeated closing vertex."""
    if len(xs) >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        return xs[:-1], ys[:-1]
    return xs, ys


def _is_convex_ccw(xs, ys) -> bool:
    ex = np.roll(xs, -1) - xs
    ey = np.roll(ys, -1) - ys
    cross = ex * np.roll(ey, -1) - ey * np.roll(ex, -1)
    return bool(np.all(cross >= 0.0))


def _convex_hull(xs, ys):
    """Andrew monotone chain -> CCW hull (no repeated last vertex)."""
    pts = sorted(set(zip(xs.tolist(), ys.tolist())))
    if len(pts) <= 2:
        return (np.array([p[0] for p in pts]), np.array([p[1] for p in pts]))

    def half(points):
        out = []
        for p in points:
            while len(out) >= 2 and ((out[-1][0] - out[-2][0])
                                     * (p[1] - out[-2][1])
                                     - (out[-1][1] - out[-2][1])
                                     * (p[0] - out[-2][0])) <= 0:
                out.pop()
            out.append(p)
        return out
    lower = half(pts)
    upper = half(pts[::-1])
    hull = lower[:-1] + upper[:-1]
    return (np.array([p[0] for p in hull], dtype=np.float64),
            np.array([p[1] for p in hull], dtype=np.float64))


def _offset_convex_ring(xs, ys, d, arc_step=ARC_STEP):
    """Round-join outward offset of a CCW convex ring by d (exact
    Minkowski with inscribed arc discretization). Returns (oxs, oys)."""
    n = len(xs)
    ex = np.roll(xs, -1) - xs
    ey = np.roll(ys, -1) - ys
    elen = np.hypot(ex, ey)
    keep = elen > 0.0
    # outward normal of CCW edge (a->b) is (dy, -dx)/|e|
    nx = np.where(keep, ey / np.where(keep, elen, 1.0), 0.0)
    ny = np.where(keep, -ex / np.where(keep, elen, 1.0), 0.0)
    out_x: list = []
    out_y: list = []
    for i in range(n):
        if not keep[(i - 1) % n] and not keep[i]:
            continue
        a_in = np.arctan2(ny[(i - 1) % n], nx[(i - 1) % n])
        a_out = np.arctan2(ny[i], nx[i])
        if not keep[(i - 1) % n]:
            a_in = a_out
        if not keep[i]:
            a_out = a_in
        sweep = (a_out - a_in) % (2.0 * np.pi)
        if sweep > np.pi:          # numerical noise on collinear edges
            sweep = 0.0
        m = max(1, int(np.ceil(sweep / arc_step)))
        for j in range(m + 1):
            th = a_in + sweep * j / m
            out_x.append(xs[i] + d * np.cos(th))
            out_y.append(ys[i] + d * np.sin(th))
    return np.asarray(out_x), np.asarray(out_y)


def _erode_convex_ring(xs, ys, d):
    """Inward offset of a CCW convex ring by d via Sutherland-Hodgman
    clipping against every edge's inward-shifted half-plane. Returns
    (oxs, oys) or None when the ring collapses."""
    subject = list(zip(xs.tolist(), ys.tolist()))
    n = len(xs)
    for i in range(n):
        ax, ay = xs[i], ys[i]
        bx, by = xs[(i + 1) % n], ys[(i + 1) % n]
        elen = float(np.hypot(bx - ax, by - ay))
        if elen == 0.0:
            continue
        # keep p with cross(b-a, p-a) >= d*|e|  (left of line by >= d)
        thr = d * elen

        def side(p):
            return (bx - ax) * (p[1] - ay) - (by - ay) * (p[0] - ax) - thr
        clipped = []
        for k in range(len(subject)):
            cur, nxt = subject[k], subject[(k + 1) % len(subject)]
            sc, sn = side(cur), side(nxt)
            if sc >= 0.0:
                clipped.append(cur)
            if (sc >= 0.0) != (sn >= 0.0):
                t = sc / (sc - sn)
                clipped.append((cur[0] + t * (nxt[0] - cur[0]),
                                cur[1] + t * (nxt[1] - cur[1])))
            if not clipped and k == len(subject) - 1:
                return None
        subject = clipped
        if len(subject) < 3:
            return None
    oxs = np.array([p[0] for p in subject])
    oys = np.array([p[1] for p in subject])
    if abs(_signed_area2(oxs, oys)) <= 0.0:
        return None  # eroded to a point/segment -> hole collapsed
    return oxs, oys


def buffer_polygon(xs, ys, ring_offsets, d, arc_step=ARC_STEP):
    """GetBuffered(d >= 0) for one (multi)polygon in even-odd ring form.

    Returns (oxs, oys, oring_offsets, approx) where approx is True when
    any documented approximation (hull fallback / overlap merge) fired.
    Raises ValueError on d < 0 or a degenerate ring.
    """
    from .pip import points_in_ring

    if d < 0.0:
        raise ValueError("buffer_polygon: negative distance")
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    if ring_offsets is None or len(ring_offsets) < 2:
        ring_offsets = [0, len(xs)]
    rings = []
    for k in range(len(ring_offsets) - 1):
        rx, ry = _ring_open(xs[ring_offsets[k]:ring_offsets[k + 1]],
                            ys[ring_offsets[k]:ring_offsets[k + 1]])
        if len(rx) < 3:
            raise ValueError("buffer_polygon: ring with < 3 vertices")
        rings.append(_ensure_ccw(rx, ry))
    if d == 0.0:
        off = [0]
        for rx, ry in rings:
            off.append(off[-1] + len(rx))
        return (np.concatenate([r[0] for r in rings]),
                np.concatenate([r[1] for r in rings]),
                off, False)

    # even-odd nesting depth of each ring's first vertex vs the others
    depth = []
    for k, (rx, ry) in enumerate(rings):
        c = 0
        for j, (ox, oy) in enumerate(rings):
            if j != k and points_in_ring(
                    np.array([rx[0]]), np.array([ry[0]]), ox, oy)[0]:
                c += 1
        depth.append(c)
    shells = [r for r, dep in zip(rings, depth) if dep % 2 == 0]
    holes = [r for r, dep in zip(rings, depth) if dep % 2 == 1]

    approx = False
    conv_shells = []
    for rx, ry in shells:
        if not _is_convex_ccw(rx, ry):
            rx, ry = _convex_hull(rx, ry)
            approx = True
        conv_shells.append((rx, ry))

    if len(conv_shells) > 1:
        # overlap guard: buffered-bbox intersection => union needed,
        # which even-odd parity can't express -> one hull superset
        boxes = [(rx.min() - d, rx.max() + d, ry.min() - d, ry.max() + d)
                 for rx, ry in conv_shells]
        overlap = any(
            boxes[i][0] <= boxes[j][1] and boxes[j][0] <= boxes[i][1]
            and boxes[i][2] <= boxes[j][3] and boxes[j][2] <= boxes[i][3]
            for i in range(len(boxes)) for j in range(i + 1, len(boxes)))
        if overlap:
            ax = np.concatenate([r[0] for r in conv_shells])
            ay = np.concatenate([r[1] for r in conv_shells])
            conv_shells = [_convex_hull(ax, ay)]
            holes = []
            approx = True

    out_rings = [_offset_convex_ring(rx, ry, d, arc_step)
                 for rx, ry in conv_shells]
    for rx, ry in holes:
        if not _is_convex_ccw(rx, ry):
            rx, ry = _convex_hull(rx, ry)
            approx = True
        eroded = _erode_convex_ring(rx, ry, d)
        if eroded is not None:
            out_rings.append(eroded)
    off = [0]
    for rx, ry in out_rings:
        off.append(off[-1] + len(rx))
    return (np.concatenate([r[0] for r in out_rings]),
            np.concatenate([r[1] for r in out_rings]),
            off, approx)
