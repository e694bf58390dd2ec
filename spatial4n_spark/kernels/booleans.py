r"""Even-odd boolean geometry: exact intersection of two arbitrary
even-odd ring sets (concave, holed, multipart, nested islands).

Round-5 extension of the Greiner–Hormann kernels (kernels/union.py) —
the geometry twin of the overlay AREA kernel (kernels/overlay.py),
which reference users get from NTS `Geometry.Intersection`
(Spatial4n.Core.NTS/Shapes/Nts/NtsGeometry.cs relate/op surface).

Method: decompose each even-odd ring set into MEMBERS (shell + its
immediate holes; islands nested in holes are members of their own).
Members of one set have disjoint interiors, so intersection
distributes: A ∩ B = ⊔ (Ma ∩ Nb) — the member-pair results simply
concatenate, no re-union needed. One member pair is

    (Sa \ Ha) ∩ (Sb \ Hb) = (Sa ∩ Sb) \ (Ha ∪ Hb)

computed as: GH ring intersection for the cores, union_many for the
combined hole set (holes of ONE member are disjoint, but Ha and Hb may
overlap each other), then sequential GH ring DIFFERENCE of the
disjoint hole-union primaries from each core. Pocket rings the hole
union pinches off (two interlocking C-holes) are regions the holes do
NOT cover: they are clipped to the core and re-added as island
members. Any degenerate boundary contact anywhere returns None — the
caller reports an honest error row; the exact AREA for such inputs is
kernels/overlay.intersection_area, which has no bailout.

Scale note: runs per candidate pair inside an Arrow batch; cost is
O(|A|·|B|) crossing detection per ring pair on shapes that are tiny
next to the row counts around them (same contract as union.py).
"""
from __future__ import annotations

import numpy as np

from .union import (_open_ccw, _point_in_ring_strict, difference_rings,
                    intersect_rings, union_many)


def _depths(rings):
    """Containment depth of each ring's first vertex vs the others.
    Valid even-odd input: rings never cross, so first-vertex parity is
    the ring's nesting depth."""
    out = []
    for k, (rx, ry) in enumerate(rings):
        d = 0
        for j, (ox, oy) in enumerate(rings):
            if j != k and _point_in_ring_strict(rx[0], ry[0], ox, oy):
                d += 1
        out.append(d)
    return out


def members_of(rings):
    """Group an even-odd ring list into members [(shell, [holes])].
    Even-depth rings are shells; each odd-depth ring attaches to its
    deepest containing shell (its immediate parent)."""
    opened = [_open_ccw(np.asarray(rx, dtype=np.float64),
                        np.asarray(ry, dtype=np.float64))
              for rx, ry in rings]
    depth = _depths(opened)
    members = []
    shell_idx = []
    for i, (r, d) in enumerate(zip(opened, depth)):
        if d % 2 == 0:
            members.append((r, []))
            shell_idx.append(i)
    for i, (r, d) in enumerate(zip(opened, depth)):
        if d % 2 == 1:
            parent, pdepth = None, -1
            for m, si in enumerate(shell_idx):
                sx, sy = opened[si]
                if depth[si] == d - 1 and _point_in_ring_strict(
                        r[0][0], r[1][0], sx, sy):
                    if depth[si] > pdepth:
                        parent, pdepth = m, depth[si]
            if parent is None:
                return None  # inconsistent nesting (invalid input)
            members[parent][1].append(r)
    return members


def _split_shells_holes(pieces):
    """Classify a GH output ring list into (shells, holes) by nesting
    parity within the list."""
    depth = _depths(pieces)
    shells = [r for r, d in zip(pieces, depth) if d % 2 == 0]
    holes = [r for r, d in zip(pieces, depth) if d % 2 == 1]
    return shells, holes


def _cores_minus_holes(cores, holes):
    """Region (⊔ cores) \\ (⋃ holes) as a member list, or None on
    degenerate contact. Cores must be disjoint simple rings; holes of
    one origin set are disjoint, but the combined list may overlap —
    it is unioned first so even-odd parity never double-flips."""
    if not cores:
        return []
    prim, pock = [], []
    if len(holes) == 1:
        prim = [holes[0]]
    elif holes:
        u = union_many(holes)
        if u is None:
            return None
        prim, pock = _split_shells_holes(u)
    out_members = []
    for cx, cy in cores:
        state = [((cx, cy), [])]
        for px, py in prim:
            new_state = []
            for (shx, shy), hl in state:
                pieces = difference_rings(shx, shy, px, py)
                if pieces is None:
                    return None
                if not pieces:
                    continue  # this shell is consumed by the hole
                shells, new_holes = _split_shells_holes(pieces)
                for s2x, s2y in shells:
                    hset = [h for h in hl + new_holes
                            if _point_in_ring_strict(h[0][0], h[1][0],
                                                     s2x, s2y)]
                    new_state.append(((s2x, s2y), hset))
            state = new_state
        out_members.extend(state)
    # pocket rings of the hole union are NOT hole-covered: the
    # sequential disk subtraction above removed them with their
    # enclosing primary, so re-add them clipped to each core as
    # island members (a pocket contains no further holes — every
    # input hole is inside the union region, pockets are outside it)
    for pxr, pyr in pock:
        for cx, cy in cores:
            isl = intersect_rings(pxr, pyr, cx, cy)
            if isl is None:
                return None
            for s2 in isl:
                out_members.append((s2, []))
    return out_members


def _member_intersection(sa, ha, sb, hb):
    """One member pair -> list of output members, or None on
    degenerate contact: (Sa ∩ Sb) \\ (Ha ∪ Hb)."""
    cores = intersect_rings(sa[0], sa[1], sb[0], sb[1])
    if cores is None:
        return None
    return _cores_minus_holes(cores, ha + hb)


def difference_evenodd(rings_a, rings_b):
    """Exact difference geometry A \\ B of two even-odd ring sets.

    Distributes over A's members; B's members subtract sequentially
    (they are interior-disjoint). One step is

        M \\ (T \\ Ht) = (M \\ T)  ⊔  ⊔_j (M ∩ Ht_j)

    — the piece of M outside N's shell, plus the pieces of M inside
    N's holes (disjoint by construction). M \\ T reuses the
    cores-minus-holes machinery with T joined to M's own hole set;
    M ∩ Ht_j is a member intersection with the hole as a plain disk.
    Returns a member list like intersect_evenodd, [] when B covers A,
    or None on degenerate boundary contact anywhere.
    """
    ma = members_of(rings_a)
    mb = members_of(rings_b)
    if ma is None or mb is None:
        return None
    work = ma
    for tb, ht in mb:
        new_work = []
        for sh, hs in work:
            outside = _cores_minus_holes([sh], hs + [tb])
            if outside is None:
                return None
            new_work.extend(outside)
            for hj in ht:
                inside_hole = _member_intersection(sh, hs, hj, [])
                if inside_hole is None:
                    return None
                new_work.extend(inside_hole)
        work = new_work
    return work


def union_evenodd(rings_a, rings_b):
    """Union geometry A ∪ B of two even-odd ring sets, as
    A ⊔ (B \\ A) — members of A plus the pieces of B outside A.

    REGION-exact: even-odd parity over the output rings equals
    (in A) or (in B) everywhere off the boundaries. The boundary is
    NOT canonical: where B \\ A pieces meet A, their rings run along
    ∂A inside the union (seam arcs) instead of being dissolved away —
    fine for PIP/area/parity consumers; use the parser's
    `_resolve_multi_overlap` / `dissolve` when a clean dissolved
    boundary is required (single-ring crossings get exact GH unions
    there). Returns a member list, or None on degenerate contact.
    """
    ma = members_of(rings_a)
    if ma is None:
        return None
    rest = difference_evenodd(rings_b, rings_a)
    if rest is None:
        return None
    out = [(sh, list(hl)) for sh, hl in ma + rest]
    # cancel coincident hole/shell pairs: a hole of A fully covered by
    # B comes back as a B\A piece whose shell is the IDENTICAL ring —
    # parity-correct but per-ring signs (area, orientation) become
    # ill-defined on coincident curves. Fill the hole structurally:
    # drop both rings, promote the piece's holes into the member.
    changed = True
    while changed:
        changed = False
        for mi, (sh, hl) in enumerate(out):
            for hi, h in enumerate(hl):
                key = _canon_cycle(*h)
                hit = next((pj for pj, (psh, _) in enumerate(out)
                            if pj != mi and _canon_cycle(*psh) == key),
                           None)
                if hit is not None:
                    hl.pop(hi)
                    hl.extend(out[hit][1])
                    out.pop(hit)
                    changed = True
                    break
            if changed:
                break
    return out


def _canon_cycle(rx, ry):
    """Orientation- and rotation-independent canonical form of a ring
    (open vertex list) for exact-coincidence tests."""
    pts = list(zip(rx.tolist(), ry.tolist()))
    n = len(pts)
    k = min(range(n), key=lambda i: pts[i])
    fwd = tuple(pts[(k + i) % n] for i in range(n))
    rev = tuple(pts[(k - i) % n] for i in range(n))
    return min(fwd, rev)


def sym_difference_evenodd(rings_a, rings_b):
    """Symmetric difference geometry A △ B = (A \\ B) ⊔ (B \\ A) — the
    two operands are disjoint regions, so their member lists simply
    concatenate. Same seam-boundary caveat as union_evenodd where a
    piece meets the other set's boundary. None on degenerate contact."""
    ab = difference_evenodd(rings_a, rings_b)
    if ab is None:
        return None
    ba = difference_evenodd(rings_b, rings_a)
    if ba is None:
        return None
    return ab + ba


def intersect_evenodd(rings_a, rings_b):
    """Exact intersection geometry of two even-odd ring sets.

    rings_a / rings_b: lists of (xs, ys) rings (open or closed, any
    orientation). Returns a list of members [(shell, [holes])] whose
    concatenated rings are the even-odd form of A ∩ B — [] when the
    interiors are disjoint — or None on degenerate boundary contact
    (shared vertices / collinear overlapping edges) anywhere.
    """
    ma = members_of(rings_a)
    mb = members_of(rings_b)
    if ma is None or mb is None:
        return None
    out = []
    for sa, ha in ma:
        for sb, hb in mb:
            res = _member_intersection(sa, ha, sb, hb)
            if res is None:
                return None
            out.extend(res)
    return out


# ---------------------------------------------------------------------------
# Robust boundary-selection overlay (round 5, second half).
#
# The Greiner–Hormann member algebra above is exact but BAILS on
# degenerate boundary contact (shared vertices, collinear overlapping
# edges) — extremely common in real data (adjacent parcels, tiled
# admin layers). This fallback computes the same four boolean ops by
# BOUNDARY SELECTION instead of traversal, the technique the overlay
# AREA kernel already uses for its no-bailout guarantee:
#
#   1. split every edge of A at every contact with ∂B and vice versa
#      (pip._edge_split_ts: crossings, touch points, collinear-overlap
#      endpoints — sub-segment region status is then constant);
#   2. classify each sub-segment's two sides with distance-guarded
#      offset probes (a tolerance ladder like _ring_contained_in);
#      keep it iff exactly one side is in the result region, directed
#      so the region lies on the LEFT;
#   3. dedupe shared segments (a collinear-shared piece is emitted by
#      both boundaries with the same verdict);
#   4. stitch directed sub-segments into rings; at touch nodes with
#      several continuations take the most counterclockwise turn,
#      which keeps the left-side region consistent through
#      figure-eight contacts.
#
# Unclassifiable probes or a broken stitch return None — callers keep
# the honest error-row contract for anything this cannot settle.
# ---------------------------------------------------------------------------

_OPS = {
    "and": lambda a, b: a and b,
    "or": lambda a, b: a or b,
    "sub": lambda a, b: a and not b,
    "xor": lambda a, b: a != b,
}


def _soup_of(rings):
    from .union import _roll1
    if not rings:
        z = np.empty(0, dtype=np.float64)
        return z, z, z, z
    xs = np.concatenate([r[0] for r in rings])
    ys = np.concatenate([r[1] for r in rings])
    x2 = np.concatenate([_roll1(r[0]) for r in rings])
    y2 = np.concatenate([_roll1(r[1]) for r in rings])
    return xs, ys, x2, y2


def _soup_parity(qx, qy, soup):
    sx0, sy0, sx1, sy1 = soup
    if len(sx0) == 0:
        return False
    active = (sy0 > qy) != (sy1 > qy)
    if not active.any():
        return False
    xat = sx0[active] + (qy - sy0[active]) * (sx1[active] - sx0[active]) \
        / (sy1[active] - sy0[active])
    return bool((qx < xat).sum() & 1)


def _soup_min_dist2(qx, qy, soup):
    sx0, sy0, sx1, sy1 = soup
    if len(sx0) == 0:
        return np.inf
    dx, dy = sx1 - sx0, sy1 - sy0
    L2 = dx * dx + dy * dy
    L2s = np.where(L2 == 0.0, 1.0, L2)
    t = np.clip(((qx - sx0) * dx + (qy - sy0) * dy) / L2s, 0.0, 1.0)
    d2 = (qx - (sx0 + t * dx)) ** 2 + (qy - (sy0 + t * dy)) ** 2
    return float(d2.min())


def robust_boolean(rings_a, rings_b, op):
    """Boundary-selection boolean geometry — handles degenerate
    boundary contact the GH member algebra bails on. Returns a ring
    list (even-odd form) or None when a probe or the stitch cannot be
    settled. `op` in {'and', 'or', 'sub', 'xor'}."""
    from .pip import _edge_split_ts
    from .union import _open_ccw, _roll1
    want = _OPS[op]
    A = [_open_ccw(np.asarray(rx, dtype=np.float64),
                   np.asarray(ry, dtype=np.float64)) for rx, ry in rings_a]
    B = [_open_ccw(np.asarray(rx, dtype=np.float64),
                   np.asarray(ry, dtype=np.float64)) for rx, ry in rings_b]
    soup_a, soup_b = _soup_of(A), _soup_of(B)

    kept = []  # directed (x0, y0, x1, y1), region on the left
    for own, own_soup, other_soup in ((A, soup_a, soup_b),
                                      (B, soup_b, soup_a)):
        for xs, ys in own:
            x2s, y2s = _roll1(xs), _roll1(ys)
            for k in range(len(xs)):
                cx0, cy0, cx1, cy1 = xs[k], ys[k], x2s[k], y2s[k]
                if cx0 == cx1 and cy0 == cy1:
                    continue
                ts = _edge_split_ts(cx0, cy0, cx1, cy1,
                                    other_soup[0], other_soup[1],
                                    other_soup[2], other_soup[3])
                px = cx0 + ts * (cx1 - cx0)
                py = cy0 + ts * (cy1 - cy0)
                for i in range(len(ts) - 1):
                    x0, y0, x1, y1 = px[i], py[i], px[i + 1], py[i + 1]
                    if x0 == x1 and y0 == y1:
                        continue
                    mx, my = (x0 + x1) / 2.0, (y0 + y1) / 2.0
                    seglen = float(np.hypot(x1 - x0, y1 - y0))
                    lx, ly = -(y1 - y0) / seglen, (x1 - x0) / seglen
                    verdict = None
                    for eps in (seglen * 1e-7, seglen * 1e-4,
                                seglen * 1e-2):
                        qlx, qly = mx + eps * lx, my + eps * ly
                        qrx, qry = mx - eps * lx, my - eps * ly
                        lim = (eps * 0.45) ** 2
                        if (_soup_min_dist2(qlx, qly, soup_a) < lim
                                or _soup_min_dist2(qlx, qly, soup_b) < lim
                                or _soup_min_dist2(qrx, qry, soup_a) < lim
                                or _soup_min_dist2(qrx, qry, soup_b) < lim):
                            continue
                        in_l = want(_soup_parity(qlx, qly, soup_a),
                                    _soup_parity(qlx, qly, soup_b))
                        in_r = want(_soup_parity(qrx, qry, soup_a),
                                    _soup_parity(qrx, qry, soup_b))
                        verdict = (in_l, in_r)
                        break
                    if verdict is None:
                        return None
                    in_l, in_r = verdict
                    if in_l == in_r:
                        continue
                    if in_l:
                        kept.append((float(x0), float(y0),
                                     float(x1), float(y1)))
                    else:
                        kept.append((float(x1), float(y1),
                                     float(x0), float(y0)))

    def _q(v):
        return round(v, 9)

    # dedupe shared boundary pieces (emitted by both A and B)
    seen = set()
    segs = []
    for x0, y0, x1, y1 in kept:
        key = (_q(x0), _q(y0), _q(x1), _q(y1))
        if key in seen:
            continue
        seen.add(key)
        segs.append((x0, y0, x1, y1))
    if not segs:
        return []

    # stitch: adjacency by quantized start node; at multi-way touch
    # nodes take the most counterclockwise continuation
    out_at = {}
    for idx, (x0, y0, x1, y1) in enumerate(segs):
        out_at.setdefault((_q(x0), _q(y0)), []).append(idx)
    used = [False] * len(segs)
    rings = []
    for start in range(len(segs)):
        if used[start]:
            continue
        loop = []
        cur = start
        guard = 0
        while True:
            guard += 1
            if guard > len(segs) + 2:
                return None
            used[cur] = True
            x0, y0, x1, y1 = segs[cur]
            loop.append((x0, y0))
            node = (_q(x1), _q(y1))
            if node == (_q(segs[start][0]), _q(segs[start][1])):
                break
            cands = [i for i in out_at.get(node, []) if not used[i]]
            if not cands:
                return None
            if len(cands) == 1:
                cur = cands[0]
                continue
            din = np.arctan2(y1 - y0, x1 - x0)
            best, best_ang = None, None
            for i in cands:
                nx0, ny0, nx1, ny1 = segs[i]
                dout = np.arctan2(ny1 - ny0, nx1 - nx0)
                # CCW turn from din, in (0, 2*pi]: smallest = sharpest
                # left turn, keeping the left-side region enclosed
                ang = (np.pi - (dout - din)) % (2.0 * np.pi)
                if best is None or ang < best_ang:
                    best, best_ang = i, ang
            cur = best
        if len(loop) >= 3:
            rings.append((np.asarray([p[0] for p in loop]),
                          np.asarray([p[1] for p in loop])))
    return rings


def members_of_robust(rings):
    """Member grouping for robust_boolean output: rings may TOUCH at
    points (figure-eight contacts), where first-vertex parity is
    unreliable — nesting uses the distance-guarded containment probe
    instead (overlay._ring_contained_in)."""
    from .overlay import _ring_contained_in
    opened = [( np.asarray(rx, dtype=np.float64),
                np.asarray(ry, dtype=np.float64)) for rx, ry in rings]
    depth = []
    for i, (rx, ry) in enumerate(opened):
        d = 0
        for j, (ox, oy) in enumerate(opened):
            if j != i and _ring_contained_in(rx, ry, ox, oy):
                d += 1
        depth.append(d)
    members = []
    shell_idx = []
    for i, (r, d) in enumerate(zip(opened, depth)):
        if d % 2 == 0:
            members.append((r, []))
            shell_idx.append(i)
    for i, (r, d) in enumerate(zip(opened, depth)):
        if d % 2 == 1:
            parent, pdepth = None, -1
            for m, si in enumerate(shell_idx):
                if depth[si] == d - 1 and _ring_contained_in(
                        r[0], r[1], opened[si][0], opened[si][1]):
                    if depth[si] > pdepth:
                        parent, pdepth = m, depth[si]
            if parent is None:
                return None
            members[parent][1].append(r)
    return members
