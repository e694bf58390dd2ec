"""Closure-captured relate refine for broadcast-size shape layers.

The struct refine path (`functions.st_relate_shape_point`) ships every
shape column — including the POLYGON VERTEX ARRAYS — through Arrow once
per candidate row. For a triangle that is noise; for an admin boundary
with 10^4 vertices replicated across 10^6 candidate points it is the
dominant Arrow payload of the whole join, paid per row, per batch.

When the shape side is broadcast-small anyway (the layer already fits
on every executor by definition), collect it ONCE to a driver-side
table keyed by the caller's shape-id column and capture that table in
the refine UDF's closure: the join then carries only (shape_id, bbox)
and the refine input shrinks to three scalar columns (id, x, y). The
table ships with the serialized task — the same bytes the broadcast
was already paying — and each executor deserializes it once per task
instead of once per candidate row.

Dispatch inside the UDF mirrors `_st_relate_shape_point_udf`: rows
group by shape id, each group runs the vectorized kernel for that
shape's kind in one NumPy call.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ByteType

from ..kernels import relation as REL
from ..kernels import wkt as _wkt

# guard: beyond this many total vertices the closure (shipped per task)
# stops being "broadcast-small"; callers fall back to the struct path
MAX_CLOSURE_VERTICES = 2_000_000


def collect_shape_table(shapes: DataFrame, shape_id: str,
                        shape_col: str = "shape"):
    """One driver-side pass over the (broadcast-small) shape layer ->
    {id: (kind, x, y, radius, minx, maxx, miny, maxy, xs, ys, ro)}.
    Returns None when the layer exceeds MAX_CLOSURE_VERTICES (caller
    should use the struct refine instead)."""
    rows = shapes.select(shape_id, shape_col).collect()
    table = {}
    total_verts = 0
    for r in rows:
        if r[0] is None or r[0] in table:
            # shape_id must be a unique non-null key: a duplicate would
            # silently collapse two shapes onto one table entry and
            # diverge from the struct path — fall back instead.
            return None
        s = r[1]
        xs = np.asarray(s["xs"], dtype=np.float64) if s["xs"] is not None else None
        ys = np.asarray(s["ys"], dtype=np.float64) if s["ys"] is not None else None
        ro = (np.asarray(s["ring_offsets"], dtype=np.int64)
              if s["ring_offsets"] is not None else None)
        if xs is not None:
            total_verts += len(xs)
            if total_verts > MAX_CLOSURE_VERTICES:
                return None
        table[r[0]] = (s["kind"], s["x"], s["y"], s["radius"],
                       s["minx"], s["maxx"], s["miny"], s["maxy"],
                       xs, ys, ro)
    return table


def make_closure_refine(table: dict):
    """Pandas UDF (shape_id, px, py) -> relation code, with the shape
    table captured in the closure."""
    from ..kernels.pip import points_in_polygon
    from ..kernels.relate_circle import relate_circle_point
    from ..kernels.relate_line import linestring_contains_point
    from ..kernels.relate_rect import relate_rect_point

    def refine(ids: pd.Series, px: pd.Series, py: pd.Series) -> pd.Series:
        n = len(ids)
        out = np.full(n, REL.DISJOINT, dtype=np.int8)
        idv = ids.to_numpy()
        pxv = px.to_numpy(dtype=np.float64)
        pyv = py.to_numpy(dtype=np.float64)
        order = np.argsort(idv, kind="stable")
        sorted_ids = idv[order]
        bounds = np.nonzero(np.r_[True, sorted_ids[1:] != sorted_ids[:-1]])[0]
        bounds = np.r_[bounds, n]
        for b in range(len(bounds) - 1):
            rows = order[bounds[b]:bounds[b + 1]]
            rec = table.get(sorted_ids[bounds[b]])
            if rec is None:
                continue
            (kind, sx, sy, rad, minx, maxx, miny, maxy, xs, ys, ro) = rec
            gx, gy = pxv[rows], pyv[rows]
            if kind == _wkt.KIND_RECT:
                out[rows] = relate_rect_point(
                    np.full(len(rows), minx), np.full(len(rows), maxx),
                    np.full(len(rows), miny), np.full(len(rows), maxy),
                    gx, gy, geo=True)
            elif kind == _wkt.KIND_CIRCLE:
                out[rows] = relate_circle_point(
                    np.full(len(rows), sx), np.full(len(rows), sy),
                    np.full(len(rows), rad), gx, gy, geo=True)
            elif kind == _wkt.KIND_POINT:
                hit = (gx == sx) & (gy == sy)
                out[rows] = np.where(hit, REL.CONTAINS, REL.DISJOINT)
            elif kind in (_wkt.KIND_POLYGON, _wkt.KIND_MULTIPOLYGON):
                hit = points_in_polygon(gx, gy, xs, ys, ro)
                out[rows] = np.where(hit, REL.CONTAINS, REL.DISJOINT)
            elif kind == _wkt.KIND_LINESTRING:
                hit = linestring_contains_point(xs, ys, float(rad or 0.0),
                                                gx, gy)
                out[rows] = np.where(hit, REL.CONTAINS, REL.DISJOINT)
        return pd.Series(out)

    return pandas_udf(refine, ByteType())


def make_closure_shape_relate(table: dict):
    """Pandas UDF (left xs, ys, ring_offsets, right_id) -> relation
    code, with the RIGHT layer's vertex arrays captured in the closure
    (two-layer join, broadcast-small right side): per candidate pair
    only the LEFT shape's arrays cross Arrow."""
    from ..kernels.pip import relate_polygon_polygon

    def relate(axs: pd.Series, ays: pd.Series, aro: pd.Series,
               rid: pd.Series) -> pd.Series:
        n = len(axs)
        out = np.full(n, REL.DISJOINT, dtype=np.int8)
        axv = axs.to_numpy()
        ayv = ays.to_numpy()
        arv = aro.to_numpy()
        ridv = rid.to_numpy()
        for i in range(n):
            rec = table.get(ridv[i])
            if rec is None:
                continue
            bxs, bys, bro = rec[8], rec[9], rec[10]
            ar = arv[i]
            out[i] = relate_polygon_polygon(
                np.asarray(axv[i], dtype=np.float64),
                np.asarray(ayv[i], dtype=np.float64),
                np.asarray(ar, dtype=np.int64) if ar is not None else None,
                bxs, bys, bro)
        return pd.Series(out)

    return pandas_udf(relate, ByteType())


# convex fast path: above this edge count the unrolled JVM predicate
# stops being worth the broadcast width (3 doubles per edge per shape)
MAX_CONVEX_EDGES = 8


def _shape_halfplanes(rec, max_edges: int):
    """[(a, b, c), ...] for ONE convex shape, or None if it has no
    half-plane form (non-convex, holed, page-split, too many edges,
    dateline rect, non-areal kind)."""
    kind, xs, ys, ro = rec[0], rec[8], rec[9], rec[10]
    if kind == _wkt.KIND_RECT:
        # a non-crossing rect is 4 axis-aligned half-planes (the closed
        # plain-rect branch of RectangleImpl); a dateline rect needs
        # the x-shift and falls back
        minx, maxx, miny, maxy = rec[4], rec[5], rec[6], rec[7]
        if minx > maxx:
            return None
        return [(1.0, 0.0, -minx), (-1.0, 0.0, maxx),
                (0.0, 1.0, -miny), (0.0, -1.0, maxy)]
    if kind != _wkt.KIND_POLYGON or xs is None:
        return None
    if ro is not None and len(ro) > 2:
        return None
    n = len(xs)
    if n >= 2 and xs[0] == xs[-1] and ys[0] == ys[-1]:
        n -= 1
    if n < 3 or n > max_edges:
        return None
    x2 = np.r_[xs[1:n], xs[0]]
    y2 = np.r_[ys[1:n], ys[0]]
    x1, y1 = xs[:n], ys[:n]
    # consecutive-edge cross products decide convexity + winding
    x3 = np.r_[x2[1:], x2[0]]
    y3 = np.r_[y2[1:], y2[0]]
    cross = (x2 - x1) * (y3 - y2) - (y2 - y1) * (x3 - x2)
    if np.all(cross >= 0):
        sign = 1.0      # CCW
    elif np.all(cross <= 0):
        sign = -1.0     # CW
    else:
        return None     # non-convex
    a = -(y2 - y1) * sign
    b = (x2 - x1) * sign
    c = ((y2 - y1) * x1 - (x2 - x1) * y1) * sign
    return list(zip(a.tolist(), b.tolist(), c.tolist()))


def split_convex(table: dict, max_edges: int = MAX_CONVEX_EDGES):
    """Partition the closure table by half-plane expressibility:
    ({convex_id: [(a,b,c),...]}, {other_id: rec}). Containment for the
    convex part is AND_k(a_k*x + b_k*y + c_k >= 0) — unrolled scalar
    Column conjuncts (whole-stage codegen, no Python), boundary-in
    matching the even-odd kernel's COVERS semantics; the rest runs the
    closure kernel refine."""
    hp, rest = {}, {}
    for sid, rec in table.items():
        planes = _shape_halfplanes(rec, max_edges)
        if planes is None:
            rest[sid] = rec
        else:
            hp[sid] = planes
    return hp, rest


def convex_halfplanes(table: dict, max_edges: int = MAX_CONVEX_EDGES):
    """All-or-nothing view of split_convex: None unless EVERY shape is
    half-plane-expressible.

    Deliberately all-or-nothing inside ONE join: auto-splitting a mixed
    layer into a JVM branch + a UDF branch would scan the (10^12-row)
    point side twice — worse than one pass with the kernel refine. A
    caller who KNOWS the mix is lopsided can pre-split the small shape
    layer with split_convex and run two joins against a cached/
    checkpointed point projection, paying the second scan knowingly."""
    hp, rest = split_convex(table, max_edges)
    return hp if not rest else None
