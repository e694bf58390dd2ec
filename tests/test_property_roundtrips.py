"""Hypothesis property tests: codec round-trips and parse fixpoints.

Deterministic-seed property layer on top of the transcribed golden
fixtures (SURVEY §5): for arbitrary in-range shapes,
  parse(format(parse(w))) == parse(w)           (WKT fixpoint)
  read(write(rec)) == rec                       (binary codec)
and the relation-algebra involutions hold for every code.
"""
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from spatial4n_spark.kernels import binary as B
from spatial4n_spark.kernels import relation as REL
from spatial4n_spark.kernels import wkt

FIN = dict(allow_nan=False, allow_infinity=False)
LON = st.floats(min_value=-180.0, max_value=180.0, **FIN)
LAT = st.floats(min_value=-90.0, max_value=90.0, **FIN)

SETTINGS = settings(max_examples=120, deadline=None,
                    suppress_health_check=[HealthCheck.too_slow])


def _fmt(v: float) -> str:
    return repr(float(v))


def _rec_equal(a: dict, b: dict) -> bool:
    for k in ("kind", "x", "y", "radius", "minx", "maxx", "miny", "maxy"):
        va, vb = a[k], b[k]
        if isinstance(va, float) and math.isnan(va):
            if not (isinstance(vb, float) and math.isnan(vb)):
                return False
        elif va != vb:
            return False
    return (list(a["xs"]) == list(b["xs"])
            and list(a["ys"]) == list(b["ys"])
            and list(a["ring_offsets"] or []) == list(b["ring_offsets"] or []))


@SETTINGS
@given(LON, LAT)
def test_point_wkt_fixpoint(x, y):
    r1 = wkt.parse_shape(f"POINT ({_fmt(x)} {_fmt(y)})")
    w = wkt.format_wkt(r1["kind"], r1["x"], r1["y"], r1["radius"],
                       r1["minx"], r1["maxx"], r1["miny"], r1["maxy"],
                       r1["xs"], r1["ys"], r1["ring_offsets"], None)
    r2 = wkt.parse_shape(w)
    assert _rec_equal(r1, r2)


@SETTINGS
@given(LON, LON, LAT, LAT)
def test_envelope_binary_roundtrip(x1, x2, y1, y2):
    miny, maxy = sorted((y1, y2))
    w = f"ENVELOPE ({_fmt(x1)}, {_fmt(x2)}, {_fmt(maxy)}, {_fmt(miny)})"
    r1 = wkt.parse_shape(w)
    r2 = B.read_shape(B.write_shape(r1))
    assert _rec_equal(r1, r2)


@SETTINGS
@given(LON, LAT, st.floats(min_value=0.0, max_value=179.0, **FIN))
def test_circle_binary_roundtrip(x, y, r):
    rec = wkt.parse_shape(f"BUFFER(POINT({_fmt(x)} {_fmt(y)}), {_fmt(r)})")
    back = B.read_shape(B.write_shape(rec))
    assert _rec_equal(rec, back)


@SETTINGS
@given(st.lists(st.tuples(
    st.floats(min_value=-170.0, max_value=170.0, **FIN),
    st.floats(min_value=-80.0, max_value=80.0, **FIN)),
    min_size=2, max_size=8))
def test_linestring_binary_roundtrip(pts):
    w = "LINESTRING (" + ", ".join(
        f"{_fmt(x)} {_fmt(y)}" for x, y in pts) + ")"
    rec = wkt.parse_shape(w)
    back = B.read_shape(B.write_shape(rec))
    assert _rec_equal(rec, back)


@SETTINGS
@given(st.floats(min_value=-60.0, max_value=60.0, **FIN),
       st.floats(min_value=-40.0, max_value=40.0, **FIN),
       st.floats(min_value=0.5, max_value=20.0, **FIN),
       st.floats(min_value=0.1, max_value=0.9, **FIN))
def test_triangle_wkt_binary_roundtrips(cx, cy, s, skew):
    ring = [(cx, cy), (cx + s, cy + skew), (cx + skew * s, cy + s),
            (cx, cy)]
    w = "POLYGON((" + ", ".join(f"{_fmt(x)} {_fmt(y)}" for x, y in ring) + "))"
    r1 = wkt.parse_shape(w)
    if r1["kind"] != wkt.KIND_POLYGON:
        return  # degenerate demoted/collapsed case
    r2 = B.read_shape(B.write_shape(r1))
    assert _rec_equal(r1, r2)


def test_relation_algebra_involutions():
    codes = [REL.WITHIN, REL.CONTAINS, REL.DISJOINT, REL.INTERSECTS]
    for a in codes:
        # transpose is an involution (SpatialRelation.cs:95-103)
        assert REL.transpose(REL.transpose(a)) == a
        # combine is commutative and idempotent (:110-126)
        assert REL.combine(a, a) == a
        for b in codes:
            assert REL.combine(a, b) == REL.combine(b, a)
