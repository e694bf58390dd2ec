"""Alt WKT reader (NtsWKTReaderShapeParser analog).

Ports NtsWKTReaderShapeParserTest.cs (point, CCW rect demotion both
sides of the dateline, topology errors) and covers the alt reader's
documented divergences from the default grammar
(NtsWKTReaderShapeParser.cs:30-37, 96-143): no ENVELOPE/BUFFER,
per-vertex longitude wrap under normWrapLongitude, per-vertex bounds
verify. No Spark session needed — pure kernel surface.
"""
import math

import pytest

from spatial4n_spark.context import SpatialEngineContext
from spatial4n_spark.kernels.wkt import (KIND_POINT, KIND_RECT,
                                         WktParseError,
                                         parse_shape_ntsreader)


def _ctx(**args):
    base = {"wktShapeParserClass": "NtsWKTReaderShapeParser",
            "datelineRule": "ccwRect"}
    base.update(args)
    return SpatialEngineContext.from_args(base)


# ---- NtsWKTReaderShapeParserTest.WktGeoPt ----

def test_wkt_geo_pt():
    s = _ctx().parse_wkt("Point(-160 30)")
    assert s["kind"] == KIND_POINT and (s["x"], s["y"]) == (-160.0, 30.0)


# ---- NtsWKTReaderShapeParserTest.WktGeoRect (CcwRect demotion) ----

def test_wkt_geo_rect_no_dateline():
    s = _ctx().parse_wkt(
        "Polygon((-170 30, -170 15,  160 15,  160 30, -170 30))")
    assert s["kind"] == KIND_RECT
    assert (s["minx"], s["maxx"], s["miny"], s["maxy"]) == \
        (-170.0, 160.0, 15.0, 30.0)
    assert not s["minx"] > s["maxx"]  # does NOT cross the dateline


def test_wkt_geo_rect_crosses_dateline():
    s = _ctx().parse_wkt(
        "Polygon(( 160 30,  160 15, -170 15, -170 30,  160 30))")
    assert s["kind"] == KIND_RECT
    assert (s["minx"], s["maxx"], s["miny"], s["maxy"]) == \
        (160.0, -170.0, 15.0, 30.0)
    assert s["minx"] > s["maxx"]  # crossing form (minx > maxx)


# ---- NtsWKTReaderShapeParserTest.TestWrapTopologyException ----

def test_unclosed_ring_raises():
    with pytest.raises(Exception):
        _ctx().parse_wkt("POLYGON((0 0, 10 0, 10 20))")


def test_self_intersect_raises():
    # default validationRule=error -> bowtie is invalid
    with pytest.raises(Exception):
        _ctx().parse_wkt("POLYGON((0 0, 10 0, 10 20, 5 -5, 0 20, 0 0))")


# ---- divergence: spatial4n WKT extensions are unsupported ----

@pytest.mark.parametrize("wkt", [
    "ENVELOPE(10, 20, 40, 30)",
    "BUFFER(POINT(0 0), 5)",
    "GEOMETRYCOLLECTION(POINT(1 2), ENVELOPE(10, 20, 40, 30))",  # nested
])
def test_extensions_rejected(wkt):
    with pytest.raises(WktParseError, match="unsupported by the NTS"):
        _ctx().parse_wkt(wkt)
    # same strings parse under the DEFAULT grammar
    dflt = SpatialEngineContext.from_args({"datelineRule": "ccwRect"})
    assert dflt.parse_wkt(wkt)["kind"] > 0


# ---- divergence: per-vertex lon wrap under normWrapLongitude ----

def test_norm_wrap_longitude_wraps_vertices():
    s = _ctx(normWrapLongitude="true").parse_wkt("POINT(-240 20)")
    assert (s["x"], s["y"]) == (120.0, 20.0)
    ls = _ctx(normWrapLongitude="true").parse_wkt(
        "LINESTRING(190 0, 200 10)")
    assert list(ls["xs"]) == [-170.0, -160.0]


def test_out_of_bounds_raises_without_wrap():
    with pytest.raises(WktParseError, match="Bad X value"):
        _ctx().parse_wkt("POINT(-240 20)")
    with pytest.raises(WktParseError, match="Bad Y value"):
        _ctx().parse_wkt("POINT(0 95)")
    # the default grammar has no per-vertex verify step
    dflt = SpatialEngineContext.from_args({})
    assert dflt.parse_wkt("POINT(-240 20)")["x"] == -240.0


# ---- shared assembly: snap + multipoint + collection still work ----

def test_shared_assembly_matches_default():
    for wkt in ["POINT(10.5 -3.25)",
                "MULTIPOINT((1 2), (3 4))",
                "LINESTRING(0 0, 10 10, 20 0)",
                "POLYGON((0 0, 10 0, 10 10, 0 10, 0 0))",
                "GEOMETRYCOLLECTION(POINT(1 2), LINESTRING(0 0, 1 1))"]:
        a = _ctx().parse_wkt(wkt)
        b = SpatialEngineContext.from_args(
            {"datelineRule": "ccwRect"}).parse_wkt(wkt)
        def eq(x, y):
            if isinstance(x, float) and isinstance(y, float):
                return (math.isnan(x) and math.isnan(y)) or x == y
            if isinstance(x, dict) and isinstance(y, dict):
                return x.keys() == y.keys() and all(eq(x[k], y[k]) for k in x)
            if isinstance(x, (list, tuple)) and isinstance(y, (list, tuple)):
                return len(x) == len(y) and all(eq(p, q) for p, q in zip(x, y))
            return x == y

        assert eq(a, b), wkt


def test_factory_key_variants():
    assert _ctx().wkt_parser == "ntsReader"
    assert SpatialEngineContext.from_args(
        {"wktShapeParserClass": "ntsReader"}).wkt_parser == "ntsReader"
    assert SpatialEngineContext.from_args({}).wkt_parser == "default"
    with pytest.raises(ValueError, match="Unknown WKT shape parser"):
        SpatialEngineContext.from_args({"wktShapeParserClass": "bogus"})


# ---- distributed surface: st_from_wkt(parser="ntsReader") ----

def test_st_from_wkt_ntsreader(spark):
    from pyspark.sql import functions as F

    from spatial4n_spark import functions as SF

    rows = [("Point(-160 30)",),
            ("POINT(-240 20)",),                  # out of bounds
            ("ENVELOPE(10, 20, 40, 30)",),        # extension -> error
            ("Polygon((-170 30, -170 15, 160 15, 160 30, -170 30))",)]
    df = spark.createDataFrame(rows, ["wkt"])
    out = df.select(SF.st_from_wkt(
        F.col("wkt"), dateline_rule="ccwRect",
        parser="ntsReader").alias("s")).collect()
    assert out[0].s.kind == KIND_POINT and out[0].s.x == -160.0
    assert "Bad X value" in out[1].s.error
    assert "unsupported by the NTS" in out[2].s.error
    assert out[3].s.kind == KIND_RECT  # CcwRect demotion intact

    wrapped = df.select(SF.st_from_wkt(
        F.col("wkt"), dateline_rule="ccwRect", parser="ntsReader",
        norm_wrap_longitude=True).alias("s")).collect()
    assert wrapped[1].s.x == 120.0  # -240 wraps instead of erroring


# ---- randomized equivalence sweep: in-bounds, extension-free WKT ----

def test_randomized_equivalence_with_default():
    """On the shared (ISO, in-bounds) grammar subset the alt reader
    must agree with the default parser exactly — any divergence is a
    hook leak (xy_hook / iso_only must be no-ops there)."""
    import numpy as np

    rng = np.random.default_rng(1234)
    ctx_a = _ctx(datelineRule="width180")
    ctx_b = SpatialEngineContext.from_args({"datelineRule": "width180"})

    def rand_pts(n):
        xs = rng.uniform(-179, 179, n).round(6)
        ys = rng.uniform(-89, 89, n).round(6)
        return ", ".join(f"{a} {b}" for a, b in zip(xs, ys))

    wkts = []
    for _ in range(40):
        wkts.append(f"POINT({rand_pts(1)})")
        wkts.append(f"LINESTRING({rand_pts(4)})")
        wkts.append(f"MULTIPOINT({rand_pts(3)})")
        # closed convex-ish ring around a random center
        cx, cy = rng.uniform(-170, 170), rng.uniform(-80, 80)
        angs = np.sort(rng.uniform(0, 2 * np.pi, 5))
        r = rng.uniform(0.5, 4.0)
        ring = [(round(cx + r * np.cos(a), 6), round(cy + r * np.sin(a), 6))
                for a in angs]
        ring.append(ring[0])
        wkts.append("POLYGON((" + ", ".join(f"{a} {b}" for a, b in ring)
                    + "))")

    def canon(rec):
        out = {}
        for k, v in rec.items():
            if isinstance(v, float) and math.isnan(v):
                out[k] = "nan"
            elif isinstance(v, list):
                out[k] = [canon(m) if isinstance(m, dict) else m for m in v]
            else:
                out[k] = v
        return out

    for w in wkts:
        a = ctx_a.parse_wkt(w)
        b = ctx_b.parse_wkt(w)
        assert canon(a) == canon(b), w


def test_columns_fast_path_equals_per_string_loop():
    """The vectorized POINT fast path in parse_ntsreader_columns must
    agree exactly with parse_shape_ntsreader on wrap, bounds errors,
    and values — for both wrap modes."""
    import numpy as np

    from spatial4n_spark.kernels.wkt import (parse_ntsreader_columns,
                                             parse_shape_ntsreader)

    batch = ["POINT(10.5 20.25)", "POINT(-240 20)", "POINT(181 0)", None,
             "POINT(0 95)", "POINT(0 -95)", "POINT(-180 90)",
             "LINESTRING(0 0, 5 5)", "ENVELOPE(10, 20, 40, 30)"]
    for nwl in (False, True):
        cols = parse_ntsreader_columns(batch, norm_wrap_longitude=nwl)
        for i, w in enumerate(batch):
            if w is None:
                assert cols["error"][i] == "null"
                continue
            try:
                rec = parse_shape_ntsreader(w, norm_wrap_longitude=nwl)
            except Exception as e:
                assert cols["error"][i] is not None, (nwl, w)
                assert cols["error"][i][:20] == str(e)[:20], (nwl, w)
                continue
            assert cols["error"][i] is None, (nwl, w, cols["error"][i])
            assert cols["kind"][i] == rec["kind"], (nwl, w)
            if not np.isnan(rec["x"]):
                assert (cols["x"][i], cols["y"][i]) == (rec["x"], rec["y"])
