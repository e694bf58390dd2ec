"""SpatialContextFactory-analog tests, mirroring
Spatial4n.Tests/context/SpatialContextFactoryTest.cs."""
import numpy as np
import pytest

from spatial4n_spark.context import GEO, SpatialEngineContext


def test_default_is_geo_haversine():
    assert GEO.geo and GEO.calculator == "haversine"
    assert GEO.world_bounds == (-180.0, 180.0, -90.0, 90.0)


def test_cartesian_factory_args():
    # mirrors: geo=false => CartesianDistCalc (:61-62)
    ctx = SpatialEngineContext.from_args({"geo": "false"})
    assert not ctx.geo and ctx.calculator == "cartesian"
    # cartesian^2 + custom worldBounds (:67-68)
    ctx = SpatialEngineContext.from_args({
        "geo": "false", "distCalculator": "cartesian^2",
        "worldBounds": "ENVELOPE(-100, 75, 200, 0)"})
    assert ctx.calculator == "cartesian^2"
    assert ctx.world_bounds == (-100.0, 75.0, 0.0, 200.0)
    assert ctx.distance(0.0, 0.0, 3.0, 4.0) == 25.0  # squared


def test_geo_calculators_case_insensitive():
    for name in ("lawOfCosines", "vincentySphere", "HAVERSINE"):
        ctx = SpatialEngineContext.from_args({"geo": "true",
                                              "distCalculator": name})
        assert ctx.geo
    with pytest.raises(ValueError, match="Unknown calculator"):
        SpatialEngineContext.from_args({"distCalculator": "bogus"})


def test_norm_wrap_longitude():
    ctx = SpatialEngineContext.from_args({"normWrapLongitude": "true"})
    assert ctx.norm_wrap_longitude
    assert ctx.norm_x(190.0) == -170.0
    assert GEO.norm_x(190.0) == 190.0  # default: no wrap


def test_verify_bounds():
    GEO.verify_x(np.array([-180.0, 0.0, 180.0]))
    with pytest.raises(ValueError, match="Bad X"):
        GEO.verify_x(np.array([181.0]))
    with pytest.raises(ValueError, match="Bad Y"):
        GEO.verify_y(np.array([-91.0]))


def test_read_shape_legacy_then_wkt():
    p = GEO.read_shape("10 20")              # legacy point
    assert (p["x"], p["y"]) == (10.0, 20.0)
    r = GEO.read_shape("-10 20 30 40")       # legacy rect
    assert (r["minx"], r["miny"], r["maxx"], r["maxy"]) == (-10.0, 20.0, 30.0, 40.0)
    w = GEO.read_shape("POINT (1.5 2.5)")    # falls through to WKT
    assert (w["x"], w["y"]) == (1.5, 2.5)


def test_distance_matches_kernel():
    from spatial4n_spark.kernels.distance import geo_distance_deg
    got = GEO.distance(10.0, 20.0, 30.0, 40.0)
    want = geo_distance_deg(10.0, 20.0, 30.0, 40.0, "haversine")
    assert got == want
