"""Ports of the reference test files that had no direct analog yet:

- ShapeReadWriterTest.cs (legacy read/write: comma lat,lon points,
  `distance=` keyword, lat,lon circle centers, bare-radius circles)
- ShapeCollectionTest.cs TestBbox (half-world rect pairs -> WORLD
  longitude range, order-independent)
- BinaryCodecTest.cs TestPoint/TestRect/TestCircle exact WKT vectors
- LegacyShapeReadWriterFormat.WriteShape round-trip (legacy writer
  format "0.000000" -> reader)

No Spark needed — these are kernel-level vectors.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from spatial4n_spark.kernels import binary
from spatial4n_spark.kernels.extent import union_bboxes
from spatial4n_spark.kernels.wkt import (WktParseError, parse_legacy,
                                         parse_shape)


# --- ShapeReadWriterTest.cs:53-63 TestPoint -------------------------------

def test_legacy_point_forms():
    s = parse_legacy("10 20")
    assert (s["x"], s["y"]) == (10.0, 20.0)
    # comma means y,x (lat,lon) order
    for form in ("20,10", "20, 10"):
        p = parse_legacy(form)
        assert (p["x"], p["y"]) == (10.0, 20.0), form


# --- ShapeReadWriterTest.cs:65-73 TestRectangle ---------------------------

def test_legacy_rect():
    s = parse_legacy("-10 -20 10 20")
    assert (s["minx"], s["maxx"], s["miny"], s["maxy"]) == (-10.0, 10.0,
                                                            -20.0, 20.0)


# --- ShapeReadWriterTest.cs:75-96 TestCircle (+critical culture: the
# engine always parses with '.' decimals — pandas/CPython are
# culture-invariant, the de-DE trap cannot occur) ---------------------------

def test_legacy_circle_forms():
    want = (1.23, 4.56, 7.89)
    for form in ("Circle(1.23 4.56 distance=7.89)",
                 "CIRCLE( 4.56,1.23 d=7.89 )",
                 "Circle(1.23 4.56 d=7.89)",
                 "Circle(1.23 4.56 7.89)"):
        c = parse_legacy(form)
        assert (c["x"], c["y"], c["radius"]) == want, form


def test_legacy_error_paths():
    # LegacyShapeReadWriterFormat.cs error branches
    with pytest.raises(WktParseError, match="unknown arg"):
        parse_legacy("Circle(1 2 q=3)")
    with pytest.raises(WktParseError, match="Extra arguments"):
        parse_legacy("Circle(1 2 d=3 zz)")
    with pytest.raises(WktParseError, match="Only 4 numbers"):
        parse_legacy("1 2 3 4 5")
    with pytest.raises(WktParseError, match="Invalid latitude"):
        parse_legacy("91,10")
    with pytest.raises(WktParseError, match="Invalid longitude"):
        parse_legacy("Circle(3,270 d=1)")


# --- LegacyShapeReadWriterFormat.WriteShape (cs:58-97) round-trip ---------

def _write_legacy(rec) -> str:
    """WriteShape with the default "0.000000" format."""
    f = lambda v: "%.6f" % v  # noqa: E731
    if rec["kind"] == 1:
        return f"{f(rec['x'])} {f(rec['y'])}"
    if rec["kind"] == 2:
        return (f"{f(rec['minx'])} {f(rec['miny'])} "
                f"{f(rec['maxx'])} {f(rec['maxy'])}")
    if rec["kind"] == 3:
        return f"Circle({f(rec['x'])} {f(rec['y'])} d={f(rec['radius'])})"
    raise AssertionError(rec["kind"])


def test_legacy_write_then_read():
    for text in ("10 20", "-10 -20 10 20", "Circle(1.23 4.56 d=7.89)"):
        rec = parse_legacy(text)
        back = parse_legacy(_write_legacy(rec))
        for k in ("kind", "x", "y", "radius", "minx", "maxx", "miny", "maxy"):
            a, b = rec[k], back[k]
            assert (a == b) or (np.isnan(a) and np.isnan(b)), (text, k)


# --- ShapeCollectionTest.cs:34-53 TestBbox --------------------------------

@pytest.mark.parametrize("r1,r2", [
    ((-180.0, 180.0), (-180.0, 180.0)),
    ((-180.0, 0.0), (0.0, 180.0)),
    ((-90.0, 90.0), (90.0, -90.0)),
])
def test_collection_bbox_world(r1, r2):
    for pair in ((r1, r2), (r2, r1)):  # order-independent
        boxes = [(lo, hi, -10.0, 10.0) for lo, hi in pair]
        minx, maxx, miny, maxy = union_bboxes(boxes)
        # LongitudeRange.WORLD_180E180W
        assert (minx, maxx) == (-180.0, 180.0), pair
        assert (miny, maxy) == (-10.0, 10.0)


# --- BinaryCodecTest.cs:50-67 exact WKT vectors ---------------------------

@pytest.mark.parametrize("wkt", [
    "POINT(-10 80.3)",
    "ENVELOPE(-10, 180, 42.3, 0)",
    "BUFFER(POINT(-10 30), 5.2)",
])
def test_binary_codec_reference_vectors(wkt):
    rec = parse_shape(wkt)
    back = binary.read_shape(binary.write_shape(rec))
    for k in ("kind", "x", "y", "radius", "minx", "maxx", "miny", "maxy"):
        a, b = rec.get(k), back.get(k)
        if a is None and b is None:
            continue
        assert (a == b) or (np.isnan(a) and np.isnan(b)), (wkt, k)
