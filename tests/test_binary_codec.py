"""Binary codec: golden byte layout (BinaryCodec.cs: type byte +
little-endian doubles; collection = 0x04 0x00 int32 + nested) and
round-trips incl. error paths."""
import struct

import pytest

from spatial4n_spark.kernels import binary as B
from spatial4n_spark.kernels.wkt import WktParseError, parse_shape


def test_point_golden_bytes():
    b = B.write_shape(parse_shape("POINT (1.5 -2.25)"))
    assert b == bytes([1]) + struct.pack("<dd", 1.5, -2.25)
    r = B.read_shape(b)
    assert (r["x"], r["y"]) == (1.5, -2.25)


def test_rect_golden_bytes():
    b = B.write_shape(parse_shape("ENVELOPE (10, 20, 8, 4)"))
    # order per WriteRect: minX, maxX, minY, maxY
    assert b == bytes([2]) + struct.pack("<dddd", 10.0, 20.0, 4.0, 8.0)
    r = B.read_shape(b)
    assert (r["minx"], r["maxx"], r["miny"], r["maxy"]) == (10.0, 20.0, 4.0, 8.0)


def test_circle_golden_bytes():
    b = B.write_shape(parse_shape("BUFFER(POINT(3 4), 5.5)"))
    assert b == bytes([3]) + struct.pack("<ddd", 3.0, 4.0, 5.5)
    assert B.read_shape(b)["radius"] == 5.5


def test_collection_roundtrip():
    gc = parse_shape("GEOMETRYCOLLECTION (POINT (1 2), ENVELOPE (0, 5, 4, 1))")
    b = B.write_shape(gc)
    assert b[0] == 4 and b[1] == 0
    assert struct.unpack_from("<i", b, 2)[0] == 2
    r = B.read_shape(b)
    assert [m["kind"] for m in r["members"]] == [1, 2]
    assert (r["minx"], r["maxx"]) == (0.0, 5.0)


def test_errors():
    with pytest.raises(WktParseError, match="Unsupported shape byte"):
        B.read_shape(bytes([9]) + b"\x00" * 16)
    with pytest.raises(WktParseError, match="trailing"):
        B.read_shape(B.write_shape(parse_shape("POINT (1 2)")) + b"\x00")
    # geometry kinds now round-trip via the WKB branch (round 2); only a
    # truly unknown kind is rejected
    with pytest.raises(WktParseError, match="unsupported shape kind"):
        B.write_shape({"kind": 42})


def test_multipolygon_hole_nesting_in_wkb():
    """ADVICE r02 (medium): a multipolygon's hole rings must be encoded
    as interior rings of their part's WKB polygon, not standalone
    filled polygons — an external WKB reader must see the hole."""
    mp = parse_shape(
        "MULTIPOLYGON(((0 0, 10 0, 10 10, 0 10, 0 0),"
        "(2 2, 8 2, 8 8, 2 8, 2 2)), ((20 0, 30 0, 25 8, 20 0)))")
    b = B.write_shape(mp)
    # layout: type byte 5, then WKB: order byte + multipolygon(6) + n=2
    assert b[0] == 5 and b[1] == 1
    assert struct.unpack_from("<I", b, 2)[0] == 6
    assert struct.unpack_from("<I", b, 6)[0] == 2  # two PARTS, not three
    # part 1: polygon with 2 rings (shell + hole)
    assert b[10] == 1
    assert struct.unpack_from("<I", b, 11)[0] == 3  # polygon type
    assert struct.unpack_from("<I", b, 15)[0] == 2  # nrings
    # round-trip preserves even-odd semantics
    r = B.read_shape(b)
    import numpy as np

    from spatial4n_spark.kernels.pip import points_in_polygon
    inside = points_in_polygon(
        np.array([1.0, 5.0, 25.0]), np.array([1.0, 5.0, 2.0]),
        np.array(r["xs"]), np.array(r["ys"]), np.array(r["ring_offsets"]))
    assert list(inside) == [True, False, True]


def test_multipolygon_no_holes_wkb_unchanged():
    mp = parse_shape(
        "MULTIPOLYGON(((0 0, 4 0, 2 3, 0 0)), ((10 0, 14 0, 12 3, 10 0)))")
    b = B.write_shape(mp)
    assert struct.unpack_from("<I", b, 6)[0] == 2
    r = B.read_shape(b)
    assert len(r["ring_offsets"]) - 1 == 2
