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
