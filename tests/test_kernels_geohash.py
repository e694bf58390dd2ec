"""Geohash fixtures. Source: Spatial4n.Tests/util/TestGeohashUtils.cs:33-126."""
import numpy as np
import pytest

from spatial4n_spark.kernels import geohash as gh


def test_known_encodings():
    assert gh.encode([42.6], [-5.6], 12)[0] == "ezs42e44yx96"
    assert gh.encode([57.64911], [10.40744], 12)[0] == "u4pruydqqvj8"
    assert gh.encode([52.3738007], [4.8909347], 12)[0] == "u173zq37x014"


def test_encode_prefix_property():
    # shorter precision is a prefix of longer
    full = gh.encode([42.6], [-5.6], 12)[0]
    for p in range(1, 12):
        assert gh.encode([42.6], [-5.6], p)[0] == full[:p]


def test_decode_encode_roundtrip():
    # decode(encode(p)) within 1e-5 (TestGeohashUtils :60-77)
    rng = np.random.RandomState(42)
    lat = rng.uniform(-90, 90, 1000)
    lon = rng.uniform(-180, 180, 1000)
    hashes = gh.encode(lat, lon, 12)
    cx, cy = gh.decode_point(hashes)
    np.testing.assert_allclose(cy, lat, atol=1e-5)
    np.testing.assert_allclose(cx, lon, atol=1e-5)
    # re-encoding the center gives the same hash
    assert (gh.encode(cy, cx, 12) == hashes).all()


def test_decode_boundary_contains_point():
    lat, lon = 42.6, -5.6
    h = gh.encode([lat], [lon], 9)
    minx, maxx, miny, maxy = gh.decode_boundary(h)
    assert minx[0] <= lon <= maxx[0]
    assert miny[0] <= lat <= maxy[0]


def test_cell_sizes():
    # len 3 -> 1.40625 x 1.40625; len 4 -> 0.17578125 x 0.3515625 (:109-126)
    lat_h, lon_w = gh.lookup_degrees_size_for_hash_len(3)
    assert lat_h == pytest.approx(1.40625)
    assert lon_w == pytest.approx(1.40625)
    lat_h, lon_w = gh.lookup_degrees_size_for_hash_len(4)
    assert lat_h == pytest.approx(0.17578125)
    assert lon_w == pytest.approx(0.3515625)


def test_lookup_hash_len():
    assert gh.lookup_hash_len_for_width_height(999, 999) == 1
    assert gh.lookup_hash_len_for_width_height(999, 46) == 1
    assert gh.lookup_hash_len_for_width_height(44, 999) == 2
    assert gh.lookup_hash_len_for_width_height(999, 44) == 2
    assert gh.lookup_hash_len_for_width_height(999, 5.7) == 2
    assert gh.lookup_hash_len_for_width_height(999, 5.5) == 3
    assert gh.lookup_hash_len_for_width_height(999, 999e-20) == 24
    assert gh.lookup_hash_len_for_width_height(999e-20, 999) == 24


def test_sub_cells_sorted():
    subs = gh.sub_cells("u")
    assert len(subs) == 32
    assert subs == sorted(subs)
    assert subs[0] == "u0" and subs[-1] == "uz"


def test_mixed_length_decode():
    minx, maxx, miny, maxy = gh.decode_boundary(np.array(["u", "u4pruydqqvj8", "ezs42"]))
    assert maxx[0] - minx[0] == pytest.approx(45.0)
    assert maxx[1] - minx[1] < 1e-6


def test_cell_code_matches_encode():
    rng = np.random.RandomState(5)
    lat = rng.uniform(-90, 90, 500)
    lon = rng.uniform(-180, 180, 500)
    for p in (2, 5, 7):
        codes = gh.cell_code(lat, lon, p)
        # same code <=> same geohash string cell
        strs = gh.encode(lat, lon, p)
        m = {}
        for c, s in zip(codes.tolist(), strs.tolist()):
            assert m.setdefault(c, s) == s
        # code de-interleaves to the string via indices_to_hash
        nbits = p * 5
        lon_bits = (nbits + 1) // 2
        li = np.zeros(len(codes), dtype=np.int64)
        ti = np.zeros(len(codes), dtype=np.int64)
        for b in range(nbits):
            bit = (codes >> (nbits - 1 - b)) & 1
            if b % 2 == 0:
                li = (li << 1) | bit
            else:
                ti = (ti << 1) | bit
        assert (gh.indices_to_hash(li, ti, p) == strs).all()


def test_cover_codes_match_cover_cells():
    cases = [(10.0, 10.5, 45.0, 45.3), (179.5, -179.5, 0.0, 0.5), (-30.0, 20.0, -10.0, 5.0)]
    for (mnx, mxx, mny, mxy) in cases:
        cells = gh.cover_cells_bbox(mnx, mxx, mny, mxy, 4)
        codes = gh.cover_codes_bbox(mnx, mxx, mny, mxy, 4)
        assert len(cells) == len(codes)
        # centers of decoded cells re-encode to the same codes
        minx, maxx, miny, maxy = gh.decode_boundary(np.array(cells))
        cx, cy = (minx + maxx) / 2, (miny + maxy) / 2
        assert sorted(gh.cell_code(cy, cx, 4).tolist()) == sorted(codes)
