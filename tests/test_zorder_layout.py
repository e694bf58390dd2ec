"""Z-order clustered layout: correctness, pushdown, and provable
file-level skippability from parquet footer stats."""
import glob
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

BBOX = (12.0, 18.0, 40.0, 46.0)  # minx, maxx, miny, maxy (6x6 deg)


@pytest.fixture(scope="module")
def zpath(spark, tmp_path_factory):
    from spatial4n_spark.sources.zorder import write_zordered
    pts = (spark.range(200_000)
           .select("id",
                   (F.pmod(F.col("id") * 7919, F.lit(360_000)) / 1000.0 - 180.0).alias("x"),
                   (F.pmod(F.col("id") * 104729, F.lit(170_000)) / 1000.0 - 85.0).alias("y")))
    path = str(tmp_path_factory.mktemp("zorder") / "pts")
    write_zordered(pts, path, precision=6, n_files=16)
    return path


def test_read_bbox_matches_bruteforce(spark, zpath):
    from spatial4n_spark.sources.zorder import read_bbox
    minx, maxx, miny, maxy = BBOX
    got = {r["id"] for r in
           read_bbox(spark, zpath, minx, maxx, miny, maxy,
                     stored_precision=6).select("id").collect()}
    raw = spark.read.parquet(zpath)
    want = {r["id"] for r in raw.where(
        (F.col("x") >= minx) & (F.col("x") <= maxx)
        & (F.col("y") >= miny) & (F.col("y") <= maxy)).select("id").collect()}
    assert got == want and len(want) > 50


def test_code_predicate_reaches_parquet_scan(spark, zpath):
    from spatial4n_spark.sources.zorder import read_bbox
    df = read_bbox(spark, zpath, *BBOX, stored_precision=6)
    plan = df._jdf.queryExecution().executedPlan().toString()
    i = plan.find("PushedFilters")
    assert i >= 0
    assert "cell_id" in plan[i:i + 2000], plan[i:i + 2000]


def test_range_count_is_bounded_for_any_bbox():
    """The predicate builder must never emit an unbounded OR chain
    (a 630-leg left-deep Column tree overflows the converter stack)."""
    from spatial4n_spark.sources.zorder import bbox_code_ranges
    for bbox in [(12.0, 18.0, 40.0, 46.0),      # mid-size
                 (-180.0, 180.0, -90.0, 90.0),  # world
                 (0.0, 0.01, 0.0, 0.01),        # tiny
                 (-179.0, 179.0, -1.0, 1.0)]:   # long thin band
        ranges = bbox_code_ranges(*bbox, stored_precision=6, max_ranges=32)
        assert 1 <= len(ranges) <= 32, (bbox, len(ranges))
        for (a, b), (c, d) in zip(ranges, ranges[1:]):
            assert a <= b and b < c  # sorted, disjoint


def test_files_are_disjoint_and_bbox_touches_few(zpath):
    """Footer stats prove the skip: files' cell_id ranges are pairwise
    disjoint (range partitioner), and the bbox predicate intersects
    only a small fraction of them — the reader never opens the rest."""
    pq = pytest.importorskip("pyarrow.parquet")
    from spatial4n_spark.sources.zorder import bbox_code_ranges

    ranges = []
    for f in glob.glob(os.path.join(zpath, "part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        lo = hi = None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                col = md.row_group(rg).column(ci)
                if col.path_in_schema == "cell_id":
                    st = col.statistics
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
        ranges.append((lo, hi))
    assert len(ranges) >= 8
    ranges.sort()
    for (a_lo, a_hi), (b_lo, b_hi) in zip(ranges, ranges[1:]):
        assert a_hi <= b_lo  # pairwise disjoint (boundary may touch)

    legs = bbox_code_ranges(*BBOX, stored_precision=6)
    touched = sum(1 for lo, hi in ranges
                  if any(not (hi < llo or lo > lhi) for llo, lhi in legs))
    assert touched <= len(ranges) // 4, (touched, len(ranges))


def test_clustered_scan_reads_small_fraction(spark, zpath):
    """Row-group pruning measured on the SAME executed plan: the scan
    node's numOutputRows (rows actually decoded off disk) must be a
    small fraction of the table for a city-size bbox."""
    from spatial4n_spark.sources.zorder import read_bbox

    df = read_bbox(spark, zpath, *BBOX, stored_precision=6)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()
    rows = []

    def walk(node):
        if "Scan" in node.nodeName():
            it = node.metrics().iterator()
            while it.hasNext():
                kv = it.next()
                if kv._1() == "numOutputRows":
                    rows.append(kv._2().value())
        for i in range(node.children().size()):
            walk(node.children().apply(i))
    walk(plan)
    assert rows, "no scan metric found"
    # at 16 files x ~12.5k rows the prune granularity is 1-2 files
    # (~25k rows); at production file counts the fraction tracks
    # bbox_area/world_area (scripts/bench_zorder.py: 0.4% at 64 files)
    assert sum(rows) <= 200_000 * 0.20, rows  # >=80% of rows never decoded


def test_read_shape_polygon_and_circle(spark, zpath):
    """read_shape (pruned scan + closure refine) == local kernel over
    the full table, for a polygon and a circle."""
    import numpy as np
    from spatial4n_spark.kernels.pip import points_in_polygon
    from spatial4n_spark.kernels.relate_circle import relate_circle_point
    from spatial4n_spark.kernels.relation import CONTAINS
    from spatial4n_spark.kernels.wkt import parse_shape
    from spatial4n_spark.sources.zorder import read_shape

    raw = spark.read.parquet(zpath).select("id", "x", "y").collect()
    ids = np.array([r["id"] for r in raw])
    xs = np.array([r["x"] for r in raw])
    ys = np.array([r["y"] for r in raw])

    poly = "POLYGON((10 38, 25 38, 18 50, 10 38))"
    rec = parse_shape(poly)
    inside = points_in_polygon(xs, ys, np.asarray(rec["xs"]),
                               np.asarray(rec["ys"]), rec["ring_offsets"])
    want = set(ids[inside].tolist())
    got = {r["id"] for r in read_shape(spark, zpath, poly,
                                       stored_precision=6).select("id").collect()}
    assert got == want and len(want) > 20

    circle = "BUFFER(POINT(17 44), 5)"
    rec = parse_shape(circle)
    rel = relate_circle_point(np.full(len(xs), rec["x"]),
                              np.full(len(xs), rec["y"]),
                              np.full(len(xs), rec["radius"]), xs, ys, geo=True)
    want = set(ids[rel == CONTAINS].tolist())
    got = {r["id"] for r in read_shape(spark, zpath, circle,
                                       stored_precision=6).select("id").collect()}
    assert got == want and len(want) > 20


def test_no_false_negative_pruning_property():
    """THE safety invariant of the layout: every point inside the bbox
    has its stored-level code inside one of the pushed ranges — a
    violation would silently DROP rows at the scan. Randomized sweep
    incl. dateline-crossing query boxes."""
    import numpy as np
    from spatial4n_spark.kernels.geohash import cell_code
    from spatial4n_spark.sources.zorder import bbox_code_ranges

    rng = np.random.RandomState(23)
    for trial in range(200):
        if trial % 5 == 0:  # dateline-crossing box
            minx = rng.uniform(150, 179)
            maxx = rng.uniform(-179, -150)
        else:
            minx, maxx = sorted(rng.uniform(-180, 180, 2))
        miny, maxy = sorted(rng.uniform(-90, 90, 2))
        ranges = bbox_code_ranges(minx, maxx, miny, maxy,
                                  stored_precision=6, max_ranges=32)
        assert ranges
        # sample interior points (wrap-aware for crossing boxes)
        if minx <= maxx:
            lons = rng.uniform(minx, maxx, 50)
        else:
            raw = rng.uniform(minx, maxx + 360.0, 50)
            lons = np.where(raw > 180.0, raw - 360.0, raw)
        lats = rng.uniform(miny, maxy, 50)
        codes = cell_code(lats, lons, 6)
        for c in codes:
            assert any(lo <= c <= hi for lo, hi in ranges), \
                (minx, maxx, miny, maxy, int(c))


def test_read_bbox_dateline_crossing(spark, zpath):
    """A query box wrapping +-180 (minx > maxx) returns exactly the
    wrap-aware brute-force rows."""
    from spatial4n_spark.sources.zorder import read_bbox
    minx, maxx, miny, maxy = 170.0, -165.0, -20.0, 20.0
    got = {r["id"] for r in
           read_bbox(spark, zpath, minx, maxx, miny, maxy,
                     stored_precision=6).select("id").collect()}
    raw = spark.read.parquet(zpath)
    want = {r["id"] for r in raw.where(
        ((F.col("x") >= minx) | (F.col("x") <= maxx))
        & (F.col("y") >= miny) & (F.col("y") <= maxy)).select("id").collect()}
    assert got == want and len(want) > 50


def test_read_shape_dateline_polygon(spark, zpath):
    """A dateline-crossing polygon (parser page-splits it; bbox wraps)
    scans both sides of +-180 and refines exactly."""
    import numpy as np
    from spatial4n_spark.kernels.pip import points_in_polygon
    from spatial4n_spark.kernels.wkt import parse_shape
    from spatial4n_spark.sources.zorder import read_shape

    wkt = "POLYGON((170 -15, -168 -15, -172 18, 170 -15))"
    rec = parse_shape(wkt)
    assert rec["minx"] > rec["maxx"]  # crossing bbox

    raw = spark.read.parquet(zpath).select("id", "x", "y").collect()
    ids = np.array([r["id"] for r in raw])
    xs = np.array([r["x"] for r in raw])
    ys = np.array([r["y"] for r in raw])
    inside = points_in_polygon(xs, ys, np.asarray(rec["xs"]),
                               np.asarray(rec["ys"]), rec["ring_offsets"])
    want = set(ids[inside].tolist())
    got = {r["id"] for r in read_shape(spark, zpath, wkt,
                                       stored_precision=6).select("id").collect()}
    assert got == want and len(want) > 10


def test_bbox_code_ranges_precision_one():
    """Regression (ADVICE r03): stored_precision=1 must still produce
    covering ranges (shift=0 is a valid cover level) — an empty list
    makes bbox_code_predicate lit(False) and silently drops every row."""
    from spatial4n_spark.kernels.geohash import cell_code
    from spatial4n_spark.sources.zorder import bbox_code_ranges

    ranges = bbox_code_ranges(-10.0, 10.0, -10.0, 10.0, stored_precision=1)
    assert ranges, "precision-1 layout must not return zero ranges"
    # the bbox's own cells are inside the returned ranges
    import numpy as np
    code = int(cell_code(np.array([0.0]), np.array([0.0]), 1)[0])
    assert any(lo <= code <= hi for lo, hi in ranges)
