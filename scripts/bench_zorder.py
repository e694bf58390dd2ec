"""Z-order clustered scan vs unclustered scan, same bbox query.

Writes the same 20M-point table twice — z-ordered (range-partitioned +
sorted by cell code) and shuffled-random — and times the identical
bbox query on both. The clustered layout answers from the few files /
row groups whose code range intersects the bbox; the random layout
reads everything and filters.

Run: python scripts/bench_zorder.py [n_points] [cpus]
"""
from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
CPUS = int(sys.argv[2]) if len(sys.argv) > 2 else 16
BBOX = (12.0, 18.0, 40.0, 46.0)


def main() -> None:
    from pyspark.sql import functions as F

    from spatial4n_spark.sources.zorder import read_bbox, write_zordered
    from spatial4n_spark.session import get_spark

    spark = get_spark("bench-zorder", cpus=CPUS)
    spark.sparkContext.setLogLevel("ERROR")

    base = "/tmp/bench_zorder"
    shutil.rmtree(base, ignore_errors=True)
    pts = (spark.range(N)
           .select("id",
                   (F.pmod(F.col("id") * 7919, F.lit(360_000)) / 1000.0 - 180.0).alias("x"),
                   (F.pmod(F.col("id") * 104729, F.lit(170_000)) / 1000.0 - 85.0).alias("y")))
    write_zordered(pts, f"{base}/clustered", precision=6, n_files=64)
    # identical rows + identical cell_id column, but hash-shuffled layout
    (spark.read.parquet(f"{base}/clustered")
        .repartition(64, F.col("id"))
        .write.mode("overwrite").parquet(f"{base}/random"))

    minx, maxx, miny, maxy = BBOX
    exact = ((F.col("x") >= minx) & (F.col("x") <= maxx)
             & (F.col("y") >= miny) & (F.col("y") <= maxy))

    def scan_rows(df):
        """Execute df and return the scan node's numOutputRows — the
        rows that actually came off disk after row-group pruning. At
        local scale wall clock is job-overhead-bound (the whole table
        fits in page cache); rows-read is the metric that scales."""
        out = []
        df.collect()
        plan = df._jdf.queryExecution().executedPlan()

        def walk(node):
            if "Scan" in node.nodeName():
                it = node.metrics().iterator()
                while it.hasNext():
                    kv = it.next()
                    if kv._1() == "numOutputRows":
                        out.append(kv._2().value())
            for i in range(node.children().size()):
                walk(node.children().apply(i))
        walk(plan)
        return sum(out)

    def timed(fn):
        best = None
        for _ in range(3):
            t0 = time.time()
            n = fn()
            sec = time.time() - t0
            best = sec if best is None else min(best, sec)
        return n, best

    n1, t1 = timed(lambda: read_bbox(spark, f"{base}/clustered",
                                     *BBOX, stored_precision=6).count())
    n2, t2 = timed(lambda: spark.read.parquet(f"{base}/random")
                   .where(exact).count())
    assert n1 == n2, (n1, n2)
    r1 = scan_rows(read_bbox(spark, f"{base}/clustered", *BBOX,
                             stored_precision=6))
    r2 = scan_rows(spark.read.parquet(f"{base}/random").where(exact))
    print(f"result rows={n1}")
    print(f"clustered : {t1:.2f}s  scan-rows={r1}")
    print(f"random    : {t2:.2f}s  scan-rows={r2}")
    print(f"rows-read reduction: {r2 / max(r1, 1):.0f}x")


if __name__ == "__main__":
    main()
