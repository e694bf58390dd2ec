"""Scaling-efficiency bench: the flagship spatial-join + tile-assignment
job at two parallelism levels on the IDENTICAL materialized input — the
sandbox proxy for the north rule's "N vs 4N executors with scaling
efficiency >= 0.8".

Protocol (steady-state): each level runs in its own subprocess (fresh
JVM), does 2 full warmup passes (JVM C2 + Arrow paths + Python workers),
then 3 timed passes; the minimum is reported. Early cold runs on this
sandbox vary up to 10x (hypervisor vCPU overcommit — see BENCH.md), so
anything but steady-state minimums is noise.

Levels default to 4 and 16: measured CPU/memory-bandwidth controls
(BENCH.md) show this VM schedules ~16 threads stably and saturates
~35 GB/s of memory bandwidth there; 32-thread runs oscillate 15s..55s
on identical work. 8/32 results are reported alongside in BENCH.md.

Usage:  python bench_scaling.py            # full report -> BENCH.md
        python bench_scaling.py --worker N # internal: one level
Env:    SPARK_GRAFT_SCALE_LEVELS="4,16"  SPARK_GRAFT_BENCH_DOCS=8000000
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

N_DOCS = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "8000000"))
DOCS_PATH = f"/tmp/spark_graft_bench_docs_{N_DOCS}"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
LEVELS = tuple(int(x) for x in
               os.environ.get("SPARK_GRAFT_SCALE_LEVELS", "4,16").split(","))
WARMUP_RUNS = 2
TIMED_RUNS = 3


def run_worker(cpus: int) -> None:
    from pyspark.sql import functions as F

    from spatial4n_spark import contract
    from spatial4n_spark.operators.joins import (point_in_shape_join,
                                                 with_point_cell)
    from spatial4n_spark.plans.strategy import plan_point_shape_join
    from spatial4n_spark.session import get_spark
    from spatial4n_spark.sources.docs import extract_point_spans, generate_docs

    spark = get_spark(f"bench-scaling-{cpus}", cpus=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    if not os.path.exists(DOCS_PATH + "/_SUCCESS"):
        generate_docs(spark, N_DOCS).write.mode("overwrite").parquet(DOCS_PATH)
    docs = spark.read.parquet(DOCS_PATH)
    rects = contract.nation_rects(spark, SF_DIR)
    plan = plan_point_shape_join(N_DOCS, 25, 34.0, 18.0, shape_kinds=(2,))

    def flagship() -> int:
        # JVM point fast path (BENCH.md round 2): no Python stage at all
        pts = extract_point_spans(docs).select("doc_id", "x", "y")
        pts = with_point_cell(pts, "x", "y", plan.precision)
        return point_in_shape_join(pts, rects, plan).count()

    rows = 0
    for _ in range(WARMUP_RUNS):
        rows = flagship()
    times = []
    for _ in range(TIMED_RUNS):
        t0 = time.time()
        rows = flagship()
        times.append(round(time.time() - t0, 2))
    best = min(times)
    print(json.dumps({"cpus": cpus, "sec": best, "all_timed": times,
                      "rows": rows,
                      "docs_per_sec": round(N_DOCS / best, 1)}))
    spark.stop()


def main() -> None:
    results = {}
    for cpus in LEVELS:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
            capture_output=True, text=True, timeout=3600)
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
        results[cpus] = json.loads(line)

    lo, hi = LEVELS
    eff = results[hi]["docs_per_sec"] / (results[lo]["docs_per_sec"] * (hi / lo))
    report = {
        "metric": "flagship spatial-join + tile-assignment scaling",
        "n_docs": N_DOCS,
        f"local[{lo}]": results[lo],
        f"local[{hi}]": results[hi],
        "speedup": round(results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"], 2),
        "scaling_efficiency": round(eff, 3),
        "target": 0.8,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        run_worker(int(sys.argv[2]))
    else:
        main()
