#!/usr/bin/env python
"""spark-submit entry point for the resumable tile-index job.

Local smoke:
    python scripts/tile_index_submit.py --generate 10000 \\
        --in /tmp/ti_docs --out /tmp/ti_out --buckets 16

Cluster:
    PKG=$(python -c 'import sys; sys.path.insert(0, "."); \\
          from spatial4n_spark.session import package_zip; print(package_zip())')
    spark-submit --py-files "$PKG" scripts/tile_index_submit.py \\
        --in <iceberg-or-parquet path> --out <path> --buckets 4096

The script never sets a master: spark-submit / the cluster manager
owns deployment. Re-running with the same --out resumes from the
per-bucket manifests.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in", dest="in_path", required=True)
    ap.add_argument("--out", dest="out_path", required=True)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--precision", type=int, default=6)
    ap.add_argument("--buckets-per-job", type=int, default=8)
    ap.add_argument("--generate", type=int, default=0,
                    help="synthesize N docs into --in first (smoke/demo)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from spatial4n_spark.checkpoint import write_docs_bucketed
    from spatial4n_spark.jobs.tile_index import run_tile_index_job
    from spatial4n_spark.session import package_zip

    spark = SparkSession.builder.appName("spatial4n-tile-index").getOrCreate()
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # workers already have the zip via --py-files
    spark.sparkContext.setLogLevel("WARN")

    if args.generate:
        from spatial4n_spark.sources.docs import generate_docs
        write_docs_bucketed(generate_docs(spark, args.generate),
                            args.in_path, args.buckets)

    summary = run_tile_index_job(spark, args.in_path, args.out_path,
                                 args.buckets, args.precision,
                                 args.buckets_per_job)
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
