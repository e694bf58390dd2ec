"""Per-partition checkpoint/resume with lineage + row-count manifests.

North-rule requirement: engine jobs over the 10^12-doc table must be
resumable from a per-partition checkpoint carrying lineage and row-count
metrics. The unit of checkpointing is the *input partition*: the docs
table is written partitioned by a stable bucket column
(``bucket = pmod(xxhash64(doc_id), n_buckets)``) — the parquet-dir
analog of Iceberg's ``bucket(doc_id)`` partition transform (swap
``write_docs_bucketed`` for ``df.writeTo(tbl).partitionedBy(bucket(N,
"doc_id"))`` on a cluster with an Iceberg catalog; nothing downstream
changes).

A checkpointed run processes a *group* of buckets per Spark job
(partition-pruned scan — the bucket filter prunes whole directories /
Iceberg files, so a resume never rescans completed input), writes that
group's output under ``out/data/bucket=K/`` via dynamic partition
overwrite (idempotent on retry: a re-run of a failed group replaces
only its own bucket dirs), and then commits one manifest JSON per
bucket with an atomic tmp+rename. Row counts come from
``pyspark.sql.Observation`` — measured during the write action itself,
zero extra scans.

A restart calls the same function; buckets whose manifest matches the
current kernel version and input lineage are skipped.

Scale notes (100 TB target): bucket count is chosen at table-write time
(e.g. 4096 at 10^12 docs → ~250M docs/bucket); ``buckets_per_job``
trades recovery granularity against per-job scheduling overhead. All
driver-side loops are over *bucket groups* (a few thousand max), never
rows.
"""
from __future__ import annotations

import hashlib
import json
import os
import time
from dataclasses import asdict, dataclass
from typing import Callable

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def kernel_version() -> str:
    """Stable content hash of the engine package source.

    Recorded in every manifest: a resume after a kernel change must NOT
    skip buckets computed by older code (results could differ), so the
    manifest is only valid when versions match.
    """
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    h = hashlib.sha256()
    for dp, _, fs in sorted(os.walk(pkg_dir)):
        for f in sorted(fs):
            if f.endswith(".py"):
                with open(os.path.join(dp, f), "rb") as fh:
                    h.update(fh.read())
    return h.hexdigest()[:16]


def with_bucket(df: DataFrame, n_buckets: int, key: str = "doc_id") -> DataFrame:
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(F.col(key)), F.lit(n_buckets)).cast("int"))


def write_docs_bucketed(df: DataFrame, path: str, n_buckets: int = 16,
                        key: str = "doc_id") -> None:
    """Write the input table partitioned by the checkpoint bucket."""
    (with_bucket(df, n_buckets, key)
     .write.mode("overwrite").partitionBy(BUCKET_COL).parquet(path))


@dataclass
class Manifest:
    """Lineage + metrics for one completed input bucket."""
    bucket: int
    input_path: str          # lineage: where the rows came from
    input_rows: int
    output_rows: int
    kernel_version: str      # engine code that produced the output
    transform: str           # name of the transform fn (lineage)
    wall_s: float            # wall time of the containing job group
    completed_at: float
    n_buckets: int = 0       # bucketing scheme the run used (0 = legacy)


def _manifest_dir(out_path: str) -> str:
    return os.path.join(out_path, "_manifests")


def _manifest_file(out_path: str, bucket: int) -> str:
    return os.path.join(_manifest_dir(out_path), f"bucket={bucket}.json")


def _write_manifest(out_path: str, m: Manifest) -> None:
    os.makedirs(_manifest_dir(out_path), exist_ok=True)
    final = _manifest_file(out_path, m.bucket)
    tmp = final + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(asdict(m), fh)
    os.replace(tmp, final)  # atomic commit


def load_manifests(out_path: str) -> dict[int, Manifest]:
    d = _manifest_dir(out_path)
    out: dict[int, Manifest] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.startswith("bucket=") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                m = Manifest(**json.load(fh))
            out[m.bucket] = m
    return out


def pending_buckets(out_path: str, in_path: str, n_buckets: int,
                    kver: str | None = None,
                    transform_name: str | None = None) -> list[int]:
    """Buckets with no valid manifest. A manifest is only valid when
    its FULL identity matches the current run — kernel version, input
    lineage, transform name, and bucket count — so re-invoking the same
    out_path with a different job never silently skips another job's
    output."""
    kver = kver or kernel_version()
    done = load_manifests(out_path)

    def ok(m: Manifest) -> bool:
        # n_buckets == 0 is the legacy wildcard: manifests written
        # before the field existed deserialize to 0 and would otherwise
        # be invalidated en masse on upgrade (ADVICE r02) — the other
        # identity fields still gate them.
        return (m.kernel_version == kver
                and m.input_path == in_path
                and (m.n_buckets == n_buckets or m.n_buckets == 0)
                and (transform_name is None or m.transform == transform_name))
    return [b for b in range(n_buckets) if not (b in done and ok(done[b]))]


def run_checkpointed(spark: SparkSession, in_path: str, out_path: str,
                     transform: Callable[[DataFrame], DataFrame],
                     n_buckets: int, buckets_per_job: int = 4,
                     ) -> dict[str, object]:
    """Run ``transform`` over the bucketed input with per-bucket
    checkpointing; safe to re-invoke after any failure.

    ``transform`` must preserve the ``bucket`` column (it is both the
    output partition key and the per-bucket metric key).

    Returns a summary dict: buckets run/skipped, total rows, wall time.
    """
    # Manifest IO and the stale-dir pre-delete below use driver-local
    # filesystem calls; a remote URI (hdfs:///s3a://) would make
    # isdir() silently False and resurrect the stale-partition bug
    # (ADVICE r02). On a cluster, point out_path at a mounted/local
    # staging dir or swap the manifest+delete layer for the Hadoop
    # FileSystem API (Iceberg: overwritePartitions handles both).
    for p, nm in ((in_path, "in_path"), (out_path, "out_path")):
        scheme = p.split("://", 1)[0] if "://" in p else ""
        if scheme not in ("", "file"):
            raise ValueError(
                f"run_checkpointed {nm}={p!r}: non-local URI scheme "
                f"{scheme!r} is not supported by the local-FS manifest "
                "layer")
    kver = kernel_version()
    tname = getattr(transform, "__name__", "transform")
    todo = pending_buckets(out_path, in_path, n_buckets, kver, tname)
    skipped = n_buckets - len(todo)
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    total_in = total_out = 0
    t_start = time.time()
    src = spark.read.parquet(in_path)
    for g in range(0, len(todo), buckets_per_job):
        group = todo[g:g + buckets_per_job]
        t0 = time.time()
        # partition-pruned scan: only this group's bucket dirs are read
        part = src.where(F.col(BUCKET_COL).isin(group))

        in_obs = Observation(f"in_{group[0]}")
        out_obs = Observation(f"out_{group[0]}")
        per_bucket = [F.sum(F.when(F.col(BUCKET_COL) == b, 1).otherwise(0))
                      .alias(f"b{b}") for b in group]
        part = part.observe(in_obs, *per_bucket)
        result = transform(part)
        if BUCKET_COL not in result.columns:
            raise ValueError("transform must preserve the 'bucket' column")
        result = result.observe(out_obs, *per_bucket)

        # dynamic overwrite only replaces partitions PRESENT in the new
        # output: a re-run bucket that now yields 0 rows would leave its
        # stale dir behind while the fresh manifest says output_rows=0.
        # Drop the group's bucket dirs first so the write is a true
        # replace (the Iceberg analog is overwritePartitions / a
        # DELETE WHERE bucket IN (...) in the same transaction).
        import shutil
        for b in group:
            bdir = os.path.join(out_path, "data", f"{BUCKET_COL}={b}")
            if os.path.isdir(bdir):
                shutil.rmtree(bdir)
        (result.write.mode("overwrite").partitionBy(BUCKET_COL)
               .parquet(os.path.join(out_path, "data")))
        wall = time.time() - t0

        in_counts = in_obs.get
        out_counts = out_obs.get
        for b in group:
            m = Manifest(bucket=b, input_path=in_path,
                         input_rows=int(in_counts[f"b{b}"] or 0),
                         output_rows=int(out_counts[f"b{b}"] or 0),
                         kernel_version=kver, transform=tname,
                         wall_s=round(wall, 3), completed_at=time.time(),
                         n_buckets=n_buckets)
            _write_manifest(out_path, m)
            total_in += m.input_rows
            total_out += m.output_rows

    return {"buckets_run": len(todo), "buckets_skipped": skipped,
            "input_rows": total_in, "output_rows": total_out,
            "wall_s": round(time.time() - t_start, 3),
            "kernel_version": kver}


def read_output(spark: SparkSession, out_path: str) -> DataFrame:
    return spark.read.parquet(os.path.join(out_path, "data"))
