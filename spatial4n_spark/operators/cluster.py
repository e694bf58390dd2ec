"""Grid-density hotspot clustering (cell-DBSCAN / STING-style).

Engine-added operator: "where are the hotspots?" over billions of
points — density clustering with the grid cell as the density unit,
entirely out of existing engine parts:

  1. cell-assign every point (pure-Column Morton, zero Python);
  2. per-cell counts (ONE hash aggregate, map-side partial combine) —
     cells with count >= min_count are DENSE;
  3. adjacency edges between dense cells (8-neighborhood, longitude
     wraps at ±180) via a self-equi-join of the small dense-cell table
     on neighbor indices — JVM only;
  4. `connected_components` (operators/components.py) labels the dense
     cells; clusters = components;
  5. points join back to their cell's label; points in sparse cells
     come out with cluster_id NULL (noise), like DBSCAN's noise class.

Relationship to DBSCAN(eps, minPts): with cell width w, any two points
in 8-adjacent dense cells are within eps = w*sqrt(8) planar degrees;
the classic trade of exact eps-balls for grid blocks (STING/GriDBSCAN)
— the variant that runs as two shuffles at any scale, with no
all-pairs stage anywhere. Cluster granularity = the cell grid.

Scale shape: shuffle 1 = the per-cell count (combine-heavy, skew-safe:
a hot cell is ONE row after partial aggregation); shuffle 2+ = the CC
rounds over the dense-cell graph, whose size is bounded by the number
of DENSE CELLS (<= 32^precision, independent of row count); the final
label join broadcasts that small table back onto the points.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components


def grid_cluster(points: DataFrame, x: str, y: str, precision: int,
                 min_count: int,
                 out_col: str = "cluster_id",
                 stage_dir: str | None = None,
                 local_cc_cap: int = 1_000_000,
                 max_iter: int = 64) -> DataFrame:
    """Label each input row with the id of its density cluster (min
    dense-cell code in the component) or NULL for noise. See module
    docstring for semantics and the scale shape.

    Component labeling: the dense-cell graph is COUNTED first (one
    cheap aggregate over an already-small table); at or below
    `local_cc_cap` cells it is collected and labeled with a driver
    union-find — O(1) Spark rounds, immune to component diameter, and
    the labels table is provably broadcast-size. Above the cap the
    distributed min-label `connected_components` runs with `max_iter`
    rounds (O(diameter) — a corridor-shaped hotspot 100 cells long
    needs 100 rounds; raise `max_iter`/`stage_dir` accordingly) and
    the label join is left to AQE (no forced broadcast)."""
    from .. import functions as SF

    reserved = {"__ix", "__iy", "__cell", out_col}
    clash = reserved.intersection(points.columns)
    if clash:
        raise ValueError(
            f"grid_cluster: input columns collide with outputs: "
            f"{sorted(clash)} — rename them (or pass a different "
            f"out_col) first")

    nbits = precision * 5
    lon_n = 1 << ((nbits + 1) // 2)
    lat_n = 1 << (nbits // 2)

    pts = (points.withColumn("__ix", SF.st_axis_idx_col(
                     f"`{x}`", "lon", precision))
                 .withColumn("__iy", SF.st_axis_idx_col(
                     f"`{y}`", "lat", precision)))
    dense = (pts.groupBy("__ix", "__iy").count()
                .where(F.col("count") >= min_count)
                .select("__ix", "__iy"))
    dense = dense.withColumn(
        "__cell", SF.st_morton_col("`__ix`", "`__iy`", precision))

    n_dense = dense.count()
    if n_dense <= local_cc_cap:
        labels_df = _local_labels(dense, lon_n, lat_n, points.sparkSession)
        labels_df = F.broadcast(labels_df)  # provably <= local_cc_cap rows
    else:
        # 8-neighborhood: each dense cell emits its neighbor INDEX
        # pairs (lon wraps, lat clamps); a self-equi-join on the
        # emitted indices yields exactly the adjacent dense pairs.
        offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
                if (dx, dy) != (0, 0)]
        nbr = dense.select(
            F.col("__cell").alias("__a"),
            F.explode(F.array(*[
                F.struct(
                    F.pmod(F.col("__ix") + F.lit(dx), F.lit(lon_n))
                     .alias("nx"),
                    (F.col("__iy") + F.lit(dy)).alias("ny"))
                for dx, dy in offs])).alias("__n"))
        nbr = (nbr.select("__a", F.col("__n.nx").alias("__nx"),
                          F.col("__n.ny").alias("__ny"))
                  .where((F.col("__ny") >= 0) & (F.col("__ny") < lat_n)))
        edges = (nbr.join(dense.select(F.col("__ix").alias("__nx"),
                                       F.col("__iy").alias("__ny"),
                                       F.col("__cell").alias("__b")),
                          ["__nx", "__ny"], "inner")
                    .select("__a", "__b")
                    .where(F.col("__a") < F.col("__b")))
        labels_df = connected_components(
            edges, src="__a", dst="__b",
            vertices=dense.select(F.col("__cell").alias("node")),
            max_iter=max_iter, stage_dir=stage_dir)
        # labels size is bounded only by the dense-cell count here:
        # leave join strategy to the optimizer/AQE
    labels_df = (labels_df.withColumnRenamed("node", "__cell")
                          .withColumnRenamed("label", out_col))

    pts = pts.withColumn(
        "__cell", SF.st_morton_col("`__ix`", "`__iy`", precision))
    return (pts.join(labels_df, "__cell", "left")
               .drop("__cell", "__ix", "__iy"))


def _local_labels(dense: DataFrame, lon_n: int, lat_n: int, spark):
    """Driver union-find over a bounded dense-cell set: one pass, no
    per-round shuffles, immune to component diameter."""
    rows = dense.collect()
    idx = {(r["__ix"], r["__iy"]): r["__cell"] for r in rows}
    parent: dict = {c: c for c in idx.values()}

    def find(a):
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    for (ix, iy), cell in idx.items():
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                if (dx, dy) == (0, 0):
                    continue
                nb = idx.get(((ix + dx) % lon_n, iy + dy))
                if nb is not None:
                    ra, rb = find(cell), find(nb)
                    if ra != rb:
                        parent[max(ra, rb)] = min(ra, rb)
    out = [(c, find(c)) for c in idx.values()]
    return spark.createDataFrame(out, "node long, label long")
