"""spatial4n_spark — a PySpark-native spatial-join + tiling engine.

A brand-new engine (not a port) whose geometry semantics match the
Spatial4n shape algebra (reference: synhershko/Spatial4n, read-only at
/root/reference): INTERSECTS / CONTAINS / WITHIN / DISJOINT relate
predicates, haversine / law-of-cosines / vincenty spherical distance,
geohash tiling, and WKT parsing — re-expressed as vectorized NumPy
kernels wrapped in pandas/Arrow UDFs over Spark DataFrames, driving
distributed cell-index spatial joins, tile-cover assignment, kNN, and
raster<->vector zonal extraction.

Layout:
  kernels/    pure NumPy kernels (no Spark imports) — unit-testable alone
  functions/  pandas-UDF / Column-expression wrappers (the "st_*" surface)
  operators/  distributed operators: spatial joins, kNN, dedup, ANN, text
  sources/    synthetic interleaved docs generator, readers, checkpointing
  plans/      spatial planner helpers (cell-level pick, join strategy)
"""

__version__ = "0.1.0"
