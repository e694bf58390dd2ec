"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   — flagship query (distributed point-in-rectangle spatial
                 join with dateline-aware refine) at sf0.001.
queries()      — one entry per implemented operator (SURVEY.md section 2);
                 each callable takes (spark, sf_dir) -> DataFrame and runs
                 the ENGINE path (vectorized kernels / cell-index joins).
oracle_sql()   — DuckDB-runnable ANSI SQL computing the same result
                 relationally from the same parquet tables.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _ensure_pkg(spark: SparkSession) -> None:
    """Ship the package zip to executors (python workers don't inherit
    the driver's sys.path in local mode; every UDF needs the module
    importable worker-side). Idempotent; safe on restricted contexts."""
    from spatial4n_spark.session import package_zip
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added or restricted context


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spatial4n_spark import contract
    _ensure_pkg(spark)
    return contract.q_pip_rect_join(spark, "/root/testdata/sf0.001")


def _wrap(fn: Callable) -> Callable:
    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ensure_pkg(spark)
        return fn(spark, sf_dir)
    run.__name__ = getattr(fn, "__name__", "query")
    return run


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spatial4n_spark import contract as c
    qs = {
        # --- spatial joins / relates ---
        "pip_rect_join": c.q_pip_rect_join,
        "pip_semi_join": c.q_pip_semi_join,
        "pip_anti_join": c.q_pip_anti_join,
        "polygon_pip_join": c.q_polygon_pip_join,
        "polygon_polygon_relate": c.q_polygon_polygon_relate,
        "polygon_polygon_join": c.q_polygon_polygon_join,
        "polygon_circle_relate": c.q_polygon_circle_relate,
        "polygon_rect_relate": c.q_polygon_rect_relate,
        "rect_rect_relate": c.q_rect_rect_relate,
        "circle_rect_relate": c.q_circle_rect_relate,
        "circle_circle_relate": c.q_circle_circle_relate,
        "distance_pairs": c.q_distance_pairs,
        "dwithin_join": c.q_dwithin_join,
        "knn": c.q_knn,
        "knn_rings": c.q_knn_rings,
        # --- tiling ---
        "tile_assign": c.q_tile_assign_decode,
        "cell_rollup": c.q_cell_rollup,
        "cell_sets": c.q_cell_sets,
        # --- WKT codec ---
        "wkt_point_roundtrip": c.q_wkt_point_roundtrip,
        "wkt_envelope_parse": c.q_wkt_envelope_parse,
        "wkt_writer_roundtrip": c.q_wkt_writer_roundtrip,
        "wkt_multi": c.q_wkt_multi,
        "geometrycollection_bbox": c.q_geometrycollection_bbox,
        "wkt_errors": c.q_wkt_errors,
        # --- interleaved-span invariant ---
        "span_integrity": c.q_span_integrity,
        # --- training-data ops: dedup ---
        "dedup_exact": c.q_dedup_exact,
        # minhash banding's pair SET is verified inside ngram_jaccard
        # (jaccard is computed ON exactly those pairs) and feeds
        # dedup_clusters' components
        "ngram_jaccard": c.q_ngram_jaccard,
        "dedup_clusters": c.q_dedup_clusters,
        # --- training-data ops: text analysis (wide-merged) ---
        "doc_signatures": c.q_doc_signatures,
        "text_metrics": c.q_text_metrics,
        # --- similarity search ---
        "embed_knn": c.q_embed_knn,
        "embed_lsh_bucket": c.q_embed_lsh_bucket,
        "embed_neardup": c.q_embed_neardup,
        "embed_neardup_banded": c.q_embed_neardup_banded,
        "ivf_assign": c.q_ivf_assign,
        "ivf_topk": c.q_ivf_topk,
        # --- raster<->vector / multimodal ---
        "zonal_stats": c.q_zonal_stats,
        "multimodal_features": c.q_multimodal_features,
        # --- relational coverage ---
        "tpch_pricing_summary": c.q_tpch_pricing_summary,
        "events_sessionize": c.q_events_sessionize,
        # --- shape algebra: areas / bearing / lines / extent / buffer ---
        "st_area_ranges": c.q_st_area_ranges,
        "point_on_bearing": c.q_point_on_bearing,
        "line_contains_join": c.q_line_contains_join,
        "linestring_contains": c.q_linestring_contains,
        "extent_collection": c.q_extent_collection,
        "buffer_shapes": c.q_buffer_shapes,
        # --- codecs / normalization ---
        "legacy_roundtrip": c.q_legacy_roundtrip,
        "binary_roundtrip": c.q_binary_roundtrip,
        "normalize_units": c.q_normalize_units,
        "cartesian_ops": c.q_cartesian_ops,
    }
    return {k: _wrap(v) for k, v in qs.items()}


def oracle_sql() -> dict[str, str]:
    from spatial4n_spark import contract as c
    return {
        "pip_rect_join": c.ORACLE_PIP_RECT,
        "pip_semi_join": c.ORACLE_PIP_SEMI,
        "pip_anti_join": c.ORACLE_PIP_ANTI,
        "polygon_pip_join": c.ORACLE_POLYGON_PIP,
        "polygon_polygon_relate": c.ORACLE_POLYGON_POLYGON,
        "polygon_polygon_join": c.ORACLE_POLYGON_POLYGON_JOIN,
        "polygon_circle_relate": c.ORACLE_POLYGON_CIRCLE,
        "polygon_rect_relate": c.ORACLE_POLYGON_RECT,
        "rect_rect_relate": c.ORACLE_RECT_RECT,
        "circle_rect_relate": c.ORACLE_CIRCLE_RECT,
        "circle_circle_relate": c.ORACLE_CIRCLE_CIRCLE,
        "distance_pairs": c.ORACLE_DISTANCE,
        "dwithin_join": c.ORACLE_DWITHIN,
        "knn": c.ORACLE_KNN,
        "knn_rings": c.ORACLE_KNN_RINGS,
        "tile_assign": c.ORACLE_TILE_DECODE,
        "cell_rollup": c.ORACLE_ROLLUP,
        "cell_sets": c.ORACLE_CELL_SETS,
        "wkt_point_roundtrip": c.ORACLE_WKT_POINT,
        "wkt_envelope_parse": c.ORACLE_WKT_ENVELOPE,
        "wkt_writer_roundtrip": c.ORACLE_WKT_WRITER,
        "wkt_multi": c.ORACLE_WKT_MULTI,
        "geometrycollection_bbox": c.ORACLE_GC_BBOX,
        "wkt_errors": c.ORACLE_WKT_ERRORS,
        "span_integrity": c.ORACLE_SPAN,
        "dedup_exact": c.ORACLE_DEDUP_EXACT,
        "ngram_jaccard": c.ORACLE_NGRAM_LSH,
        "dedup_clusters": c.ORACLE_DEDUP_CLUSTERS,
        "doc_signatures": c.ORACLE_DOC_SIGNATURES,
        "text_metrics": c.ORACLE_TEXT_METRICS,
        "embed_knn": c.ORACLE_EMBED_KNN,
        "embed_lsh_bucket": c.ORACLE_EMBED_LSH,
        "embed_neardup": c.ORACLE_EMBED_NEARDUP,
        "embed_neardup_banded": c.ORACLE_EMBED_NEARDUP_BANDED,
        "ivf_assign": c.ORACLE_IVF_ASSIGN,
        "ivf_topk": c.ORACLE_IVF_TOPK,
        "zonal_stats": c.ORACLE_ZONAL,
        "multimodal_features": c.ORACLE_MULTIMODAL,
        "tpch_pricing_summary": c.ORACLE_TPCH_Q1,
        "events_sessionize": c.ORACLE_EVENTS,
        "st_area_ranges": c.ORACLE_ST_AREA_RANGES,
        "point_on_bearing": c.ORACLE_BEARING,
        "line_contains_join": c.ORACLE_LINE,
        "linestring_contains": c.ORACLE_LINESTRING,
        "extent_collection": c.ORACLE_EXTENT_COLLECTION,
        "buffer_shapes": c.ORACLE_BUFFER,
        "legacy_roundtrip": c.ORACLE_LEGACY,
        "binary_roundtrip": c.ORACLE_BINARY,
        "normalize_units": c.ORACLE_NORMALIZE_UNITS,
        "cartesian_ops": c.ORACLE_CARTESIAN,
    }
