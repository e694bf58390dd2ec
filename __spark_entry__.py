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


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from spatial4n_spark import contract
    from spatial4n_spark.session import package_zip
    try:
        spark.sparkContext.addPyFile(package_zip())
    except Exception:
        pass  # already added or restricted context
    return contract.q_pip_rect_join(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from spatial4n_spark import contract as c
    return {
        # --- spatial joins / relates ---
        "pip_rect_join": c.q_pip_rect_join,
        "polygon_pip_join": c.q_polygon_pip_join,
        "rect_rect_relate": c.q_rect_rect_relate,
        "circle_rect_relate": c.q_circle_rect_relate,
        "distance_pairs": c.q_distance_pairs,
        "dwithin_join": c.q_dwithin_join,
        "knn": c.q_knn,
        # --- tiling ---
        "tile_assign": c.q_tile_assign,
        "cell_rollup": c.q_cell_rollup,
        "cover_cells": c.q_cover_cells,
        # --- WKT codec ---
        "wkt_point_roundtrip": c.q_wkt_point_roundtrip,
        "wkt_envelope_parse": c.q_wkt_envelope_parse,
    }


def oracle_sql() -> dict[str, str]:
    from spatial4n_spark import contract as c
    return {
        "pip_rect_join": c.ORACLE_PIP_RECT,
        "polygon_pip_join": c.ORACLE_POLYGON_PIP,
        "rect_rect_relate": c.ORACLE_RECT_RECT,
        "circle_rect_relate": c.ORACLE_CIRCLE_RECT,
        "distance_pairs": c.ORACLE_DISTANCE,
        "dwithin_join": c.ORACLE_DWITHIN,
        "knn": c.ORACLE_KNN,
        "tile_assign": c.ORACLE_TILE,
        "cell_rollup": c.ORACLE_ROLLUP,
        "cover_cells": c.ORACLE_COVER,
        "wkt_point_roundtrip": c.ORACLE_WKT_POINT,
        "wkt_envelope_parse": c.ORACLE_WKT_ENVELOPE,
    }
