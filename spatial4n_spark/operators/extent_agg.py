"""st_extent: dateline-aware bbox union aggregation.

Semantics: ShapeCollection.ComputeBoundingBox (ShapeCollection.cs:67-91)
with the LongitudeRange.ExpandTo smart circular union (Impl/Range.cs
:107-203) — the combined longitude range is the SMALLEST arc covering
all members, which may cross the dateline (minx > maxx) even when no
member does.

Two paths:
- `st_extent` (applyInPandas): the exact reference fold per group —
  one shuffle on the group key, NumPy fold per group. Use when groups
  can straddle the dateline.
- `st_extent_simple` (built-in min/max): JVM-side partial aggregation
  (map-side combine, no Python). Identical result whenever each
  group's longitude span is < 180 degrees and dateline-free — the
  common case, and the scale path (no Arrow exchange, whole-stage
  codegen, partial aggs before the shuffle).
"""
from __future__ import annotations

from typing import Sequence

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

from ..kernels.extent import union_bboxes


def st_extent(df: DataFrame, group_cols: Sequence[str],
              minx: str = "minx", maxx: str = "maxx",
              miny: str = "miny", maxy: str = "maxy") -> DataFrame:
    """Exact dateline-aware extent per group (reference fold)."""
    key_fields = [df.schema[c] for c in group_cols]
    out_schema = StructType(list(key_fields) + [
        StructField("minx", DoubleType()), StructField("maxx", DoubleType()),
        StructField("miny", DoubleType()), StructField("maxy", DoubleType()),
    ])

    cols = (minx, maxx, miny, maxy)
    keys = list(group_cols)

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        boxes = list(zip(*(pdf[c].to_numpy() for c in cols)))
        lo, hi, mny, mxy = union_bboxes(boxes)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row.update(minx=[lo], maxx=[hi], miny=[mny], maxy=[mxy])
        return pd.DataFrame(row)

    return (df.select(*keys, *cols)
              .groupBy(*keys).applyInPandas(fold, out_schema))


def st_extent_simple(df: DataFrame, group_cols: Sequence[str],
                     minx: str = "minx", maxx: str = "maxx",
                     miny: str = "miny", maxy: str = "maxy") -> DataFrame:
    """JVM-side extent (valid for dateline-free groups): pure built-in
    min/max aggregation — partial-agg map-side combine, no Python."""
    return (df.groupBy(*group_cols)
              .agg(F.min(minx).alias("minx"), F.max(maxx).alias("maxx"),
                   F.min(miny).alias("miny"), F.max(maxy).alias("maxy")))
