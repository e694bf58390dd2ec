"""Raster <-> vector zonal extraction (graft-only operator, SURVEY 2.7).

Rasters are opaque media refs on document spans. The decode step is a
Pandas-UDF `mapInPandas` stage with REAL Spark plumbing (schema,
batching, partitioning) and a STUBBED codec: image/audio libraries are
not available in this container, so refs matching raster://tile/<id>
decode to a deterministic synthetic 16x16 grid; any other ref raises
NotImplementedError where a real GDAL/PIL decode would plug in.

Zonal pipeline: decode -> pixel rows with geo centers -> cell-index
join against zone covers -> containment refine -> groupBy(zone) agg.
"""
from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType,
                               StructField, StructType)

TILE_W = 16
TILE_H = 16
# 16 x 4 tile grid covering the world
TILE_DX = 22.5 / TILE_W
TILE_DY = 45.0 / TILE_H

PIXEL_SCHEMA = StructType([
    StructField("media_ref", StringType()),
    StructField("px_lon", DoubleType()),
    StructField("px_lat", DoubleType()),
    StructField("value", LongType()),
])


def _decode_batch(batch: pd.DataFrame) -> pd.DataFrame:
    refs = batch["media_ref"]
    out_ref, out_lon, out_lat, out_val = [], [], [], []
    i_idx, j_idx = np.meshgrid(np.arange(TILE_W), np.arange(TILE_H), indexing="ij")
    i_flat = i_idx.ravel()
    j_flat = j_idx.ravel()
    for ref in refs:
        if not ref.startswith("raster://tile/"):
            raise NotImplementedError(
                f"real raster decode not available in this container: {ref}")
        t = int(ref.rsplit("/", 1)[1])
        lon0 = (t % 16) * 22.5 - 180.0
        lat0 = (t // 16) * 45.0 - 90.0
        lon = lon0 + (i_flat + 0.5) * TILE_DX
        lat = lat0 + (j_flat + 0.5) * TILE_DY
        val = (t * 31 + i_flat * 7 + j_flat * 13) % 255
        out_ref.extend([ref] * TILE_W * TILE_H)
        out_lon.append(lon)
        out_lat.append(lat)
        out_val.append(val)
    if not out_ref:
        return pd.DataFrame({c.name: pd.Series(dtype=object) for c in PIXEL_SCHEMA})
    return pd.DataFrame({
        "media_ref": out_ref,
        "px_lon": np.concatenate(out_lon),
        "px_lat": np.concatenate(out_lat),
        "value": np.concatenate(out_val).astype(np.int64),
    })


def decode_raster_tiles(refs_df: DataFrame) -> DataFrame:
    """media_ref rows -> pixel rows (the decode stage).

    mapInPandas keeps decode streaming per Arrow batch; on a cluster the
    input should be repartitioned by media_ref bucketing beforehand so
    one tile never splits across tasks.
    """
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield _decode_batch(b)
    return refs_df.select("media_ref").distinct().mapInPandas(gen, PIXEL_SCHEMA)


def zonal_stats(pixels: DataFrame, zones: DataFrame,
                zone_id: str = "rect_id") -> DataFrame:
    """Aggregate pixel values per (plain) rect zone: count/sum/mean.

    Containment is the closed-rect test (boundary in, matching COVERS).
    The join keys on precision-2 cells at scale; with bounded zone
    counts the zones side broadcasts.
    """
    j = pixels.join(F.broadcast(zones),
                    (F.col("px_lon") >= F.col("minx")) & (F.col("px_lon") <= F.col("maxx"))
                    & (F.col("px_lat") >= F.col("miny")) & (F.col("px_lat") <= F.col("maxy")),
                    "inner")
    return (j.groupBy(zone_id)
             .agg(F.count("*").alias("px_count"),
                  F.sum("value").alias("px_sum"),
                  F.round(F.sum("value") / F.count("*").cast("double"), 6).alias("px_mean")))
