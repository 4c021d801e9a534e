"""Spatial index assignment operators: lon/lat derivation, XYZ tiles, cells.

Design split (SURVEY.md §4.2):

- lon/lat from phash and tile x/y are **native Spark Column expressions** —
  they run JVM-side inside whole-stage codegen, no Python crossing at all.
- cell ids need bit interleaving; they run as an **Arrow-vectorized pandas
  UDF** over the NumPy kernel (functions/cells.py) — one batched call per
  Arrow batch, never per-row Python (BASELINE.json input_hint).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rio_color_spark.functions import cells as cellmod
from rio_color_spark.functions import tiles as tilemod


def lonlat_cols(phash: Column) -> tuple[Column, Column]:
    """Deterministic geo columns from phash (FIXTURES.md §1), JVM-side.

    lon = ((phash >> 32) & 0xFFFFFFFF) / 2^32 * 360 - 180
    lat = ( phash        & 0xFFFFFFFF) / 2^32 * 170 -  85
    """
    hi = F.shiftrightunsigned(phash, 32).bitwiseAND(F.lit(0xFFFFFFFF))
    lo = phash.bitwiseAND(F.lit(0xFFFFFFFF))
    lon = hi.cast("double") / F.lit(4294967296.0) * F.lit(360.0) - F.lit(180.0)
    lat = lo.cast("double") / F.lit(4294967296.0) * F.lit(170.0) - F.lit(85.0)
    return lon, lat


def with_lonlat(df: DataFrame, phash_col: str = "phash") -> DataFrame:
    lon, lat = lonlat_cols(F.col(phash_col))
    return df.withColumns({"lon": lon, "lat": lat})


def with_tiles(df: DataFrame, zoom: int) -> DataFrame:
    """Attach tile_x/tile_y/tile_z + packed tile_xyz (all native codegen)."""
    x, y = tilemod.tile_cols(F.col("lon"), F.col("lat"), zoom)
    return df.withColumns(
        {
            "tile_x": x,
            "tile_y": y,
            "tile_z": F.lit(zoom).cast("int"),
            "tile_xyz": tilemod.pack_tile_col(x, y, zoom),
        }
    )


def cell_udf(level: int):
    """Arrow-vectorized (lon, lat) → cell_id pandas UDF at ``level``."""

    @pandas_udf("long")
    def _encode(lon: pd.Series, lat: pd.Series) -> pd.Series:
        return pd.Series(
            cellmod.encode_cell(lon.to_numpy(), lat.to_numpy(), level)
        )

    return _encode


def with_cells(df: DataFrame, level: int = cellmod.DEFAULT_LEVEL) -> DataFrame:
    return df.withColumn("cell_id", cell_udf(level)(F.col("lon"), F.col("lat")))


def with_spatial_index(
    df: DataFrame,
    zoom: int = 12,
    level: int = cellmod.DEFAULT_LEVEL,
    phash_col: str = "phash",
) -> DataFrame:
    """The full indexing stage: phash → lon/lat → tiles (+packed) → cell_id.

    One narrow stage, no shuffle; everything but the cell UDF stays in
    whole-stage codegen.
    """
    return with_cells(with_tiles(with_lonlat(df, phash_col), zoom), level)
