"""Point-in-polygon spatial join: broadcast cover + packed-edge ray cast.

Plan shape (SURVEY.md §2.4 "Joins"):

1. **Cover (driver, tiny):** each polygon's lon/lat bbox → its EXACT tile
   cover at a coarse ``pip_zoom`` (Mercator x/y are monotonic in lon/-lat,
   so corner tiles bound the cover — functions/tiles.bbox_tile_range). The
   (poly, tile) cover is a small dimension table.
2. **Equi-join prefilter:** images already carry tile_x/tile_y at the index
   zoom; the coarse key derives natively via ``tile_x >> (zoom - pip_zoom)``
   (tiles nest). ``F.broadcast`` hint forces a broadcast hash join — NO
   shuffle of the fact table, ever.
3. **Exact test:** surviving candidate pairs run the vectorized ray-cast
   kernel (functions/pip.py) against the broadcast packed edge arrays in an
   Arrow-batched pandas UDF.

At 10¹² rows the only data movement is the map-side broadcast of a few KB
of edges + cover; candidate fan-out is bounded by polygons-per-coarse-tile.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rio_color_spark.functions.pip import PackedPolygons, pip_pairs
from rio_color_spark.functions.tiles import bbox_tile_range, pack_tile, pack_tile_col


def polygon_cover_rows(packed: PackedPolygons, pip_zoom: int):
    """(poly_idx, poly_id, ptile) exact coarse-tile cover of every polygon."""
    rows = []
    for pidx, pid in enumerate(packed.poly_ids):
        lon0, lat0, lon1, lat1 = packed.bbox[pidx]
        x0, y0, x1, y1 = bbox_tile_range(lon0, lat0, lon1, lat1, pip_zoom)
        for x in range(x0, x1 + 1):
            for y in range(y0, y1 + 1):
                rows.append(
                    (pidx, pid, int(pack_tile(np.array([x]), np.array([y]), pip_zoom)[0]))
                )
    return rows


def point_in_polygon_join(
    df: DataFrame,
    packed: PackedPolygons,
    zoom: int,
    pip_zoom: int = 6,
) -> DataFrame:
    """Join rows of ``df`` (indexed via with_spatial_index at ``zoom``) to
    the polygons that contain them. Output: input columns + ``poly_id``.

    A point inside k polygons yields k rows; points in none are dropped
    (inner-join semantics, matching the brute-force oracle).
    """
    if pip_zoom > zoom:
        raise ValueError("pip_zoom must be coarser (<=) than the index zoom")
    spark = df.sparkSession

    # pandas + Arrow so the cover becomes a LocalTableScan: the list-of-
    # tuples path plans a `Scan ExistingRDD` whose rows are pickled through
    # a Python worker at RUNTIME — measured ~250 ms per execution for a
    # 60-row dimension table vs ~9 ms for the local relation (guide §4:
    # keep Python out of the execution path).
    cover = spark.createDataFrame(
        pd.DataFrame(
            polygon_cover_rows(packed, pip_zoom),
            columns=["poly_idx", "poly_id", "ptile"],
        ),
        "poly_idx int, poly_id string, ptile long",
    )

    shift = zoom - pip_zoom
    ptile = pack_tile_col(
        F.shiftright(F.col("tile_x"), shift),
        F.shiftright(F.col("tile_y"), shift),
        pip_zoom,
    )
    cand = df.withColumn("ptile", ptile).join(F.broadcast(cover), "ptile")

    bc = spark.sparkContext.broadcast(packed)

    @pandas_udf("boolean")
    def inside(lon: pd.Series, lat: pd.Series, pidx: pd.Series) -> pd.Series:
        return pd.Series(
            pip_pairs(
                lon.to_numpy(), lat.to_numpy(), pidx.to_numpy(), bc.value
            )
        )

    return (
        cand.filter(inside(F.col("lon"), F.col("lat"), F.col("poly_idx")))
        .drop("ptile", "poly_idx")
    )
