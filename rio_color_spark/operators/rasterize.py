"""Raster ↔ vector conversion with explicit skew salting.

North-rule requirements (BASELINE.json): "raster↔vector conversion uses
per-tile rasterization of joined polygon geometries with salted-key
repartitioning to break hot-cell skew".

Two rasterizers:

- :func:`rasterize_polygons` — vector→raster: per output tile, burn the
  polygons assigned to it (from the PIP join) into a ``resolution²`` uint8
  mask by ray-casting the tile's pixel-center grid against the broadcast
  packed edges. Group cardinality is bounded by |polygons|, so no salting
  is needed on this path.
- :func:`rasterize_points` — the skew-prone path: per-tile density grid of
  image points. A hot cell (city) can put millions of rows in one tile, so
  the aggregation is **two-level salted**: stage 1 partially aggregates on
  ``(tile, salt)`` where ``salt = pmod(xxhash64(image_id), salt_n)``,
  stage 2 merges the ≤ salt_n partial grids per tile. AQE cannot do this
  for aggregations (it only splits skewed *joins*), which is why the
  salting is explicit (SURVEY.md §4.2).

Raster→vector: :func:`vectorize_mask` emits the lon/lat + cell id of every
set pixel of a mask tile — the inverse path, vectorized.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_color_spark.functions import cells as cellmod
from rio_color_spark.functions import tiles as tilemod
from rio_color_spark.functions.pip import PackedPolygons, pip_pairs

MASK_SCHEMA = "tile_xyz long, tile_x int, tile_y int, tile_z int, mask binary"
GRID_SCHEMA = "tile_xyz long, tile_x int, tile_y int, tile_z int, grid binary, n_points long"


def _unpack_tile(tile_xyz: int) -> tuple[int, int, int]:
    z = tile_xyz >> 58
    x = (tile_xyz >> 29) & ((1 << 29) - 1)
    y = tile_xyz & ((1 << 29) - 1)
    return int(x), int(y), int(z)


def rasterize_polygons(
    assignments: DataFrame,
    packed: PackedPolygons,
    resolution: int = 64,
) -> DataFrame:
    """(tile_xyz, poly_id) pairs → per-tile uint8 coverage masks.

    ``assignments`` is typically the PIP join output; only the distinct
    (tile, polygon) pairs matter. Output mask byte k is 1 iff pixel k's
    center lies in ≥1 assigned polygon.
    """
    spark = assignments.sparkSession
    bc = spark.sparkContext.broadcast(packed)
    id_to_idx = {pid: i for i, pid in enumerate(packed.poly_ids)}
    bc_idx = spark.sparkContext.broadcast(id_to_idx)

    pairs = assignments.select("tile_xyz", "poly_id").distinct()

    def burn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (tile_xyz,) = key
        x, y, z = _unpack_tile(tile_xyz)
        lon, lat = tilemod.tile_pixel_lonlat(x, y, z, resolution)
        glon, glat = np.meshgrid(lon, lat)  # (res, res): rows=lat, cols=lon
        mask = np.zeros(resolution * resolution, dtype=bool)
        packed_p = bc.value
        for pid in pdf["poly_id"].unique():
            pidx = bc_idx.value[pid]
            mask |= pip_pairs(
                glon.ravel(),
                glat.ravel(),
                np.full(resolution * resolution, pidx),
                packed_p,
            )
        return pd.DataFrame(
            [
                (
                    tile_xyz,
                    x,
                    y,
                    z,
                    mask.astype(np.uint8).tobytes(),
                )
            ],
            columns=["tile_xyz", "tile_x", "tile_y", "tile_z", "mask"],
        )

    return pairs.groupBy("tile_xyz").applyInPandas(burn, schema=MASK_SCHEMA)


def _accumulate_grid(
    pdf: pd.DataFrame, x: int, y: int, z: int, resolution: int
) -> np.ndarray:
    """Count image points per pixel of tile (x, y, z) — vectorized binning."""
    n = 1 << z
    lon = pdf["lon"].to_numpy()
    lat = pdf["lat"].to_numpy()
    fx = (lon + 180.0) / 360.0 * n - x
    # same asinh formulation as the tile assignment (tiles.mercator_y_frac),
    # so a boundary point bins into the same edge pixel the JVM tiled it to
    fy = tilemod.mercator_y_frac(lat) * n - y
    col = np.clip((fx * resolution).astype(np.int64), 0, resolution - 1)
    row = np.clip((fy * resolution).astype(np.int64), 0, resolution - 1)
    grid = np.zeros(resolution * resolution, dtype=np.int64)
    np.add.at(grid, row * resolution + col, 1)
    return grid


def rasterize_points(
    indexed: DataFrame,
    resolution: int = 64,
    salt_n: int = 8,
) -> DataFrame:
    """Per-tile density grids of image points, with two-level salted agg.

    Stage 1 groups on (tile_xyz, salt) → partial int64 grids; stage 2 merges
    per tile. With ``salt_n=1`` this degenerates to a plain groupBy — the
    property test asserts salted == unsalted.
    """
    pts = indexed.select(
        "tile_xyz",
        "lon",
        "lat",
        F.pmod(F.xxhash64(F.col("image_id")), F.lit(salt_n)).alias("salt"),
    )

    def partial(key, pdf: pd.DataFrame) -> pd.DataFrame:
        tile_xyz, _salt = key
        x, y, z = _unpack_tile(tile_xyz)
        grid = _accumulate_grid(pdf, x, y, z, resolution)
        return pd.DataFrame(
            [(tile_xyz, grid.tobytes(), len(pdf))],
            columns=["tile_xyz", "grid", "n_points"],
        )

    partials = pts.groupBy("tile_xyz", "salt").applyInPandas(
        partial, schema="tile_xyz long, grid binary, n_points long"
    )

    def merge(key, pdf: pd.DataFrame) -> pd.DataFrame:
        (tile_xyz,) = key
        x, y, z = _unpack_tile(tile_xyz)
        total = np.zeros(resolution * resolution, dtype=np.int64)
        for buf in pdf["grid"]:
            total += np.frombuffer(buf, dtype=np.int64)
        return pd.DataFrame(
            [(tile_xyz, x, y, z, total.tobytes(), int(pdf["n_points"].sum()))],
            columns=["tile_xyz", "tile_x", "tile_y", "tile_z", "grid", "n_points"],
        )

    return partials.groupBy("tile_xyz").applyInPandas(merge, schema=GRID_SCHEMA)


def vectorize_mask(
    masks: DataFrame, resolution: int = 64, level: int = cellmod.DEFAULT_LEVEL
) -> DataFrame:
    """Raster→vector: set pixels of each mask → (tile_xyz, lon, lat, cell_id)."""

    def emit(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                mask = np.frombuffer(r.mask, dtype=np.uint8).reshape(
                    resolution, resolution
                )
                ridx, cidx = np.nonzero(mask)
                if len(ridx) == 0:
                    continue
                lon, lat = tilemod.tile_pixel_lonlat(
                    r.tile_x, r.tile_y, r.tile_z, resolution
                )
                plon = lon[cidx]
                plat = lat[ridx]
                cells = cellmod.encode_cell(plon, plat, level)
                rows.append(
                    pd.DataFrame(
                        {
                            "tile_xyz": r.tile_xyz,
                            "lon": plon,
                            "lat": plat,
                            "cell_id": cells,
                        }
                    )
                )
            if rows:
                yield pd.concat(rows, ignore_index=True)

    return masks.mapInPandas(
        emit, schema="tile_xyz long, lon double, lat double, cell_id long"
    )
