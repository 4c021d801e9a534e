"""Raster↔vector tests: burn-vs-oracle, salted == unsalted, vectorize inverse."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rio_color_spark.functions.pip import pack_polygons, pip_pairs
from rio_color_spark.functions.tiles import tile_pixel_lonlat
from rio_color_spark.operators.rasterize import (
    rasterize_points,
    rasterize_polygons,
    vectorize_mask,
)
from rio_color_spark.operators.spatial import with_spatial_index
from rio_color_spark.operators.spatial_join import point_in_polygon_join
from rio_color_spark.sources.images import images_df
from rio_color_spark.sources.polygons import make_polygons

RES = 32
ZOOM = 6  # coarse zoom so polygon masks have interesting structure


@pytest.fixture(scope="module")
def assignments(spark):
    idx = with_spatial_index(images_df(spark, 600).drop("bytes"), zoom=ZOOM, level=8)
    packed = pack_polygons(make_polygons(25))
    return point_in_polygon_join(idx, packed, zoom=ZOOM).cache(), packed, idx


def test_rasterize_polygons_matches_oracle(spark, assignments):
    pairs, packed, _ = assignments
    masks = rasterize_polygons(pairs, packed, resolution=RES).collect()
    assert masks
    by_tile = {}
    for r in pairs.select("tile_xyz", "poly_id").distinct().collect():
        by_tile.setdefault(r["tile_xyz"], set()).add(r["poly_id"])
    pid_to_idx = {pid: i for i, pid in enumerate(packed.poly_ids)}
    nonzero = 0
    for m in masks:
        got = np.frombuffer(m["mask"], dtype=np.uint8).reshape(RES, RES)
        lon, lat = tile_pixel_lonlat(m["tile_x"], m["tile_y"], m["tile_z"], RES)
        glon, glat = np.meshgrid(lon, lat)
        expect = np.zeros(RES * RES, dtype=bool)
        for pid in by_tile[m["tile_xyz"]]:
            expect |= pip_pairs(
                glon.ravel(),
                glat.ravel(),
                np.full(RES * RES, pid_to_idx[pid]),
                packed,
            )
        assert np.array_equal(got.ravel().astype(bool), expect)
        nonzero += int(expect.sum())
    assert nonzero > 0


def test_rasterize_points_salted_equals_unsalted(spark, assignments):
    _, _, idx = assignments
    salted = {
        r["tile_xyz"]: (r["grid"], r["n_points"])
        for r in rasterize_points(idx, resolution=RES, salt_n=8).collect()
    }
    plain = {
        r["tile_xyz"]: (r["grid"], r["n_points"])
        for r in rasterize_points(idx, resolution=RES, salt_n=1).collect()
    }
    assert salted.keys() == plain.keys()
    for t in plain:
        assert salted[t][1] == plain[t][1]
        assert np.array_equal(
            np.frombuffer(salted[t][0], dtype=np.int64),
            np.frombuffer(plain[t][0], dtype=np.int64),
        )
    assert sum(v[1] for v in plain.values()) == 600


def test_vectorize_mask_inverts(spark, assignments):
    pairs, packed, _ = assignments
    masks = rasterize_polygons(pairs, packed, resolution=RES)
    pts = vectorize_mask(masks, resolution=RES, level=10)
    back = pts.collect()
    assert back
    # every emitted point is inside at least one polygon of its tile
    by_tile = {}
    for r in pairs.select("tile_xyz", "poly_id").distinct().collect():
        by_tile.setdefault(r["tile_xyz"], set()).add(r["poly_id"])
    pid_to_idx = {pid: i for i, pid in enumerate(packed.poly_ids)}
    for r in back[:500]:
        inside = any(
            pip_pairs(
                np.array([r["lon"]]),
                np.array([r["lat"]]),
                np.array([pid_to_idx[pid]]),
                packed,
            )[0]
            for pid in by_tile[r["tile_xyz"]]
        )
        assert inside
    # count parity with the masks
    total_set = sum(
        int(np.frombuffer(m["mask"], dtype=np.uint8).sum())
        for m in masks.collect()
    )
    assert len(back) == total_set
