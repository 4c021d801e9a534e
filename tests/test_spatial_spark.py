"""Spark-side spatial tests: index parity (native SQL vs NumPy), PIP join
vs brute-force oracle, kNN vs brute-force oracle (FIXTURES.md §6)."""

import numpy as np
import pytest

from rio_color_spark.functions import cells as C
from rio_color_spark.functions import tiles as T
from rio_color_spark.functions.pip import pack_polygons
from rio_color_spark.operators.knn import knn_join
from rio_color_spark.operators.spatial import with_spatial_index
from rio_color_spark.operators.spatial_join import point_in_polygon_join
from rio_color_spark.sources.images import (
    generate_pandas,
    images_df,
    lonlat_from_phash,
    phash_for,
)
from rio_color_spark.sources.polygons import make_polygons

N = 800
ZOOM = 12
LEVEL = 12


@pytest.fixture(scope="module")
def indexed(spark):
    return with_spatial_index(
        images_df(spark, N).drop("bytes"), zoom=ZOOM, level=LEVEL
    ).cache()


def _local_index():
    ph = phash_for(np.arange(N))
    lon, lat = lonlat_from_phash(ph)
    tx, ty = T.tile_xy(lon, lat, ZOOM)
    cell = C.encode_cell(lon, lat, LEVEL)
    ids = [f"img{n:08d}" for n in range(N)]
    return ids, lon, lat, tx, ty, cell


def test_spatial_index_parity(indexed):
    """Native-SQL lon/lat/tiles + UDF cells == pure NumPy derivation."""
    rows = {r["image_id"]: r for r in indexed.collect()}
    ids, lon, lat, tx, ty, cell = _local_index()
    assert len(rows) == N
    for k, iid in enumerate(ids):
        r = rows[iid]
        assert r["lon"] == pytest.approx(lon[k], abs=1e-12)
        assert r["lat"] == pytest.approx(lat[k], abs=1e-12)
        assert (r["tile_x"], r["tile_y"]) == (tx[k], ty[k])
        assert r["cell_id"] == cell[k]
        assert r["tile_xyz"] == T.pack_tile(np.array([tx[k]]), np.array([ty[k]]), ZOOM)[0]


def test_pip_join_matches_oracle(spark, indexed):
    polys = make_polygons(40)
    packed = pack_polygons(polys)
    got = {
        (r["image_id"], r["poly_id"])
        for r in point_in_polygon_join(indexed, packed, zoom=ZOOM).collect()
    }

    # brute-force oracle over the full cross product
    ids, lon, lat, *_ = _local_index()
    expect = set()
    for pidx, (pid, ring) in enumerate(polys):
        from rio_color_spark.functions.pip import pip_pairs

        mask = pip_pairs(lon, lat, np.full(N, pidx), packed)
        for k in np.nonzero(mask)[0]:
            expect.add((ids[k], pid))
    assert got == expect
    assert len(expect) > 20  # the fixture actually exercises the join


def test_pip_join_hot_polygon_present(spark, indexed):
    polys = make_polygons(40)
    packed = pack_polygons(polys)
    out = point_in_polygon_join(indexed, packed, zoom=ZOOM)
    counts = {r["poly_id"]: r["cnt"] for r in out.groupBy("poly_id").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("cnt")
    ).collect()}
    # poly00000 is the deliberately hot polygon — it must dominate
    assert counts.get("poly00000", 0) == max(counts.values())


def test_knn_matches_oracle(spark):
    # level 4 (~6 deg cells) so a global 800-point sample has ring pairs
    knn_level = 4
    indexed = with_spatial_index(
        images_df(spark, N).drop("bytes"), zoom=ZOOM, level=knn_level
    )
    k = 3
    got = {}
    for r in knn_join(indexed, k=k, level=knn_level).collect():
        got.setdefault(r["image_id"], []).append(
            (r["rank"], r["neighbor_id"], r["dist_km"])
        )

    ids, lon, lat, _, _, cell12 = _local_index()
    cell = C.parent(cell12, LEVEL - knn_level)
    ring = C.neighbor_ring(cell, knn_level)
    cellset = {iid: c for iid, c in zip(ids, cell.tolist())}

    def haversine(i, j):
        R = 6371.0088
        la1, la2 = np.radians(lat[i]), np.radians(lat[j])
        dla = la2 - la1
        dlo = np.radians(lon[j] - lon[i])
        a = np.sin(dla / 2) ** 2 + np.cos(la1) * np.cos(la2) * np.sin(dlo / 2) ** 2
        return 2 * R * np.arcsin(np.sqrt(a))

    checked = 0
    for i, iid in enumerate(ids):
        cand_cells = {int(cell[i])} | set(ring[i].tolist())
        cands = [
            j for j, jid in enumerate(ids)
            if j != i and cellset[jid] in cand_cells
        ]
        expect = sorted(((haversine(i, j), ids[j]) for j in cands))[:k]
        mine = sorted(got.get(iid, []))
        assert len(mine) == len(expect), iid
        for (rank, nid, dist), (edist, eid) in zip(mine, expect):
            assert nid == eid, (iid, rank)
            assert dist == pytest.approx(edist, rel=1e-9)
        checked += len(expect)
    assert checked > 50  # sf-small actually has neighbor pairs
