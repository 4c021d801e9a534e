"""Physical-plan guards for the pipeline's scale properties:

- the assignments read-back prunes ``bytes`` at the parquet scan (the
  60-byte metadata path never pays for pixel payloads)
- the PIP join broadcasts the polygon cover — the fact side is never
  shuffled (no Exchange between the fact scan and the join)
- chunk scans read only their own files (pruning at planning time)

These are the properties that keep the flagship pipeline viable at 100 TB;
value correctness is gated elsewhere (oracles + resume tests).
"""

import numpy as np

from rio_color_spark.functions.pip import pack_polygons
from rio_color_spark.operators.spatial import with_spatial_index
from rio_color_spark.operators.spatial_join import point_in_polygon_join
from rio_color_spark.pipeline import FLAGSHIP_OPS, run_pipeline
from rio_color_spark.sources.images import images_df
from rio_color_spark.sources.polygons import make_polygons


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_assignments_scan_prunes_bytes(spark, tmp_path):
    """The written chunk parquet is re-read for assignments with bytes
    pruned: ReadSchema of that scan must not contain the pixel column."""
    src = str(tmp_path / "src")
    images_df(spark, 200).write.parquet(src)
    packed = pack_polygons(make_polygons(10))
    w = run_pipeline(spark, src, str(tmp_path / "out"), packed, n_chunks=2)

    meta = spark.read.parquet(w.chunk_path(0).replace("data", "images")).select(
        "image_id", "lon", "lat", "tile_xyz", "cell_id", "poly_ids"
    )
    plan = _plan(meta)
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "bytes" not in read_schema
    assert "image_id" in read_schema


def test_pip_join_broadcasts_cover_no_fact_shuffle(spark):
    idx = with_spatial_index(images_df(spark, 300).drop("bytes"), zoom=8, level=8)
    packed = pack_polygons(make_polygons(12))
    out = point_in_polygon_join(idx, packed, zoom=8, pip_zoom=4)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    # the ONLY exchange in the whole plan is the broadcast of the tiny
    # cover; the fact side must not hash-partition
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_chunk_scan_reads_only_own_files(spark, tmp_path):
    from rio_color_spark.pipeline import chunk_readers

    src = str(tmp_path / "src")
    images_df(spark, 200).repartition(6).write.parquet(src)
    readers = chunk_readers(spark, src, 3)
    all_files = set(spark.read.parquet(src).inputFiles())
    for r in readers:
        files = set(r().inputFiles())
        assert files and files < all_files  # strict subset: pruned scan


def test_rowops_rewrite_plans_are_jvm_joins(spark, tmp_path):
    """Row-level DELETE/UPDATE/MERGE plans: no Python eval stages and no
    cartesian products anywhere in the rewrite path — the detection is a
    key join, the rewrite a filtered/left-joined scan of touched files."""
    from rio_color_spark.sources.snapshots import SnapshotTable

    base = str(tmp_path / "ppt")
    t = SnapshotTable.create(base, "doc_id bigint, lang string, n_chars bigint")
    t.append(
        spark.range(0, 500).selectExpr(
            "id AS doc_id", "'en' AS lang", "id * 3 AS n_chars"
        )
    )
    meta = t.metadata()
    schema = t.schema(meta=meta)
    kept = t._manifest_rows(t.current_snapshot(meta))
    scan = t._scan_rows(spark, kept, schema, meta, file_col="_sf_file")

    import pyspark.sql.functions as F

    matched = F.coalesce(F.expr("(doc_id % 7 = 0)"), F.lit(False))
    detect = scan.filter(matched).groupBy("_sf_file").count()
    src = spark.range(0, 50).selectExpr(
        "id AS doc_id", "'xx' AS lang", "0L AS n_chars"
    )
    merge_detect = scan.join(
        src.select("doc_id"), on=["doc_id"], how="leftsemi"
    ).groupBy("_sf_file").count()

    for df in (detect, merge_detect, scan.filter(~matched)):
        plan = _plan(df)
        assert "EvalPython" not in plan and "ArrowEval" not in plan
        assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan
