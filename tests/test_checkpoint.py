"""Checkpoint/lineage/resume contract tests (SURVEY.md §7 M6) + the
end-to-end pipeline kill-and-resume integration test."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from rio_color_spark.functions.pip import pack_polygons
from rio_color_spark.pipeline import FLAGSHIP_OPS, run_pipeline
from rio_color_spark.sources.catalog import CheckpointedWriter, run_resumable
from rio_color_spark.sources.images import images_df
from rio_color_spark.sources.polygons import make_polygons


def test_chunked_write_and_lineage(spark, tmp_path):
    w = CheckpointedWriter(str(tmp_path / "out"))
    run_resumable(
        w, 4, lambda k: spark.range(k * 10, (k + 1) * 10).withColumn("chunk", F.lit(k))
    )
    recs = w.committed()
    assert sorted(recs) == [0, 1, 2, 3]
    assert all(r["n_rows"] == 10 for r in recs.values())
    assert len({r["lineage_id"] for r in recs.values()}) == 4
    assert w.read(spark).count() == 40


def test_crash_and_resume_skips_committed(spark, tmp_path):
    base = str(tmp_path / "out")
    w = CheckpointedWriter(base)
    calls = []

    def make(k):
        calls.append(k)
        return spark.range(k * 5, (k + 1) * 5)

    with pytest.raises(RuntimeError, match="simulated crash"):
        run_resumable(w, 5, make, fail_after=2)
    assert sorted(w.committed()) == [0, 1]

    # resume with a fresh writer over the same base
    run_resumable(CheckpointedWriter(base), 5, make)
    assert calls == [0, 1, 2, 3, 4]  # chunks 0,1 NOT recomputed on resume
    assert sorted(CheckpointedWriter(base).committed()) == [0, 1, 2, 3, 4]
    assert CheckpointedWriter(base).read(spark).count() == 25


def test_pipeline_resume_equals_uninterrupted(spark, tmp_path):
    """Kill the pipeline mid-run, resume, compare to an uninterrupted run."""
    n = 400
    images = images_df(spark, n)
    packed = pack_polygons(make_polygons(20))

    a_base = str(tmp_path / "a")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_pipeline(spark, images, a_base, packed, n_chunks=4, fail_after=2)
    assert len(CheckpointedWriter(a_base).committed()) == 2
    run_pipeline(spark, images, a_base, packed, n_chunks=4)  # resume

    b_base = str(tmp_path / "b")
    run_pipeline(spark, images, b_base, packed, n_chunks=4)  # uninterrupted

    wa, wb = CheckpointedWriter(a_base), CheckpointedWriter(b_base)
    for name in ("images", "assignments"):
        da = wa.read(spark, name)
        db = wb.read(spark, name)
        assert da.count() == db.count()
        assert da.exceptAll(db).isEmpty()
        assert db.exceptAll(da).isEmpty()

    # caption invariant: every input caption survives byte-equal
    src = {r["image_id"]: r["caption"] for r in images.collect()}
    out = wa.read(spark, "images").select("image_id", "caption").collect()
    assert len(out) == n
    for r in out:
        assert r["caption"] == src[r["image_id"]]


def test_pipeline_file_chunking_single_scan(spark, tmp_path):
    """Path input stripes source FILES across chunks: each chunk reads only
    its own files (no re-scan), union of chunk outputs == full input."""
    from rio_color_spark.pipeline import chunk_readers

    n = 300
    src = str(tmp_path / "src")
    images_df(spark, n).repartition(8).write.parquet(src)

    readers = chunk_readers(spark, src, 4)
    seen_files: set[str] = set()
    total = 0
    for r in readers:
        df = r()
        files = set(df.inputFiles())
        assert not (files & seen_files)  # disjoint stripes
        seen_files |= files
        total += df.count()
    assert total == n
    assert seen_files == set(spark.read.parquet(src).inputFiles())


def test_fused_pip_matches_standalone_join(spark, tmp_path):
    """index_and_color(packed=...)'s poly_ids == the standalone
    point_in_polygon_join's pair set (bbox candidates vs tile-cover
    candidates, same ray-cast kernel)."""
    from rio_color_spark.operators.color import index_and_color
    from rio_color_spark.operators.spatial import with_spatial_index
    from rio_color_spark.operators.spatial_join import point_in_polygon_join

    images = images_df(spark, 400)
    packed = pack_polygons(make_polygons(25))

    fused = index_and_color(images, FLAGSHIP_OPS, packed=packed)
    got = {
        (r["image_id"], pid)
        for r in fused.select("image_id", "poly_ids").collect()
        for pid in r["poly_ids"]
    }
    idx = with_spatial_index(images.drop("bytes"), zoom=12, level=12)
    want = {
        (r["image_id"], r["poly_id"])
        for r in point_in_polygon_join(idx, packed, zoom=12)
        .select("image_id", "poly_id")
        .collect()
    }
    assert got == want
    assert len(got) > 0


def test_writer_creation_options_applied(spark, tmp_path):
    """--co analogue: writer creation options reach every chunk write."""
    w = CheckpointedWriter(str(tmp_path / "o"), {"compression": "gzip"})
    w.write_chunk(spark.range(10), 0)
    files = [
        f for f in os.listdir(w.chunk_path(0))
        if f.endswith(".parquet")
    ]
    assert files and all(".gz." in f for f in files)
    assert w.read(spark).count() == 10



def test_resume_rejects_rewritten_source(spark, tmp_path):
    """File-striped resume must fail fast when the source layout changed
    between runs (the manifest records each stripe's file-list hash)."""
    src = str(tmp_path / "src")
    images_df(spark, 200, partitions=4).write.mode("overwrite").parquet(src)
    packed = pack_polygons(make_polygons(5))
    base = str(tmp_path / "out")
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_pipeline(spark, src, base, packed, n_chunks=2, fail_after=1)
    # rewrite/compact the source: same rows, different file layout
    images_df(spark, 200, partitions=7).write.mode("overwrite").parquet(src)
    with pytest.raises(RuntimeError, match="stripe changed"):
        run_pipeline(spark, src, base, packed, n_chunks=2)


def test_lineage_df_is_queryable(spark, tmp_path):
    w = CheckpointedWriter(str(tmp_path / "out"))
    run_resumable(w, 3, lambda k: spark.range(k * 10, (k + 1) * 10))
    lin = w.lineage_df(spark)
    assert lin.filter("name = 'data'").count() == 3
    assert lin.groupBy().sum("n_rows").collect()[0][0] == 30


def test_pipeline_snapshot_sink_addfiles(spark, tmp_path):
    """With snapshot_base, each chunk lands as a metadata-only add-files
    snapshot (zero data copy): per-chunk time travel, idempotent resume,
    and crash-window healing between the two ledgers."""
    from rio_color_spark.sources.snapshots import SnapshotTable

    n = 300
    images = images_df(spark, n)
    packed = pack_polygons(make_polygons(12))
    base = str(tmp_path / "out")
    snap_base = str(tmp_path / "snap")

    with pytest.raises(RuntimeError, match="simulated crash"):
        run_pipeline(spark, images, base, packed, n_chunks=3, fail_after=2,
                     snapshot_base=snap_base)
    t = SnapshotTable(snap_base)
    snaps = t.metadata()["snapshots"]
    assert [s["summary"]["pipeline_chunk"] for s in snaps] == [0, 1]
    assert all(s["operation"] == "add-files" for s in snaps)
    mid_rows = t.read(spark).count()
    mid_sid = t.metadata()["current_snapshot_id"]

    run_pipeline(spark, images, base, packed, n_chunks=3,
                 snapshot_base=snap_base)  # resume: no duplicate commits
    snaps = t.metadata()["snapshots"]
    assert [s["summary"]["pipeline_chunk"] for s in snaps] == [0, 1, 2]

    # snapshot read == the writer's own readback, bytes included
    via_snap = t.read(spark)
    via_writer = CheckpointedWriter(base).read(spark, "images")
    assert via_snap.count() == via_writer.count() == n
    assert (via_snap.select("image_id", F.md5("bytes").alias("h"))
            .exceptAll(via_writer.select("image_id", F.md5("bytes").alias("h")))
            .count() == 0)
    # time travel back to the 2-chunk state
    assert t.read(spark, snapshot_id=mid_sid).count() == mid_rows

    # crash-window healing: wipe the snapshot log, rerun — all committed
    # chunks re-register without recomputation (no new chunk parquet)
    import shutil
    shutil.rmtree(snap_base)
    run_pipeline(spark, images, base, packed, n_chunks=3,
                 snapshot_base=snap_base)
    t2 = SnapshotTable(snap_base)
    assert [s["summary"]["pipeline_chunk"]
            for s in t2.metadata()["snapshots"]] == [0, 1, 2]
    assert t2.read(spark).count() == n


def test_add_files_contract(spark, tmp_path):
    """add_files validates schema coverage, refuses partitioned specs, and
    never lets expire GC imported (external) files."""
    from rio_color_spark.sources.snapshots import SnapshotTable

    ext = str(tmp_path / "ext")
    spark.range(0, 20).selectExpr("id AS a", "id * 2 AS b").write.parquet(ext)
    files = sorted(os.path.join(ext, f) for f in os.listdir(ext)
                   if f.endswith(".parquet"))

    t = SnapshotTable.create(str(tmp_path / "t"), "a bigint, b bigint")
    t.add_files(files, summary_extra={"src": "ext"})
    assert t.read(spark).count() == 20
    assert t.current_snapshot()["operation"] == "add-files"
    # min/max stats came from footers → pruning works on imported files
    kept, report = t.plan_files(predicates={"a": (1000, None)})
    assert report["files_scanned"] == 0

    # imported files survive expire (they live outside data/)
    t.overwrite(spark.range(0, 5).selectExpr("id AS a", "id AS b"))
    t.expire_snapshots(keep_last=1)
    assert all(os.path.exists(p) for p in files)

    t2 = SnapshotTable.create(str(tmp_path / "t2"), "a bigint, missing int")
    with pytest.raises(ValueError, match="missing table columns"):
        t2.add_files(files)
    t3 = SnapshotTable.create(str(tmp_path / "t3"), "a bigint, b bigint",
                              partition_spec=[("bucket", "a", 4)])
    with pytest.raises(ValueError, match="unpartitioned"):
        t3.add_files(files)
    with pytest.raises(ValueError, match="at least one"):
        t.add_files([])


def test_stripe_schema_matches_spark(spark, tmp_path):
    """The pyarrow footer→StructType shortcut used by chunk_plan must equal
    Spark's own inference exactly (it feeds spark.read.schema on every
    stripe), including binary/string/int widths of the images table."""
    from rio_color_spark.pipeline import _list_data_files, _stripe_schema

    src = str(tmp_path / "src")
    images_df(spark, 50).write.parquet(src)
    files, flat = _list_data_files(spark, src)
    assert flat and files
    assert _stripe_schema(spark, files[0]) == spark.read.parquet(src).schema


def test_single_stripe_reads_whole_dir(spark, tmp_path):
    """n_chunks=1 takes the directory fast path (one root path, no per-file
    index) and still reads exactly the table's data files."""
    from rio_color_spark.pipeline import chunk_plan

    src = str(tmp_path / "src")
    images_df(spark, 60).repartition(4).write.parquet(src)
    readers, fps = chunk_plan(spark, src, 1)
    df = readers[0]()
    assert df.count() == 60
    assert set(df.inputFiles()) == set(spark.read.parquet(src).inputFiles())
    assert df.schema == spark.read.parquet(src).schema
    assert fps[0] is not None
