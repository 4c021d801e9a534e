"""The flagship end-to-end pipeline (BASELINE.json metric):

    read images → spatial index (lon/lat, XYZ tiles, cells)
        → PIP broadcast join (assignments, pixel-free)
        → fused color-correct (single mapInPandas)
        → chunked checkpointed write (images + assignments + lineage)

Plan properties at scale:

- the ONLY wide dependency in the whole job is the parquet write's file
  layout; indexing, PIP (broadcast), and color are all narrow — a chunk is
  one scan → map → write lineage-committed unit
- ``bytes`` never enters the assignment branch (column pruning: the PIP
  path projects the ~60-byte metadata columns only)
- resume: committed chunks are skipped at the driver; with Iceberg, the
  chunk key is the table partition column so the skip prunes at the scan
  (SURVEY.md §4.2); on the Parquet facade it's a scan filter
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rio_color_spark.functions.pip import PackedPolygons
from rio_color_spark.operators.color import index_and_color
from rio_color_spark.operators.knn import knn_join
from rio_color_spark.operators.spatial_join import point_in_polygon_join
from rio_color_spark.sources.catalog import CheckpointedWriter

#: the reference README's canonical example chain (README.md:29-47)
FLAGSHIP_OPS = "gamma b 1.85, gamma rg 1.95, sigmoidal rgb 35 0.13, saturation 1.15"


def run_pipeline(
    spark: SparkSession,
    images: DataFrame,
    out_base: str,
    packed: PackedPolygons,
    ops: str = FLAGSHIP_OPS,
    zoom: int = 12,
    level: int = 12,
    n_chunks: int = 4,
    knn_k: int = 0,
    knn_level: int = 4,
    fail_after: int | None = None,
) -> CheckpointedWriter:
    """Run (or resume) the pipeline; returns the writer for readback.

    ``fail_after`` simulates a crash after N chunk commits (resume tests).
    """
    writer = CheckpointedWriter(out_base)
    chunk_col = F.pmod(F.xxhash64(F.col("image_id")), F.lit(n_chunks))

    done = writer.committed()
    completed = 0
    for k in range(n_chunks):
        if k in done:
            continue
        part = images.filter(chunk_col == k)
        # job 1: index + color fused — exactly ONE Python worker set per
        # task (two chained Python stages collapse at high local
        # parallelism; see operators/color.index_and_color)
        colored = index_and_color(part, ops, zoom=zoom, level=level)
        paths = {"images": writer.write_data(colored, "images", k)}

        # job 2: assignments from the WRITTEN output — bytes pruned at the
        # scan, cell/tile reused, again one Python stage (the PIP filter)
        spark_ = images.sparkSession
        meta = spark_.read.parquet(paths["images"]).select(
            "image_id", "lon", "lat", "tile_x", "tile_y", "tile_z",
            "tile_xyz", "cell_id",
        )
        assignments = point_in_polygon_join(meta, packed, zoom=zoom).select(
            "image_id", "poly_id", "cell_id", "tile_xyz"
        )
        paths["assignments"] = writer.write_data(assignments, "assignments", k)

        if knn_k:
            knn_meta = meta.withColumn(
                "cell_id",
                F.shiftright(F.col("cell_id"), 2 * (level - knn_level)),
            )
            paths["knn"] = writer.write_data(
                knn_join(knn_meta, k=knn_k, level=knn_level), "knn", k
            )

        writer.commit_chunk(k, paths)
        completed += 1
        if fail_after is not None and completed >= fail_after:
            raise RuntimeError(f"simulated crash after {completed} chunks")
    return writer
