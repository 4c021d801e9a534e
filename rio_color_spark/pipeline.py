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
from rio_color_spark.operators.color import color_correct
from rio_color_spark.operators.knn import knn_join
from rio_color_spark.operators.spatial import with_spatial_index
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
        idx = with_spatial_index(part, zoom=zoom, level=level)
        meta = idx.drop("bytes")  # assignment branch never carries pixels
        outputs = {
            "images": color_correct(idx, ops),
            "assignments": point_in_polygon_join(meta, packed, zoom=zoom).select(
                "image_id", "poly_id", "cell_id", "tile_xyz"
            ),
        }
        if knn_k:
            knn_idx = with_spatial_index(part, zoom=zoom, level=knn_level).drop(
                "bytes"
            )
            outputs["knn"] = knn_join(knn_idx, k=knn_k, level=knn_level)
        writer.write_chunk_multi(outputs, k)
        completed += 1
        if fail_after is not None and completed >= fail_after:
            raise RuntimeError(f"simulated crash after {completed} chunks")
    return writer
