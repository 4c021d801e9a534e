"""SparkSession factory tuned for the image pipeline.

Arrow is the JVM↔Python wire for every pixel operator, so the session pins
the Arrow batch size (the analogue of the reference's 32×32 block windows —
cli.py:81-83 — which bounded memory per work unit) and enables AQE for
runtime re-planning of the spatial joins.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: rows per Arrow batch crossing into Python workers. At the default 32×32
#: uint8 RGB payload (~3 KiB/row) this bounds a batch to ~2 MiB, keeping
#: per-task memory flat regardless of partition size.
ARROW_BATCH_ROWS = 512


def get_spark(
    app_name: str = "rio_color_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's tuning applied.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (all cores if the
    env var is unset). On a real cluster, pass ``master=None`` and let
    spark-submit supply it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(ARROW_BATCH_ROWS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.compression.codec", "zstd")
        # binary image payloads compress poorly and dictionary-encode worse
        .config("spark.sql.parquet.enableVectorizedReader", "true")
        .config("spark.ui.enabled", os.environ.get("SPARK_GRAFT_UI", "false"))
    )
    return builder.getOrCreate()
