"""Structured Streaming variants of the engine's operators.

The reference is strictly batch (SURVEY.md §2.4 "Streaming: none"); these
are net-new, for continuously-arriving image tables:

- :func:`stream_color_correct` — the fused color operator is a narrow
  ``mapInPandas``, so it lifts to streaming unchanged: file-source →
  index → color → parquet sink with exactly-once checkpointing. With
  ``availableNow`` it doubles as an incremental batch runner (the
  streaming analogue of the chunked resume loop in sources/catalog.py).
- :func:`stream_windowed_counts` — watermarked tumbling-window counts for
  late-data-tolerant event aggregation.
- :func:`stream_cell_counts_stateful` — custom stateful operator via
  ``applyInPandasWithState``: running per-cell image counts maintained in
  GroupState across micro-batches.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from rio_color_spark.operators.color import index_and_color
from rio_color_spark.sources.images import IMAGES_SCHEMA


def read_image_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(IMAGES_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path)


def stream_color_correct(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint_path: str,
    ops: str,
    zoom: int = 12,
    level: int = 12,
    available_now: bool = True,
):
    """Streaming index + fused color-correct → parquet sink.

    Returns the started StreamingQuery; with ``available_now`` the query
    drains everything currently in ``input_path`` then stops (incremental
    batch mode — re-running picks up only new files, exactly-once via the
    checkpoint).
    """
    stream = read_image_stream(spark, input_path)
    # fused index+color: ONE Python worker set per micro-batch task (the
    # with_spatial_index → color_correct chain is two, which collapses at
    # high local parallelism — see operators/color.index_and_color)
    out = index_and_color(stream, ops, zoom=zoom, level=level)
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint_path)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_windowed_counts(
    events: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Watermarked tumbling-window counts per event_type (late-data safe)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window(F.col("ts"), window).alias("win"), F.col("event_type"))
        .agg(F.count("*").alias("n"))
        .select(F.col("win")["start"].alias("win_start"), "event_type", "n")
    )


_STATE_SCHEMA = "total long"
_OUTPUT_SCHEMA = "cell_id long, total long"


def _update_cell_count(key, pdfs, state: GroupState):
    (cell_id,) = key
    seen = state.get[0] if state.exists else 0
    for pdf in pdfs:
        seen += len(pdf)
    state.update((seen,))
    yield pd.DataFrame({"cell_id": [cell_id], "total": [seen]})


def stream_cell_counts_stateful(indexed_stream: DataFrame) -> DataFrame:
    """Running per-cell image counts via applyInPandasWithState.

    State = one int64 per cell; output = the updated running total each
    micro-batch. ``indexed_stream`` needs a ``cell_id`` column.
    """
    return (
        indexed_stream.select("cell_id")
        .groupBy("cell_id")
        .applyInPandasWithState(
            _update_cell_count,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
