"""Watermarked windowed aggregation + applyInPandasWithState tests."""

import pandas as pd

from rio_color_spark.operators.spatial import with_spatial_index
from rio_color_spark.sources.images import IMAGES_SCHEMA, images_df
from rio_color_spark.streaming.pipeline import (
    read_image_stream,
    stream_cell_counts_stateful,
    stream_windowed_counts,
)


def test_windowed_counts_with_watermark(spark, tmp_path):
    inp = str(tmp_path / "ev")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet").write.parquet(inp)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).parquet(inp)

    out = stream_windowed_counts(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "select sum(n) as total from wincounts"
    ).collect()
    # append mode only emits windows the watermark has passed; the final
    # (open) windows are withheld — total is positive but < all events
    batch_total = spark.read.parquet(inp).count()
    assert got[0]["total"] is not None and 0 < got[0]["total"] <= batch_total


def test_stateful_cell_counts_accumulate(spark, tmp_path):
    # several input files → several micro-batches in ONE query (1 file per
    # trigger), so state visibly accumulates across micro-batches
    inp = str(tmp_path / "imgs")
    images_df(spark, 100, partitions=5).write.parquet(inp)
    stream = with_spatial_index(
        read_image_stream(spark, inp, max_files_per_trigger=1), zoom=4, level=2
    )
    out = stream_cell_counts_stateful(stream)
    q = (
        out.writeStream.format("memory")
        .queryName("cellcounts")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("select * from cellcounts").collect()
    # several micro-batches → repeated updates for the same cell
    assert len(rows) > len({r["cell_id"] for r in rows})
    # totals per cell increase monotonically → the max is the final total
    final = {}
    for r in rows:
        final[r["cell_id"]] = max(final.get(r["cell_id"], 0), r["total"])
    expect = {
        r["cell_id"]: r["cnt"]
        for r in with_spatial_index(spark.read.parquet(inp), zoom=4, level=2)
        .groupBy("cell_id")
        .count()
        .withColumnRenamed("count", "cnt")
        .collect()
    }
    assert final == expect
    assert sum(final.values()) == 100


def test_available_now_drain_matches_batch(spark, tmp_path):
    """drain_windowed_agg (file stream → window agg → complete-mode memory
    sink) reproduces the batch twin exactly on a bounded input."""
    import pandas as pd
    from pyspark.sql import functions as F

    from rio_color_spark.streaming.pipeline import drain_windowed_agg

    pdf = pd.DataFrame(
        {
            "ts": pd.date_range("2024-01-01", periods=500, freq="7s"),
            "event_type": [f"t{i % 3}" for i in range(500)],
            "value": [i * 0.25 for i in range(500)],
        }
    )
    src = str(tmp_path / "events")
    spark.createDataFrame(pdf).write.mode("overwrite").parquet(src)

    got = (
        drain_windowed_agg(spark, src)
        .select(F.col("win")["start"].alias("ws"), "event_type", "n", "sum_value")
        .toPandas()
        .sort_values(["ws", "event_type"])
        .reset_index(drop=True)
    )
    want = (
        spark.read.parquet(src)
        .groupBy(F.window("ts", "1 minute").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("win")["start"].alias("ws"), "event_type", "n", "sum_value")
        .toPandas()
        .sort_values(["ws", "event_type"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want)
