"""Multimodal column operators: decode-dependent transforms over the opaque
``bytes`` payload.

Real (self-contained, no external codecs needed for the npy* formats):

- :func:`with_band_stats` — per-image per-band mean/std/min/max feature
  extraction (the "embed an image" plumbing: binary → ndarray → features)
- :func:`resize_images` — nearest-neighbor resize entirely in NumPy
  index arithmetic; rewrites bytes/w/h

Stubbed (the container has no image/audio/video libraries — BASELINE.json
environment; the Spark-side plumbing — schema, batching, UDF signatures —
is identical and tested):

- :func:`sample_frames` — video frame sampling; raises NotImplementedError
  for real video formats, and for ``npy*`` treats the single image as a
  1-frame clip (deterministic fake) so the pipeline shape is exercised.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from rio_color_spark.sources import codec

STATS_SCHEMA = (
    "image_id string, fmt string, band int, mean double, std double, "
    "min double, max double"
)


def with_band_stats(df: DataFrame) -> DataFrame:
    """Per-band pixel statistics in the [0,1] math domain (long format)."""
    from rio_color_spark.functions.utils import to_math_type

    def stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = to_math_type(
                    codec.decode(r["bytes"], r["w"], r["h"], r["fmt"])
                )
                flat = arr.reshape(arr.shape[0], -1)
                for b in range(arr.shape[0]):
                    rows.append(
                        (
                            r["image_id"],
                            r["fmt"],
                            b,
                            float(flat[b].mean()),
                            float(flat[b].std()),
                            float(flat[b].min()),
                            float(flat[b].max()),
                        )
                    )
            yield pd.DataFrame(
                rows,
                columns=["image_id", "fmt", "band", "mean", "std", "min", "max"],
            )

    return df.mapInPandas(stats, schema=STATS_SCHEMA)


def resize_images(df: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize of every image to (out_h, out_w).

    Pure NumPy fancy indexing — no interpolation library needed; pixel (i, j)
    maps to source (floor((i+0.5)*h/out_h), floor((j+0.5)*w/out_w)).
    """
    schema = df.schema

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            new_bytes = []
            for _, r in pdf.iterrows():
                arr = codec.decode(r["bytes"], r["w"], r["h"], r["fmt"])
                rows = np.minimum(
                    ((np.arange(out_h) + 0.5) * r["h"] / out_h).astype(np.int64),
                    r["h"] - 1,
                )
                cols = np.minimum(
                    ((np.arange(out_w) + 0.5) * r["w"] / out_w).astype(np.int64),
                    r["w"] - 1,
                )
                resized = arr[:, rows[:, None], cols[None, :]]
                new_bytes.append(codec.encode(resized, r["fmt"]))
            out["bytes"] = new_bytes
            out["w"] = out_w
            out["h"] = out_h
            yield out

    return df.mapInPandas(run, schema=schema)


FRAME_SCHEMA = "image_id string, frame int, bytes binary, w int, h int, fmt string"

#: video formats a real deployment would register decoders for
_VIDEO_FMTS = {"mp4", "webm", "mkv"}


def sample_frames(df: DataFrame, every_k: int = 1) -> DataFrame:
    """Frame sampling over video payloads (plumbing real, decoder stubbed).

    ``npy*`` images pass through as single-frame clips; real video formats
    raise NotImplementedError inside the task (fail-fast), documenting the
    decoder seam without pretending to decode.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                if r["fmt"] in _VIDEO_FMTS:
                    raise NotImplementedError(
                        f"video codec {r['fmt']!r} requires a decoder library "
                        "not present in this environment"
                    )
                if 0 % max(every_k, 1) == 0:  # frame 0 of a 1-frame clip
                    rows.append(
                        (r["image_id"], 0, r["bytes"], r["w"], r["h"], r["fmt"])
                    )
            yield pd.DataFrame(
                rows, columns=["image_id", "frame", "bytes", "w", "h", "fmt"]
            )

    return df.mapInPandas(run, schema=FRAME_SCHEMA)
