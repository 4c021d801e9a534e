"""GeoTIFF ⇄ image-table bridge — the engine's analogue of the reference's
windowed raster IO (reference rio_color/scripts/cli.py:81-121 reads GeoTIFF
windows via riomucho and writes them back preserving profile + creation
options + colorinterp; tests/test_cli.py:121-169,199-219 pin that contract).

Spark-first shape:

- **ingest** — the DRIVER parses only the TIFF header (tag area; no pixel
  bytes), turning the raster into a DataFrame of chunk byte-ranges; each
  TASK then reads and decodes its own disjoint tile ranges
  (``mapInPandas``) and emits image-table rows. A 100 GB GeoTIFF on a
  shared filesystem ingests as a fully parallel scan — pixel data never
  passes through the driver.
- **export** — tasks encode + compress their tiles (the CPU-heavy step);
  the driver only concatenates opaque compressed payloads into the
  single-file container (a single .tif has one writer by construction —
  the same constraint rasterio has).
- every chunk row lands in the standard images schema (sources/images.py
  ``IMAGES_SCHEMA``), so the ENTIRE existing operator surface — color
  chains, optimize, histograms, dedup of captions, … — runs on ingested
  rasters unchanged. The tile grid is per-pixel-op safe: every DSL
  operation (gamma/sigmoidal/saturation/atmo) is pointwise, the same
  property the reference exploits to process by riomucho windows
  (reference scripts/cli.py:108-121).

The container profile (dtype, tiling, compression, photometric,
ExtraSamples, GeoTIFF/GDAL tags) rides in a ``_tiff_profile.json``
manifest inside the table directory — underscore-prefixed, so Spark's
listing treats it as a non-data file (pipeline._list_data_files applies
the same rule).
"""

from __future__ import annotations

import json
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from rio_color_spark.sources import codec
from rio_color_spark.sources import tiff as T
from rio_color_spark.sources.images import IMAGES_SCHEMA, phash_for

MANIFEST = "_tiff_profile.json"

#: header bytes the driver reads to parse the IFD. Tag payloads live right
#: after the IFD in every GDAL/libtiff layout; 4 MiB covers offset arrays
#: for rasters into the tens of terapixels. Chunk PIXEL data is never read.
_HEADER_BYTES = 4 << 20

_CHUNK_META_SCHEMA = (
    "index int, row0 int, col0 int, width int, height int, "
    "stored_width int, stored_height int, offset long, nbytes long"
)


def _profile_to_json(prof: T.TiffProfile, n_chunks: int, source: str) -> str:
    return json.dumps(
        {
            "width": prof.width,
            "height": prof.height,
            "count": prof.count,
            "dtype": prof.dtype,
            "compression": prof.compression,
            "predictor": prof.predictor,
            "photometric": prof.photometric,
            "extrasamples": list(prof.extrasamples),
            "tiled": prof.tiled,
            "tile_width": prof.tile_width,
            "tile_height": prof.tile_height,
            "rows_per_strip": prof.rows_per_strip,
            "geo": {str(t): [typ, cnt, payload.hex()] for t, (typ, cnt, payload) in prof.geo.items()},
            "n_chunks": n_chunks,
            "source": source,
        },
        indent=1,
    )


def _profile_from_json(s: str) -> tuple[T.TiffProfile, int]:
    d = json.loads(s)
    prof = T.TiffProfile(
        width=d["width"],
        height=d["height"],
        count=d["count"],
        dtype=d["dtype"],
        compression=d["compression"],
        predictor=d["predictor"],
        photometric=d["photometric"],
        extrasamples=tuple(d["extrasamples"]),
        tiled=d["tiled"],
        tile_width=d["tile_width"],
        tile_height=d["tile_height"],
        rows_per_strip=d["rows_per_strip"],
        geo={int(t): (v[0], v[1], bytes.fromhex(v[2])) for t, v in d["geo"].items()},
    )
    return prof, d["n_chunks"]


def read_profile(table_path: str) -> tuple[T.TiffProfile, int]:
    with open(os.path.join(table_path, MANIFEST)) as f:
        return _profile_from_json(f.read())


def ingest_tiff(
    spark: SparkSession, tif_path: str, table_path: str, parallelism: int | None = None
) -> None:
    """GeoTIFF → parquet image table (one row per tile/strip) + manifest."""
    tif_path = os.path.abspath(tif_path)
    size = os.path.getsize(tif_path)
    with open(tif_path, "rb") as f:
        head = f.read(min(size, _HEADER_BYTES))
    prof, chunks = T.read_ifd(head)
    fmt = codec.fmt_for_dtype(prof.np_dtype, prof.count)
    stem = os.path.splitext(os.path.basename(tif_path))[0]

    meta = pd.DataFrame(
        {
            "index": [c.index for c in chunks],
            "row0": [c.row0 for c in chunks],
            "col0": [c.col0 for c in chunks],
            "width": [c.width for c in chunks],
            "height": [c.height for c in chunks],
            "stored_width": [c.stored_width for c in chunks],
            "stored_height": [c.stored_height for c in chunks],
            "offset": [c.offset for c in chunks],
            "nbytes": [c.nbytes for c in chunks],
        }
    )
    if parallelism is None:
        parallelism = max(1, min(spark.sparkContext.defaultParallelism, len(chunks)))
    meta_df = spark.createDataFrame(meta, schema=_CHUNK_META_SCHEMA).repartition(
        parallelism
    )

    # decoder state shipped by value (tiny): the profile dict, not the file
    prof_json = _profile_to_json(prof, len(chunks), tif_path)

    def decode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p, _ = _profile_from_json(prof_json)
        with open(tif_path, "rb") as f:
            for pdf in batches:
                out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
                for r in pdf.itertuples(index=False):
                    f.seek(r.offset)
                    raw = f.read(r.nbytes)
                    ch = T.ChunkRef(
                        r.index, r.row0, r.col0, r.width, r.height,
                        r.stored_width, r.stored_height, r.offset, r.nbytes,
                    )
                    arr = T.decode_chunk(raw, p, ch)
                    out["image_id"].append(f"{stem}:{r.index:06d}")
                    out["bytes"].append(codec.encode(arr, fmt))
                    out["w"].append(int(r.width))
                    out["h"].append(int(r.height))
                    out["fmt"].append(fmt)
                    out["caption"].append(tif_path)
                    out["phash"].append(int(phash_for(np.array([r.index]))[0]))
                yield pd.DataFrame(out)

    rows = meta_df.mapInPandas(decode_rows, schema=IMAGES_SCHEMA)
    rows.write.mode("overwrite").parquet(table_path)
    with open(os.path.join(table_path, MANIFEST), "w") as f:
        f.write(prof_json)


def export_tiff(
    spark: SparkSession,
    table_path: str,
    tif_path: str,
    creation_options: dict[str, str] | None = None,
) -> None:
    """Image table (+ manifest) → single GeoTIFF.

    Chunk compression runs on executors; the driver assembles the
    container from opaque payloads in index order. Creation options
    (``--co compress=deflate`` etc.) override the preserved profile, the
    reference's GDAL-option contract (tests/test_cli.py:121-169).
    """
    prof, n_chunks = read_profile(table_path)
    df = spark.read.parquet(table_path)
    rows_fmt = df.select("fmt").limit(1).collect()
    if not rows_fmt:
        raise ValueError(f"empty image table: {table_path}")
    fmt = rows_fmt[0]["fmt"]
    info = codec.format_info(fmt)
    # the table's payload dtype/band-count wins (e.g. after --out-dtype):
    out_prof = T.TiffProfile(
        width=prof.width,
        height=prof.height,
        count=info.bands,
        dtype="uint16" if info.dtype.itemsize == 2 else "uint8",
        compression=prof.compression,
        predictor=prof.predictor,
        photometric=prof.photometric,
        extrasamples=prof.extrasamples[: max(0, info.bands - 3)],
        tiled=prof.tiled,
        tile_width=prof.tile_width,
        tile_height=prof.tile_height,
        rows_per_strip=prof.rows_per_strip,
        geo=prof.geo,
    )
    if creation_options:
        out_prof = T.apply_creation_options(out_prof, creation_options)
    if (out_prof.tiled, out_prof.tile_width, out_prof.tile_height, out_prof.rows_per_strip) != (
        prof.tiled, prof.tile_width, prof.tile_height, prof.rows_per_strip
    ):
        raise NotImplementedError(
            "export re-tiling not supported: ingest and export must share a "
            "chunk grid (pass matching blockxsize/blockysize or none)"
        )
    prof_json = _profile_to_json(out_prof, n_chunks, tif_path)

    def encode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p, _ = _profile_from_json(prof_json)
        for pdf in batches:
            idxs, payloads = [], []
            for r in pdf.itertuples(index=False):
                idx = int(r.image_id.rsplit(":", 1)[1])
                arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
                if p.tiled:
                    sw, sh = p.tile_width, p.tile_height
                else:
                    sw, sh = p.width, r.h
                idxs.append(idx)
                payloads.append(T.encode_chunk(arr, p, sw, sh))
            yield pd.DataFrame({"index": idxs, "payload": payloads})

    enc = df.mapInPandas(encode_rows, schema="index int, payload binary")
    collected = enc.collect()
    if len(collected) != n_chunks:
        raise ValueError(
            f"table has {len(collected)} chunks, manifest expects {n_chunks}"
        )
    payloads: list[bytes | None] = [None] * n_chunks
    for row in collected:
        payloads[row["index"]] = bytes(row["payload"])
    if any(p is None for p in payloads):
        raise ValueError("missing chunk payloads in table")
    T.write_tiff_chunks(tif_path, payloads, out_prof)  # type: ignore[arg-type]


def is_tiff_path(path: str) -> bool:
    return path.lower().endswith((".tif", ".tiff"))


def color_correct_tiff(
    spark: SparkSession,
    src_tif: str,
    dst_tif: str,
    ops_string: str,
    out_dtype: str | None = None,
    creation_options: dict[str, str] | None = None,
    work_dir: str | None = None,
) -> None:
    """End-to-end ``rio color SRC.tif DST.tif OPS`` twin: distributed
    ingest → fused color chain → distributed encode → container write.

    The intermediate table lives in ``work_dir`` (a temp dir by default)
    — on a cluster point it at shared storage."""
    import shutil
    import tempfile

    from rio_color_spark.operators.color import color_correct

    tmp = work_dir or tempfile.mkdtemp(prefix="rio_color_spark_tiff_")
    src_table = os.path.join(tmp, "src_table")
    dst_table = os.path.join(tmp, "dst_table")
    try:
        ingest_tiff(spark, src_tif, src_table)
        df = spark.read.parquet(src_table)
        out = color_correct(df, ops_string, out_dtype=out_dtype)
        out.write.mode("overwrite").parquet(dst_table)
        # profile travels with the table; pixel dtype may have changed
        with open(os.path.join(src_table, MANIFEST)) as f:
            prof_json = f.read()
        with open(os.path.join(dst_table, MANIFEST), "w") as f:
            f.write(prof_json)
        export_tiff(spark, dst_table, dst_tif, creation_options)
    finally:
        if work_dir is None:
            shutil.rmtree(tmp, ignore_errors=True)
