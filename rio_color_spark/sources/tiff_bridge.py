"""GeoTIFF ⇄ image-table bridge — the engine's analogue of the reference's
windowed raster IO (reference rio_color/scripts/cli.py:81-121 reads GeoTIFF
windows via riomucho and writes them back preserving profile + creation
options + colorinterp; tests/test_cli.py:121-169,199-219 pin that contract).

Spark-first shape:

- **ingest** — the DRIVER parses only the TIFF structure (header, IFD,
  tag payloads — wherever they live in the file; libtiff writes them at
  the tail) through a range-read fetch, turning the raster into a
  DataFrame of chunk byte-ranges; each TASK then reads and decodes its
  own disjoint tile ranges (``mapInPandas``) and emits image-table rows.
  A 100 GB (Big)TIFF on a shared filesystem ingests as a fully parallel
  scan — pixel data never passes through the driver.
- **export** — tasks encode + compress their tiles (the CPU-heavy step);
  the driver streams opaque compressed payloads into the single-file
  container via ``toLocalIterator`` + :class:`tiff.TiffChunkWriter`
  (tail-written IFD, any arrival order), holding at most ONE Spark
  partition of compressed chunks at a time — never the whole raster.
  A single .tif has one writer by construction — the same constraint
  rasterio has. Containers past 4 GiB need ``--co bigtiff=yes``.
- **re-tiling** — when creation options change the chunk grid
  (blockxsize/blockysize/tiled), pixel blocks are re-gridded on
  executors: each source chunk splits into target-aligned pieces,
  one shuffle co-locates the pieces of each target chunk, and
  ``applyInPandas`` assembles + encodes it. The pointwise-op property
  makes the result exact (same full-raster array, new grid).
- every chunk row lands in the standard images schema (sources/images.py
  ``IMAGES_SCHEMA``), so the ENTIRE existing operator surface — color
  chains, optimize, histograms, dedup of captions, … — runs on ingested
  rasters unchanged.

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

#: bytes the driver prefetches before structure parsing. GDAL writes the
#: IFD header-first so this one read usually suffices; anything outside
#: the window (tail-written IFDs, far tag payloads) is range-read on
#: demand through tiff.file_fetch — never silently truncated.
_HEADER_BYTES = 4 << 20

#: one row per SPATIAL chunk; planar (band-separate) sources carry one
#: (offset, nbytes) pair per band in plane order — chunky sources one pair
_CHUNK_META_SCHEMA = (
    "index int, row0 int, col0 int, width int, height int, "
    "stored_width int, stored_height int, offsets array<long>, "
    "nbytess array<long>"
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
            "bigtiff": prof.bigtiff,
            "jpeg_quality": prof.jpeg_quality,
            "planar": prof.planar,
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
        bigtiff=d.get("bigtiff", False),
        jpeg_quality=d.get("jpeg_quality", 95),
        planar=d.get("planar", 1),
        geo={int(t): (v[0], v[1], bytes.fromhex(v[2])) for t, v in d["geo"].items()},
    )
    return prof, d["n_chunks"]


def read_profile(table_path: str) -> tuple[T.TiffProfile, int]:
    with open(os.path.join(table_path, MANIFEST)) as f:
        return _profile_from_json(f.read())


def read_structure(tif_path: str) -> tuple[T.TiffProfile, list[T.ChunkRef]]:
    """Driver-side structure parse: prefetch a header window, range-read
    anything beyond it (tail IFDs, far tag payloads)."""
    size = os.path.getsize(tif_path)
    with open(tif_path, "rb") as f:
        prefix = f.read(min(size, _HEADER_BYTES))
        return T.read_ifd_fetch(T.file_fetch(f, prefix))


def ingest_tiff(
    spark: SparkSession, tif_path: str, table_path: str, parallelism: int | None = None
) -> None:
    """GeoTIFF → parquet image table (one row per tile/strip) + manifest."""
    tif_path = os.path.abspath(tif_path)
    prof, chunks = read_structure(tif_path)
    fmt = codec.fmt_for_dtype(prof.np_dtype, prof.count)
    stem = os.path.splitext(os.path.basename(tif_path))[0]

    # one ingest row per SPATIAL chunk: a planar (band-separate) source
    # contributes `count` byte ranges per row (one per band, plane order);
    # the executor decodes each plane and stacks — same full-band output
    # rows as a chunky source, no extra shuffle
    if prof.planar == 2:
        per_plane = len(chunks) // prof.count
        groups = [
            [chunks[p * per_plane + s] for p in range(prof.count)]
            for s in range(per_plane)
        ]
    else:
        groups = [[c] for c in chunks]

    meta = pd.DataFrame(
        {
            "index": [g[0].index for g in groups],
            "row0": [g[0].row0 for g in groups],
            "col0": [g[0].col0 for g in groups],
            "width": [g[0].width for g in groups],
            "height": [g[0].height for g in groups],
            "stored_width": [g[0].stored_width for g in groups],
            "stored_height": [g[0].stored_height for g in groups],
            "offsets": [[c.offset for c in g] for g in groups],
            "nbytess": [[c.nbytes for c in g] for g in groups],
        }
    )
    if parallelism is None:
        parallelism = max(1, min(spark.sparkContext.defaultParallelism, len(groups)))
    meta_df = spark.createDataFrame(meta, schema=_CHUNK_META_SCHEMA).repartition(
        parallelism
    )

    # decoder state shipped by value (tiny): the profile dict, not the
    # file; n_chunks counts SPATIAL chunks (== image-table rows)
    prof_json = _profile_to_json(prof, len(groups), tif_path)

    def decode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p, _ = _profile_from_json(prof_json)
        with open(tif_path, "rb") as f:
            for pdf in batches:
                out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt", "caption", "phash")}
                for r in pdf.itertuples(index=False):
                    planar = len(r.offsets) > 1
                    planes = []
                    for pi, (off, nb) in enumerate(zip(r.offsets, r.nbytess)):
                        f.seek(int(off))
                        raw = f.read(int(nb))
                        ch = T.ChunkRef(
                            r.index, r.row0, r.col0, r.width, r.height,
                            r.stored_width, r.stored_height, int(off),
                            int(nb), plane=pi if planar else -1,
                        )
                        planes.append(T.decode_chunk(raw, p, ch))
                    arr = (
                        planes[0] if len(planes) == 1
                        else np.concatenate(planes, axis=0)
                    )
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


def _planar_payloads(
    arr: np.ndarray, p: T.TiffProfile, sw: int, sh: int,
    spatial_idx: int, per_plane: int,
) -> list[tuple[int, bytes]]:
    """(global chunk index, payload) pairs for one full-band pixel block:
    one pair for chunky output; `count` plane-major pairs (index =
    plane * per_plane + spatial) for planar (INTERLEAVE=BAND) output."""
    if p.planar == 2:
        return [
            (pl * per_plane + spatial_idx,
             T.encode_chunk(arr[pl : pl + 1], p, sw, sh))
            for pl in range(arr.shape[0])
        ]
    return [(spatial_idx, T.encode_chunk(arr, p, sw, sh))]


def _encode_same_grid(df: DataFrame, prof_json: str) -> DataFrame:
    """Image-table rows → (index, payload): the source grid IS the target
    grid, so every row encodes independently (no shuffle at all)."""

    def encode_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        p, _ = _profile_from_json(prof_json)
        per_plane = len(T._chunk_grid(p))
        for pdf in batches:
            idxs, payloads = [], []
            for r in pdf.itertuples(index=False):
                idx = int(r.image_id.rsplit(":", 1)[1])
                arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
                if p.tiled:
                    sw, sh = p.tile_width, p.tile_height
                else:
                    sw, sh = p.width, r.h
                for gi, payload in _planar_payloads(
                    arr, p, sw, sh, idx, per_plane
                ):
                    idxs.append(gi)
                    payloads.append(payload)
            yield pd.DataFrame({"index": idxs, "payload": payloads})

    return df.mapInPandas(encode_rows, schema="index int, payload binary")


def _encode_regrid(df: DataFrame, in_prof_json: str, out_prof_json: str) -> DataFrame:
    """Image-table rows on the SOURCE grid → (index, payload) on the
    TARGET grid, fully distributed:

    1. ``mapInPandas``: decode each source chunk, slice it along target
       chunk boundaries, emit (target index, placement, raw pixel block)
    2. one shuffle co-locates each target chunk's pieces
    3. ``applyInPandas`` per target chunk: assemble the valid region,
       ``encode_chunk``

    Exactness: slicing + reassembly is a permutation of pixels, so the
    decoded full-raster array is identical to the source's — mirroring
    GDAL's ability to rewrite with any block size.
    """

    def split_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pin, _ = _profile_from_json(in_prof_json)
        pout, _ = _profile_from_json(out_prof_json)
        in_grid = T._chunk_grid(pin)
        out_grid = T._chunk_grid(pout)
        if pout.tiled:
            tw, th = pout.tile_width, pout.tile_height
            across = -(-pout.width // tw)
        else:
            tw, th = pout.width, (pout.rows_per_strip or pout.height)
            across = 1
        for pdf in batches:
            out = {k: [] for k in ("tgt", "y0", "x0", "h", "w", "block")}
            for r in pdf.itertuples(index=False):
                idx = int(r.image_id.rsplit(":", 1)[1])
                arr = codec.decode(r.bytes, r.w, r.h, r.fmt)
                r0, c0 = in_grid[idx][0], in_grid[idx][1]
                h, w = arr.shape[1], arr.shape[2]
                ty0, ty1 = r0 // th, (r0 + h - 1) // th
                tx0, tx1 = c0 // tw, (c0 + w - 1) // tw
                for ty in range(ty0, ty1 + 1):
                    for tx in range(tx0, tx1 + 1):
                        tgt = ty * across + tx
                        gr0, gc0 = out_grid[tgt][0], out_grid[tgt][1]
                        # overlap of [r0, r0+h) x [c0, c0+w) with target
                        a = max(r0, gr0)
                        b = min(r0 + h, gr0 + out_grid[tgt][3])
                        c = max(c0, gc0)
                        d = min(c0 + w, gc0 + out_grid[tgt][2])
                        if a >= b or c >= d:
                            continue
                        sub = np.ascontiguousarray(
                            arr[:, a - r0 : b - r0, c - c0 : d - c0]
                        )
                        out["tgt"].append(tgt)
                        out["y0"].append(a - gr0)
                        out["x0"].append(c - gc0)
                        out["h"].append(b - a)
                        out["w"].append(d - c)
                        out["block"].append(sub.tobytes())
                yield pd.DataFrame(out)
                out = {k: [] for k in ("tgt", "y0", "x0", "h", "w", "block")}

    pieces = df.mapInPandas(
        split_rows, schema="tgt int, y0 int, x0 int, h int, w int, block binary"
    )

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pout, _ = _profile_from_json(out_prof_json)
        out_grid = T._chunk_grid(pout)
        tgt = int(key[0])
        _r0, _c0, vw, vh, sw, sh = out_grid[tgt]
        dt = pout.np_dtype
        tile = np.zeros((pout.count, vh, vw), dtype=dt)
        for r in pdf.itertuples(index=False):
            blk = np.frombuffer(r.block, dtype=dt).reshape(pout.count, r.h, r.w)
            tile[:, r.y0 : r.y0 + r.h, r.x0 : r.x0 + r.w] = blk
        pairs = _planar_payloads(tile, pout, sw, sh, tgt, len(out_grid))
        return pd.DataFrame(
            {"index": [i for i, _ in pairs],
             "payload": [pl for _, pl in pairs]}
        )

    return pieces.groupBy("tgt").applyInPandas(
        assemble, schema="index int, payload binary"
    )


def export_tiff(
    spark: SparkSession,
    table_path: str,
    tif_path: str,
    creation_options: dict[str, str] | None = None,
) -> None:
    """Image table (+ manifest) → single GeoTIFF.

    Chunk compression runs on executors; the driver streams opaque
    payloads into the container (peak driver hold: one Spark partition of
    compressed chunks — bounded by ``toLocalIterator``'s partition-at-a-
    time fetch, NOT the raster size). Creation options (``--co
    compress=deflate``, ``blockxsize``, ``bigtiff=yes`` …) override the
    preserved profile, the reference's GDAL-option contract
    (tests/test_cli.py:121-169); a changed chunk grid triggers the
    distributed re-grid path.
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
        bigtiff=prof.bigtiff,
        jpeg_quality=prof.jpeg_quality,
        planar=prof.planar,  # interleave preserved; --co interleave=… overrides
        geo=prof.geo,
    )
    if creation_options:
        out_prof = T.apply_creation_options(out_prof, creation_options)
    in_prof = T.TiffProfile(**{**out_prof.__dict__, "tiled": prof.tiled,
                               "tile_width": prof.tile_width,
                               "tile_height": prof.tile_height,
                               "rows_per_strip": prof.rows_per_strip})
    same_grid = (
        out_prof.tiled, out_prof.tile_width, out_prof.tile_height,
        out_prof.rows_per_strip,
    ) == (prof.tiled, prof.tile_width, prof.tile_height, prof.rows_per_strip)
    out_json = _profile_to_json(out_prof, n_chunks, tif_path)
    if same_grid:
        enc = _encode_same_grid(df, out_json)
    else:
        in_json = _profile_to_json(in_prof, n_chunks, tif_path)
        enc = _encode_regrid(df, in_json, out_json)

    writer = T.TiffChunkWriter(tif_path, out_prof)
    if same_grid and writer.n_chunks != n_chunks * writer.n_planes:
        raise ValueError(
            f"manifest expects {n_chunks} spatial chunks x {writer.n_planes} "
            f"plane(s), grid has {writer.n_chunks}"
        )
    for row in enc.toLocalIterator():
        writer.add(row["index"], bytes(row["payload"]))
    writer.close()  # raises listing any missing chunk


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
