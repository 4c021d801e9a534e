"""GeoTIFF bridge tests — the engine's twin of the reference CLI contract
(reference tests/test_cli.py:40-74 j1==j2 equality, :121-169 creation
options, :171-197 RGBA alpha passthrough, :199-219 colorinterp
preservation), plus the built-in codec's own invariants.

The reference rasters (tests/rgb8.tif etc., written by libtiff via GDAL)
double as the external validation of the LZW codec: decoding tiles some
OTHER encoder produced pins the early-change timing against the spec's
canonical implementation, not just against our own encoder.
"""

from __future__ import annotations

import os
import subprocess
import sys

import numpy as np
import pytest

from rio_color_spark.functions.utils import scale_dtype, to_math_type
from rio_color_spark.plans.dsl import compile_chain
from rio_color_spark.sources import codec
from rio_color_spark.sources import tiff as T
from rio_color_spark.sources import tiff_bridge as TB

REF = "/root/reference/tests"
RASTERS = ["rgb8.tif", "rgb16.tif", "rgba8.tif"]
OPS = "gamma b 1.85 gamma r,g 1.95 sigmoidal rgb 35 0.13 saturation 1.15"


# -- codec layer -------------------------------------------------------------


def test_lzw_roundtrip_fuzz():
    rng = np.random.default_rng(7)
    for n in [0, 1, 2, 300, 511, 3072, 50000]:
        for data in (
            bytes(rng.integers(0, 4, n, dtype=np.uint8)),
            bytes(rng.integers(0, 256, n, dtype=np.uint8)),
            bytes(np.arange(n, dtype=np.uint8) % 7),
        ):
            assert T.lzw_decode(T.lzw_encode(data)) == data


def test_lzw_final_code_on_width_boundary():
    """Regression: when the FINAL flushed run code lands exactly on an
    early-change boundary, the decoder widens before reading EOI — the
    encoder must widen too or EOI is written one bit narrow (found via a
    planar rgb8 band tile; libtiff's LZWPostEncode has the same
    free_ent++ for this). Sweep lengths around the 9→10 bit boundary
    (incompressible input ≈ one table entry per byte ⇒ boundary near
    254 bytes) and around 10→11."""
    for seed in range(4):
        rng = np.random.default_rng(seed)
        for n in list(range(240, 280)) + list(range(740, 790, 7)):
            data = bytes(rng.integers(0, 256, n, dtype=np.uint8))
            assert T.lzw_decode(T.lzw_encode(data)) == data, (seed, n)


def test_lzw_matches_libtiff_ratio():
    """Our encoder's output size for the reference raster is within 1% of
    libtiff's — evidence the early-change timing matches (a mistimed
    encoder still round-trips itself but diverges in code widths)."""
    for name in RASTERS:
        arr, prof = T.read_tiff(f"{REF}/{name}")
        tmp = f"/tmp/_lzwsz_{name}"
        T.write_tiff(tmp, arr.copy(), prof)
        ours, theirs = os.path.getsize(tmp), os.path.getsize(f"{REF}/{name}")
        assert abs(ours - theirs) / theirs < 0.01, (name, ours, theirs)
        os.unlink(tmp)


@pytest.mark.parametrize("name", RASTERS)
def test_read_write_roundtrip(name, tmp_path):
    arr, prof = T.read_tiff(f"{REF}/{name}")
    assert arr.shape == ((4, 500, 438) if name == "rgba8" + ".tif" else (3, 500, 438))
    out = str(tmp_path / name)
    T.write_tiff(out, arr.copy(), prof)
    arr2, prof2 = T.read_tiff(out)
    assert np.array_equal(arr, arr2)
    assert prof2.geo == prof.geo  # byte-exact GeoTIFF/GDAL tag payloads
    assert prof2.colorinterp() == prof.colorinterp()


def test_predictor2_and_deflate_roundtrip(tmp_path):
    arr, prof = T.read_tiff(f"{REF}/rgb16.tif")
    for co in ({"compress": "deflate"}, {"compress": "lzw", "predictor": "2"},
               {"compress": "none"}):
        p = T.apply_creation_options(prof, co)
        out = str(tmp_path / "x.tif")
        T.write_tiff(out, arr.copy(), p)
        arr2, prof2 = T.read_tiff(out)
        assert np.array_equal(arr, arr2), co
        assert prof2.compression == p.compression


def test_stripped_layout_roundtrip(tmp_path):
    """Stripped (non-tiled) containers: the other classic layout."""
    rng = np.random.default_rng(3)
    arr = rng.integers(0, 256, (3, 45, 38), dtype=np.uint8)
    prof = T.TiffProfile(
        width=38, height=45, count=3, dtype="uint8",
        compression=T.COMPRESSION_LZW, tiled=False, rows_per_strip=16,
    )
    out = str(tmp_path / "strips.tif")
    T.write_tiff(out, arr, prof)
    arr2, prof2 = T.read_tiff(out)
    assert np.array_equal(arr, arr2)
    assert not prof2.tiled and prof2.rows_per_strip == 16


def test_jpeg_in_tiff_roundtrip_psnr40(tmp_path):
    """Reference tests/test_cli.py:121-169 asserts compress=jpeg lands in
    the container; the engine's lossy gate is PSNR>=40dB on decoded
    pixels (BASELINE north rule)."""
    from rio_color_spark.sources.jpeg import psnr

    arr, prof = T.read_tiff(f"{REF}/rgb8.tif")
    p = T.apply_creation_options(prof, {"compress": "jpeg"})
    assert p.compression == T.COMPRESSION_JPEG
    out = str(tmp_path / "j.tif")
    T.write_tiff(out, arr.copy(), p)
    arr2, prof2 = T.read_tiff(out)
    assert prof2.compression == T.COMPRESSION_JPEG
    assert arr2.shape == arr.shape and arr2.dtype == arr.dtype
    assert psnr(arr, arr2) >= 40.0
    assert prof2.geo.keys() >= {k for k in prof.geo if k != T.TAG_JPEG_TABLES}


def test_jpeg_rejected_for_uint16(tmp_path):
    arr, prof = T.read_tiff(f"{REF}/rgb16.tif")
    p = T.apply_creation_options(prof, {"compress": "jpeg"})
    with pytest.raises(NotImplementedError, match="8-bit"):
        T.write_tiff(str(tmp_path / "j16.tif"), arr.copy(), p)


def test_bigtiff_roundtrip(tmp_path):
    """Version-43 container (64-bit offsets): round-trips and is detected
    on read; classic write refuses once offsets would overflow 4 GiB."""
    arr, prof = T.read_tiff(f"{REF}/rgb8.tif")
    p = T.apply_creation_options(prof, {"bigtiff": "yes"})
    out = str(tmp_path / "big.tif")
    T.write_tiff(out, arr.copy(), p)
    with open(out, "rb") as f:
        assert f.read(4) == b"II+\0"  # magic 43
    arr2, prof2 = T.read_tiff(out)
    assert prof2.bigtiff
    assert np.array_equal(arr, arr2)
    assert prof2.geo == prof.geo


def test_structure_read_beyond_header_window(tmp_path):
    """The writer places the IFD at the file TAIL (streaming assembly);
    a 64-byte prefetch forces every structure read through the range
    fetch — the old fixed-window parse either failed or silently
    truncated tag payloads here."""
    arr, prof = T.read_tiff(f"{REF}/rgb8.tif")
    out = str(tmp_path / "tail.tif")
    T.write_tiff(out, arr.copy(), prof)
    with open(out, "rb") as f:
        prefix = f.read(64)
        prof2, chunks = T.read_ifd_fetch(T.file_fetch(f, prefix))
    assert prof2.geo == prof.geo  # byte-exact payloads despite tiny window
    assert len(chunks) == 224
    # and the in-memory parser now fails LOUDLY on a truncated buffer
    with open(out, "rb") as f:
        head = f.read(4096)
    with pytest.raises(ValueError, match="beyond"):
        T.read_ifd(head)


def test_planar_roundtrip_tiled_and_stripped(tmp_path):
    """PlanarConfiguration=2 (band-separate — GDAL INTERLEAVE=BAND):
    write/read round-trips for both layouts, and reading a planar file
    yields the IDENTICAL array as the chunky twin."""
    arr, prof = T.read_tiff(f"{REF}/rgb8.tif")
    # tiled planar
    p = T.apply_creation_options(prof, {"interleave": "band"})
    assert p.planar == 2
    out = str(tmp_path / "planar_tiled.tif")
    T.write_tiff(out, arr.copy(), p)
    arr2, prof2 = T.read_tiff(out)
    assert prof2.planar == 2
    assert np.array_equal(arr, arr2)
    assert prof2.geo == prof.geo
    # stripped planar with predictor
    p2 = T.apply_creation_options(
        p, {"tiled": "no", "compress": "deflate", "predictor": "2"}
    )
    p2.rows_per_strip = 64
    out2 = str(tmp_path / "planar_strips.tif")
    T.write_tiff(out2, arr.copy(), p2)
    arr3, prof3 = T.read_tiff(out2)
    assert prof3.planar == 2
    assert np.array_equal(arr, arr3)
    # jpeg + planar: each band-separate chunk is a standalone grayscale
    # JPEG stream (libtiff's SEPARATE+JPEG shape); lossy, so PSNR-pinned.
    # No JFIF color transform per-plane, so it need not match chunky-JPEG
    # bytes — only the decoded raster quality.
    from rio_color_spark.sources.jpeg import psnr

    pj = T.apply_creation_options(p, {"compress": "jpeg"})
    assert pj.planar == 2
    outj = str(tmp_path / "planar_jpeg.tif")
    T.write_tiff(outj, arr.copy(), pj)
    arrj, profj = T.read_tiff(outj)
    assert profj.planar == 2
    assert profj.compression == T.COMPRESSION_JPEG
    assert arrj.shape == arr.shape
    assert psnr(arr, arrj) >= 40.0


# -- Spark bridge ------------------------------------------------------------


def test_ingest_export_identity(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    TB.ingest_tiff(spark, f"{REF}/rgb8.tif", tbl)
    df = spark.read.parquet(tbl)
    assert df.count() == 224  # 14 x 16 tile grid of 438x500 at 32x32
    assert set(df.columns) == {"image_id", "bytes", "w", "h", "fmt", "caption", "phash"}
    out = str(tmp_path / "identity.tif")
    TB.export_tiff(spark, tbl, out)
    a0, p0 = T.read_tiff(f"{REF}/rgb8.tif")
    a1, p1 = T.read_tiff(out)
    assert np.array_equal(a0, a1)
    assert p1.geo == p0.geo


def test_planar_ingest_export_preserves_interleave(spark, tmp_path):
    """A band-separate source ingests to the SAME full-band image table
    (each row stacks its per-plane byte ranges on the executor — no extra
    shuffle) and re-exports as planar; --co interleave=pixel converts."""
    arr, prof = T.read_tiff(f"{REF}/rgb8.tif")
    src = str(tmp_path / "planar_src.tif")
    T.write_tiff(src, arr.copy(), T.apply_creation_options(prof, {"interleave": "band"}))
    tbl = str(tmp_path / "tbl")
    TB.ingest_tiff(spark, src, tbl)
    df = spark.read.parquet(tbl)
    assert df.count() == 224  # spatial chunks, not 3x planes
    # decoded pixel content matches the chunky reference ingest exactly
    row = df.filter("image_id = 'planar_src:000000'").collect()[0]
    blk = codec.decode(row["bytes"], row["w"], row["h"], row["fmt"])
    assert np.array_equal(blk, arr[:, :32, :32])
    # planar round-trip through the distributed export
    out = str(tmp_path / "back.tif")
    TB.export_tiff(spark, tbl, out)
    a1, p1 = T.read_tiff(out)
    assert p1.planar == 2 and np.array_equal(a1, arr)
    # interleave conversion on export
    out2 = str(tmp_path / "chunky.tif")
    TB.export_tiff(spark, tbl, out2, creation_options={"interleave": "pixel"})
    a2, p2 = T.read_tiff(out2)
    assert p2.planar == 1 and np.array_equal(a2, arr)


def test_color_correct_tiff_matches_library_chain(spark, tmp_path):
    """Tiled distributed execution == whole-array chain: every DSL op is
    pointwise, so the 32x32 tile grid cannot change a pixel (the same
    property the reference relies on for riomucho windows)."""
    out = str(tmp_path / "colored.tif")
    TB.color_correct_tiff(spark, f"{REF}/rgb8.tif", out, OPS, out_dtype="uint8")
    a0, p0 = T.read_tiff(f"{REF}/rgb8.tif")
    a2, p2 = T.read_tiff(out)
    expected = scale_dtype(compile_chain(OPS)(to_math_type(a0)), np.uint8)
    assert np.array_equal(a2, expected)
    assert p2.geo == p0.geo and p2.colorinterp() == p0.colorinterp()


def test_rgba_alpha_passthrough(spark, tmp_path):
    """Reference test_color_cli_rgba: band 4 is unaltered."""
    out = str(tmp_path / "rgba_out.tif")
    TB.color_correct_tiff(spark, f"{REF}/rgba8.tif", out, OPS, out_dtype="uint8")
    a0, _ = T.read_tiff(f"{REF}/rgba8.tif")
    a1, p1 = T.read_tiff(out)
    assert p1.count == 4
    assert np.array_equal(a0[3], a1[3])
    assert p1.colorinterp() == ("red", "green", "blue", "alpha")


def test_uint16_colorinterp_preserved(spark, tmp_path):
    """Reference test_color_cli_16bit_photointerp."""
    out = str(tmp_path / "c16.tif")
    TB.color_correct_tiff(
        spark, f"{REF}/rgb16.tif", out, "gamma b 1.85 gamma r,g 1.95",
        out_dtype="uint16",
    )
    _, p0 = T.read_tiff(f"{REF}/rgb16.tif")
    a1, p1 = T.read_tiff(out)
    assert a1.dtype == np.uint16
    assert p1.colorinterp() == p0.colorinterp()


def test_creation_options_change_container(spark, tmp_path):
    """Reference test_creation_opts: --co compress=X demonstrably lands
    in the file — including the reference's literal compress=jpeg
    contract (tests/test_cli.py:128,137,146,169) at PSNR>=40dB."""
    from rio_color_spark.sources.jpeg import psnr

    tbl = str(tmp_path / "tbl")
    TB.ingest_tiff(spark, f"{REF}/rgb8.tif", tbl)
    out = str(tmp_path / "defl.tif")
    TB.export_tiff(spark, tbl, out, creation_options={"compress": "deflate"})
    arr0, _ = T.read_tiff(f"{REF}/rgb8.tif")
    arr1, prof1 = T.read_tiff(out)
    assert prof1.compression == T.COMPRESSION_DEFLATE
    assert np.array_equal(arr0, arr1)
    outj = str(tmp_path / "j.tif")
    TB.export_tiff(spark, tbl, outj, creation_options={"compress": "jpeg"})
    arrj, profj = T.read_tiff(outj)
    assert profj.compression == T.COMPRESSION_JPEG
    assert psnr(arr0, arrj) >= 40.0


def test_export_retiling_regrids_distributed(spark, tmp_path):
    """--co blockxsize/blockysize with a CHANGED grid: pixel blocks are
    re-gridded on executors (mirrors GDAL's arbitrary block-size
    rewrite); the decoded full-raster array is bit-identical."""
    tbl = str(tmp_path / "tbl")
    TB.ingest_tiff(spark, f"{REF}/rgb8.tif", tbl)
    arr0, prof0 = T.read_tiff(f"{REF}/rgb8.tif")
    # 32x32 -> 64x96 tiles
    out = str(tmp_path / "retiled.tif")
    TB.export_tiff(spark, tbl, out,
                   creation_options={"blockxsize": "64", "blockysize": "96"})
    arr1, prof1 = T.read_tiff(out)
    assert (prof1.tile_width, prof1.tile_height) == (64, 96)
    assert np.array_equal(arr0, arr1)
    assert prof1.geo == prof0.geo
    # tiled -> stripped is a grid change too
    outs = str(tmp_path / "stripped.tif")
    TB.export_tiff(spark, tbl, outs, creation_options={"tiled": "no"})
    arr2, prof2 = T.read_tiff(outs)
    assert not prof2.tiled
    assert np.array_equal(arr0, arr2)


def test_export_bigtiff_creation_option(spark, tmp_path):
    tbl = str(tmp_path / "tbl")
    TB.ingest_tiff(spark, f"{REF}/rgb8.tif", tbl)
    out = str(tmp_path / "big.tif")
    TB.export_tiff(spark, tbl, out, creation_options={"bigtiff": "yes"})
    with open(out, "rb") as f:
        assert f.read(4) == b"II+\0"
    arr0, _ = T.read_tiff(f"{REF}/rgb8.tif")
    arr1, _ = T.read_tiff(out)
    assert np.array_equal(arr0, arr1)
    # and the bigtiff container ingests back through the range-read path
    tbl2 = str(tmp_path / "tbl2")
    TB.ingest_tiff(spark, out, tbl2)
    assert spark.read.parquet(tbl2).count() == 224


def test_out_dtype_conversion_roundtrip(spark, tmp_path):
    """uint16 source -> uint8 output container (reference -d uint8 on a
    16-bit raster); the exported file's dtype follows the table payload."""
    out = str(tmp_path / "c8.tif")
    TB.color_correct_tiff(
        spark, f"{REF}/rgb16.tif", out, "gamma rgb 1.0", out_dtype="uint8"
    )
    a0, _ = T.read_tiff(f"{REF}/rgb16.tif")
    a1, _ = T.read_tiff(out)
    assert a1.dtype == np.uint8
    expected = scale_dtype(to_math_type(a0), np.uint8)
    assert np.array_equal(a1, expected)


# -- CLI surface -------------------------------------------------------------


def _cli(*argv: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "rio_color_spark.cli", *argv],
        capture_output=True, text=True, cwd="/root/repo", timeout=300,
    )


def test_cli_color_tif_j1_j2_equal(tmp_path):
    """Reference test_color_cli/test_atmos_cli: -j1 and -j2 outputs are
    pixel-identical (determinism across parallelism)."""
    o1, o2 = str(tmp_path / "j1.tif"), str(tmp_path / "j2.tif")
    r1 = _cli("color", "-d", "uint8", "-j", "1", f"{REF}/rgb8.tif", o1,
              "gamma 3 1.85", "gamma 1,2 1.95")
    assert r1.returncode == 0, r1.stderr[-2000:]
    r2 = _cli("color", "-d", "uint8", "-j", "2", f"{REF}/rgb8.tif", o2,
              "gamma 3 1.85", "gamma 1,2 1.95")
    assert r2.returncode == 0, r2.stderr[-2000:]
    a1, _ = T.read_tiff(o1)
    a2, _ = T.read_tiff(o2)
    assert np.array_equal(a1, a2)


def test_cli_ingest_export_subcommands(tmp_path):
    tbl = str(tmp_path / "tbl")
    out = str(tmp_path / "back.tif")
    r = _cli("ingest", "-j", "2", f"{REF}/rgb8.tif", tbl)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(tbl, TB.MANIFEST))
    r = _cli("export", "-j", "2", "--co", "compress=deflate", tbl, out)
    assert r.returncode == 0, r.stderr[-2000:]
    a0, _ = T.read_tiff(f"{REF}/rgb8.tif")
    a1, p1 = T.read_tiff(out)
    assert np.array_equal(a0, a1)
    assert p1.compression == T.COMPRESSION_DEFLATE


def test_cli_empty_ops_tif_exit2(tmp_path):
    """Reference test_color_empty_operations on the tif surface: usage
    error before anything is written."""
    out = str(tmp_path / "never.tif")
    r = _cli("color", f"{REF}/rgb8.tif", out, ", , ,")
    assert r.returncode == 2
    assert not os.path.exists(out)
