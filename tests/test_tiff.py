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


def test_jpeg_is_failfast_seam():
    arr, prof = T.read_tiff(f"{REF}/rgb8.tif")
    with pytest.raises(NotImplementedError, match="jpeg"):
        T.apply_creation_options(prof, {"compress": "jpeg"})


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
    """Reference test_creation_opts (with deflate standing in for the
    stubbed jpeg codec): --co compress=X demonstrably lands in the file."""
    tbl = str(tmp_path / "tbl")
    TB.ingest_tiff(spark, f"{REF}/rgb8.tif", tbl)
    out = str(tmp_path / "defl.tif")
    TB.export_tiff(spark, tbl, out, creation_options={"compress": "deflate"})
    arr0, _ = T.read_tiff(f"{REF}/rgb8.tif")
    arr1, prof1 = T.read_tiff(out)
    assert prof1.compression == T.COMPRESSION_DEFLATE
    assert np.array_equal(arr0, arr1)
    with pytest.raises(NotImplementedError, match="jpeg"):
        TB.export_tiff(spark, tbl, str(tmp_path / "j.tif"),
                       creation_options={"compress": "jpeg"})


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
