"""PNG codec (sources/png.py) + codec-format plumbing through the batch
operators. PNG/JPEG payload columns are REAL formats now — the engine's
analogue of the reference reading any GDAL-supported raster
(/root/reference/rio_color/scripts/cli.py:81 via rasterio); the codec
table in sources/codec.py is the pluggable seam."""

import struct
import zlib

import numpy as np
import pytest

from rio_color_spark.sources import codec
from rio_color_spark.sources import png as P


def _rng():
    return np.random.default_rng(7)


@pytest.mark.parametrize(
    "nch,dt",
    [(1, "u1"), (2, "u1"), (3, "u1"), (4, "u1"), (1, "u2"), (3, "u2"), (4, "u2")],
)
def test_roundtrip_all_color_types(nch, dt):
    arr = _rng().integers(0, np.iinfo(dt).max + 1, size=(nch, 37, 53)).astype(dt)
    back = P.decode_png(P.encode_png(arr))
    assert back.dtype == arr.dtype and back.shape == arr.shape
    assert np.array_equal(arr, back)


def _chunk(t, p):
    return struct.pack(">I", len(p)) + t + p + struct.pack(
        ">I", zlib.crc32(t + p) & 0xFFFFFFFF
    )


def _hand_png(ihdr_fields, chunks, scanlines):
    ihdr = struct.pack(">IIBBBBB", *ihdr_fields)
    body = b"".join(_chunk(t, p) for t, p in chunks)
    return (
        P._SIG
        + _chunk(b"IHDR", ihdr)
        + body
        + _chunk(b"IDAT", zlib.compress(scanlines))
        + _chunk(b"IEND", b"")
    )


def test_decode_all_five_filters():
    """Hand-filter rows 0..4 with filter types 0..4 (our encoder only
    emits Up, so the Sub/Average/Paeth decode paths need a foreign file)."""
    rng = _rng()
    h, w, nch = 15, 11, 3
    arr = rng.integers(0, 256, size=(h, w, nch)).astype(np.uint8)
    stride = w * nch
    lines = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        raw = arr[y].reshape(-1).astype(np.int64)
        f = y % 5
        if f == 0:
            filt = raw
        elif f == 1:
            filt = raw.copy()
            filt[nch:] = (raw[nch:] - raw[:-nch]) % 256
        elif f == 2:
            filt = (raw - prev) % 256
        elif f == 3:
            filt = np.empty(stride, dtype=np.int64)
            left = np.zeros(nch, dtype=np.int64)
            for x in range(0, stride, nch):
                pred = (left + prev[x : x + nch]) >> 1
                filt[x : x + nch] = (raw[x : x + nch] - pred) % 256
                left = raw[x : x + nch]
        else:
            filt = np.empty(stride, dtype=np.int64)
            left = np.zeros(nch, dtype=np.int64)
            ul = np.zeros(nch, dtype=np.int64)
            for x in range(0, stride, nch):
                b = prev[x : x + nch]
                p = left + b - ul
                pa, pb, pc = np.abs(p - left), np.abs(p - b), np.abs(p - ul)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, b, ul)
                )
                filt[x : x + nch] = (raw[x : x + nch] - pred) % 256
                left = raw[x : x + nch]
                ul = b
        lines.append(bytes([f]) + filt.astype(np.uint8).tobytes())
        prev = raw
    data = _hand_png((w, h, 8, 2, 0, 0, 0), [], b"".join(lines))
    assert np.array_equal(P.decode_png(data), arr.transpose(2, 0, 1))


def test_palette_and_trns():
    rng = _rng()
    pal = rng.integers(0, 256, size=(5, 3)).astype(np.uint8)
    idx = rng.integers(0, 5, size=(9, 13)).astype(np.uint8)
    lines = b"".join(bytes([0]) + idx[y].tobytes() for y in range(9))
    data = _hand_png((13, 9, 8, 3, 0, 0, 0), [(b"PLTE", pal.tobytes())], lines)
    assert np.array_equal(P.decode_png(data), pal[idx].transpose(2, 0, 1))
    # tRNS promotes to RGBA; entries past the tRNS length default opaque
    data2 = _hand_png(
        (13, 9, 8, 3, 0, 0, 0),
        [(b"PLTE", pal.tobytes()), (b"tRNS", bytes([10, 20, 30]))],
        lines,
    )
    back = P.decode_png(data2)
    assert back.shape == (4, 9, 13)
    assert np.array_equal(
        back[3], np.array([10, 20, 30, 255, 255], dtype=np.uint8)[idx]
    )


def test_fail_fast_seams():
    with pytest.raises(NotImplementedError, match="Adam7"):
        P.decode_png(_hand_png((4, 4, 8, 2, 0, 0, 1), [], b"\x00" * 52))
    with pytest.raises(ValueError, match="signature"):
        P.decode_png(b"not a png at all")
    with pytest.raises(ValueError, match="filter type"):
        P.decode_png(_hand_png((2, 1, 8, 0, 0, 0, 0), [], b"\x09\x00\x00"))


# -- codec registry plumbing --------------------------------------------------


def test_codec_formats_roundtrip():
    rng = _rng()
    for fmt in ("png", "pnga", "png16"):
        info = codec.format_info(fmt)
        assert info.lossless and info.codec == "png"
        arr = rng.integers(
            0, np.iinfo(info.dtype).max + 1, size=(info.bands, 21, 17)
        ).astype(info.dtype)
        buf = codec.encode(arr, fmt)
        assert np.array_equal(codec.decode(buf, 17, 21, fmt), arr)
        stacked = codec.stack_decode([buf, buf], 21, 17, fmt)
        assert stacked.shape == (2, info.bands, 21, 17)
        assert np.array_equal(stacked[1], arr)


def test_codec_jpeg_lossy_contract():
    g = np.linspace(0, 255, 64 * 64).reshape(64, 64).astype(np.uint8)
    arr = np.stack([g, g.T, 255 - g])
    buf = codec.encode(arr, "jpeg")
    back = codec.decode(buf, 64, 64, "jpeg")
    assert back.shape == arr.shape and back.dtype == np.uint8
    assert np.abs(back.astype(int) - arr.astype(int)).mean() < 2.0
    assert not codec.format_info("jpeg").lossless


def test_decode_validates_metadata_shape():
    arr = np.zeros((3, 8, 8), dtype=np.uint8)
    buf = codec.encode(arr, "png")
    with pytest.raises(ValueError, match="metadata"):
        codec.decode(buf, 9, 8, "png")  # wrong w


def test_webp_still_fails_fast():
    with pytest.raises(NotImplementedError, match="webp"):
        codec.format_info("webp")


# -- Spark operators over codec-format payload columns ------------------------


def _png_table(spark, n=8):
    rng = _rng()
    rows = []
    for i in range(n):
        fmt = "png" if i % 2 == 0 else "pnga"
        info = codec.format_info(fmt)
        arr = rng.integers(0, 256, size=(info.bands, 24, 20)).astype(np.uint8)
        rows.append(
            (f"img:{i:03d}", codec.encode(arr, fmt), 20, 24, fmt, arr)
        )
    df = spark.createDataFrame(
        [(r[0], bytearray(r[1]), r[2], r[3], r[4]) for r in rows],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    return df, {r[0]: (r[4], r[5]) for r in rows}


def test_band_stats_over_png_rows(spark):
    from rio_color_spark.operators.media import with_band_stats

    df, truth = _png_table(spark)
    got = {
        (r["image_id"], r["band"]): r["mean"]
        for r in with_band_stats(df).collect()
    }
    for iid, (fmt, arr) in truth.items():
        for b in range(arr.shape[0]):
            expect = arr[b].astype(np.float64).mean() / 255.0
            assert got[(iid, b)] == pytest.approx(expect, abs=1e-12)


def test_resize_preserves_png_fmt(spark):
    from rio_color_spark.operators.media import resize_images

    df, truth = _png_table(spark)
    out = {r["image_id"]: r for r in resize_images(df, 10, 12).collect()}
    for iid, (fmt, arr) in truth.items():
        r = out[iid]
        assert r["fmt"] == fmt  # lossless codec fmt re-encodes in-kind
        back = codec.decode(r["bytes"], 10, 12, fmt)
        ri = np.minimum(((np.arange(12) + 0.5) * 24 / 12).astype(int), 23)
        ci = np.minimum(((np.arange(10) + 0.5) * 20 / 10).astype(int), 19)
        assert np.array_equal(back, arr[:, ri[:, None], ci[None, :]])


def test_resize_jpeg_reemits_raw(spark):
    from rio_color_spark.operators.media import resize_images

    g = np.linspace(0, 255, 32 * 32).reshape(32, 32).astype(np.uint8)
    arr = np.stack([g, g.T, 255 - g])
    df = spark.createDataFrame(
        [("j:0", bytearray(codec.encode(arr, "jpeg")), 32, 32, "jpeg")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    r = resize_images(df, 16, 16).collect()[0]
    assert r["fmt"] == "npy8"  # no second DCT generation
    assert codec.decode(r["bytes"], 16, 16, "npy8").shape == (3, 16, 16)


def test_transcode_roundtrip_and_passthrough(spark):
    from rio_color_spark.operators.media import transcode_images

    df, truth = _png_table(spark)
    # png/pnga → raw twins; raw rows (none here) would pass through
    out = transcode_images(df, {"png": "npy8", "pnga": "npy8a"})
    rows = {r["image_id"]: r for r in out.collect()}
    for iid, (fmt, arr) in truth.items():
        r = rows[iid]
        assert r["fmt"] == {"png": "npy8", "pnga": "npy8a"}[fmt]
        assert np.array_equal(codec.decode(r["bytes"], 20, 24, r["fmt"]), arr)
    # and back: raw → png re-encodes losslessly; unmapped fmt untouched
    back = transcode_images(out, {"npy8": "png"})
    for r in back.collect():
        fmt0, arr = truth[r["image_id"]]
        if fmt0 == "png":
            assert r["fmt"] == "png"
            assert np.array_equal(codec.decode(r["bytes"], 20, 24, "png"), arr)
        else:
            assert r["fmt"] == "npy8a"  # pass-through kept original bytes

    with pytest.raises(ValueError, match="incompatible"):
        transcode_images(df, {"png": "npy8a"})  # 3 bands → 4 bands


def test_color_correct_over_png_rows(spark):
    """The flagship pixel-math operator consumes png payloads directly;
    output normalizes to the raw lossless twin via fmt_for_dtype."""
    from rio_color_spark.functions.utils import scale_dtype, to_math_type
    from rio_color_spark.operators.color import color_correct
    from rio_color_spark.plans.dsl import compile_chain

    df, truth = _png_table(spark)
    out = {
        r["image_id"]: r
        for r in color_correct(df, "gamma rgb 1.4 sigmoidal rgb 3 0.5").collect()
    }
    fused = compile_chain("gamma rgb 1.4 sigmoidal rgb 3 0.5")
    for iid, (fmt, arr) in truth.items():
        r = out[iid]
        info = codec.format_info(fmt)
        assert r["fmt"] == codec.fmt_for_dtype(info.dtype, info.bands)
        got = codec.decode(r["bytes"], r["w"], r["h"], r["fmt"])
        expect = scale_dtype(fused(to_math_type(arr.copy())), np.uint8)
        assert np.array_equal(got, expect)
