"""Y4M codec + registry-decoder tests (round-4 verdict item 4: one real
video container path for sample_frames, with the fail-fast seam retained
for absent codecs)."""

from __future__ import annotations

import numpy as np
import pytest

from rio_color_spark.operators import media
from rio_color_spark.sources import y4m


def _manual_y4m(w, h, chroma, planes_per_frame):
    head = f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 C{chroma}\n".encode()
    out = bytearray(head)
    for planes in planes_per_frame:
        out += b"FRAME\n"
        for p in planes:
            out += p.astype(np.uint8).tobytes()
    return bytes(out)


def test_c444_decode_matches_bt601_twin():
    rng = np.random.default_rng(1)
    h, w, f = 6, 5, 3
    ys = rng.integers(16, 236, (f, h, w))
    us = rng.integers(16, 241, (f, h, w))
    vs = rng.integers(16, 241, (f, h, w))
    buf = _manual_y4m(w, h, "444", [(ys[i], us[i], vs[i]) for i in range(f)])
    clip = y4m.decode(buf)
    assert clip.shape == (f, 3, h, w) and clip.dtype == np.uint8
    expect = y4m._yuv_to_rgb(ys, us, vs)
    assert np.array_equal(clip, expect)


def test_c420_upsample_layout():
    """half-res chroma planes replicate 2x2 under nearest upsampling."""
    h = w = 4
    yp = np.full((h, w), 128)
    up = np.array([[100, 200], [50, 150]])
    vp = np.array([[90, 60], [30, 220]])
    buf = _manual_y4m(w, h, "420jpeg", [(yp, up, vp)])
    clip = y4m.decode(buf)
    up_full = up[np.arange(h) // 2][:, np.arange(w) // 2]
    vp_full = vp[np.arange(h) // 2][:, np.arange(w) // 2]
    expect = y4m._yuv_to_rgb(yp[None], up_full[None], vp_full[None])
    assert np.array_equal(clip, expect)


def test_mono_and_default_chroma():
    h = w = 2
    yp = np.array([[16, 100], [180, 235]])
    clip = y4m.decode(_manual_y4m(w, h, "mono", [(yp,)]))
    # mono: u=v=128 -> grayscale rgb
    assert (clip[0, 0] == clip[0, 1]).all() and (clip[0, 1] == clip[0, 2]).all()
    # no C tag -> spec default 420jpeg: frame size w*h*1.5
    head = f"YUV4MPEG2 W{w} H{h} F25:1\n".encode()
    buf = head + b"FRAME\n" + bytes(w * h) + bytes((w // 2) * (h // 2) * 2)
    assert y4m.decode(buf).shape == (1, 3, h, w)


def test_error_contracts():
    with pytest.raises(ValueError, match="not a YUV4MPEG2"):
        y4m.decode(b"RIFFxxxx")
    with pytest.raises(NotImplementedError, match="chroma"):
        y4m.decode(b"YUV4MPEG2 W2 H2 C422\nFRAME\n" + bytes(8))
    with pytest.raises(ValueError, match="truncated"):
        y4m.decode(b"YUV4MPEG2 W4 H4 C444\nFRAME\n" + bytes(10))
    with pytest.raises(ValueError, match="no frames"):
        y4m.decode(b"YUV4MPEG2 W4 H4 C444\n")
    with pytest.raises(ValueError, match="FRAME"):
        y4m.decode(b"YUV4MPEG2 W2 H2 C444\nBOGUS\n" + bytes(12))


def test_encode_decode_c444_roundtrip_within_rounding():
    """RGB->YUV->RGB loses at most 2/255 per channel to BT.601 rounding;
    the y4m CONTAINER itself is lossless (YUV planes round-trip exactly,
    pinned by test_c444_decode_matches_bt601_twin)."""
    rng = np.random.default_rng(2)
    clip = rng.integers(0, 256, (4, 3, 8, 6), dtype=np.uint8)
    back = y4m.decode(y4m.encode(clip, chroma="444"))
    assert back.shape == clip.shape
    assert np.abs(back.astype(int) - clip.astype(int)).max() <= 2


def test_sample_frames_y4m(spark):
    """The registry path: y4m clips decode on executors and sample
    frames 0, k, 2k, ... as npy8 stills."""
    rng = np.random.default_rng(3)
    rows = []
    shapes = {}
    for n, n_frames in ((0, 5), (1, 1), (2, 8)):
        clip = rng.integers(0, 256, (n_frames, 3, 6, 4), dtype=np.uint8)
        buf = y4m.encode(clip, chroma="444")
        rows.append((f"vid{n}", buf, 4, 6, "y4m"))
        shapes[f"vid{n}"] = n_frames
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = media.sample_frames(df, every_k=2).collect()
    got = {}
    for r in out:
        got.setdefault(r["image_id"], []).append(r)
    assert {k: len(v) for k, v in got.items()} == {
        "vid0": 3, "vid1": 1, "vid2": 4
    }
    for vid, frames in got.items():
        decoded = y4m.decode(dict(rows_map := {r[0]: r[1] for r in rows})[vid])
        for r in frames:
            assert r["fmt"] == "npy8" and r["w"] == 4 and r["h"] == 6
            assert r["frame"] % 2 == 0
            assert bytes(r["bytes"]) == decoded[r["frame"]].tobytes()


def test_video_seam_still_failfast(spark):
    """mp4/webm/mkv stay behind NotImplementedError until a decoder is
    registered; registering one flips the format to a working path."""
    df = spark.createDataFrame(
        [("x", bytes(12), 2, 2, "mp4")],
        "image_id string, bytes binary, w int, h int, fmt string",
    )
    with pytest.raises(Exception, match="NotImplementedError|decoder library"):
        media.sample_frames(df).collect()
