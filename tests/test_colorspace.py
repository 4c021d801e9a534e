"""Colorspace oracle + roundtrip tests, mirroring the reference's
tests/test_colorspace.py (layer 3 of SURVEY.md §5). The colormath oracle is
unavailable here; the pinned numeric vectors + roundtrip properties stand in
(FIXTURES.md §4)."""

import math
from itertools import product

import numpy as np
import pytest

from rio_color_spark.functions.colorspace import (
    ColorSpace as cs,
    convert,
    convert_arr,
    saturate_rgb,
)

# (rgb, expected lch) — hue in RADIANS (reference tests/test_colorspace.py:30-38)
VECTORS = (
    ((0, 0, 0), (0, 0, 0)),
    ((1.0, 0, 0), (53.2, 104.6, 0.7)),
    ((0.392156, 0.776470, 0.164705), (71.7, 83.5, 2.3)),
    ((0.0392, 0.1960, 0.3529), (20.3517, 27.8757, -1.4612)),
    ((0.0456, 0.1929, 0.3941), (20.8945, 34.9429, -1.3244)),
    ((1.0, 1.0, 1.0), (100, 0, 2.8)),
)


def _near(a, b, tol):
    if not hasattr(tol, "__iter__"):
        tol = [tol] * len(a)
    return all(abs(x - y) <= t for x, y, t in zip(a, b, tol))


def _make_array(x, y, z, dtype="float64"):
    return np.array([[[x]], [[y]], [[z]]]).astype(dtype)


@pytest.mark.parametrize("pair", VECTORS)
def test_rgb2lch(pair):
    rgb, lch = pair
    alch = convert(*rgb, src=cs.rgb, dst=cs.lch)
    assert alch[0] >= 0
    assert _near(alch, lch, (1.0, 1.0, 0.25))


@pytest.mark.parametrize("pair", VECTORS)
def test_roundtrip(pair):
    rgb, lch = pair
    argb = convert(*convert(*rgb, src=cs.rgb, dst=cs.lch), src=cs.lch, dst=cs.rgb)
    for v in argb:
        assert -0.0001 < v < 1.0001
    assert _near(argb, rgb, 0.1)


@pytest.mark.parametrize("pair", VECTORS)
def test_lch2rgb(pair):
    rgb, lch = pair
    assert _near(convert(*lch, src=cs.lch, dst=cs.rgb), rgb, (1.0, 1.0, 0.1))


@pytest.mark.parametrize("pair", VECTORS)
def test_arr_rgb(pair):
    rgb, lch = pair
    assert np.allclose(
        convert_arr(_make_array(*rgb), cs.rgb, cs.lch), _make_array(*lch), atol=0.2
    )


@pytest.mark.parametrize("pair", VECTORS)
def test_arr_lch(pair):
    rgb, lch = pair
    assert np.allclose(
        convert_arr(_make_array(*lch), cs.lch, cs.rgb), _make_array(*rgb), atol=0.2
    )


@pytest.mark.parametrize("pair", VECTORS)
def test_saturation_identity(pair):
    rgb = _make_array(*pair[0])
    assert np.allclose(saturate_rgb(rgb, 1.0), rgb, atol=0.2)


def test_saturation_bw():
    sat = saturate_rgb(_make_array(0.392156, 0.776470, 0.164705), 0.0)
    assert abs(sat[0, 0, 0] - sat[1, 0, 0]) < 0.1
    assert abs(sat[1, 0, 0] - sat[2, 0, 0]) < 0.1


def test_saturation_pinned_pairs():
    assert np.allclose(
        saturate_rgb(_make_array(0.392156, 0.776470, 0.164705), 1.1),
        _make_array(0.3425, 0.78372, 0.0),
        atol=0.2,
    )
    assert np.allclose(
        saturate_rgb(_make_array(0.0392, 0.1960, 0.3529), 1.25),
        _make_array(0.0456, 0.1929, 0.3941),
        atol=0.2,
    )


def test_bad_array_bands():
    bad = np.random.default_rng(0).random((2, 3, 3))
    with pytest.raises(ValueError, match="3 bands"):
        saturate_rgb(bad, 1.1)
    with pytest.raises(ValueError, match="3 bands"):
        convert_arr(bad, cs.rgb, cs.lch)


def test_bad_array_dims():
    bad = np.random.default_rng(0).random((3, 3))
    with pytest.raises(ValueError, match="wrong number of dimensions"):
        saturate_rgb(bad, 1.1)
    with pytest.raises(ValueError, match="wrong number of dimensions"):
        convert_arr(bad, cs.rgb, cs.lch)


def test_bad_array_type():
    bad = (np.random.default_rng(0).random((3, 3, 3)) * 255).astype("uint8")
    with pytest.raises(ValueError, match="dtype mismatch"):
        saturate_rgb(bad, 1.1)
    with pytest.raises(ValueError, match="dtype mismatch"):
        convert_arr(bad, cs.rgb, cs.lch)


def test_array_bad_colorspace():
    arr = np.random.default_rng(0).random((3, 3))
    with pytest.raises(ValueError):
        convert_arr(arr, src="FOO", dst="RGB")
    with pytest.raises(ValueError):
        convert_arr(arr, src=999, dst=999)


def test_bad_colorspace_string():
    with pytest.raises(ValueError):
        convert(0.1, 0.1, 0.1, src="FOO", dst="RGB")


def test_bad_colorspace_invalid_int():
    with pytest.raises(ValueError):
        convert(0.1, 0.1, 0.1, src=999, dst=999)


def test_bad_colorspace_invalid_enum():
    with pytest.raises(AttributeError):
        convert(0.1, 0.1, 0.1, src=cs.foo, dst=cs.bar)


def test_string_colorspaces_accepted():
    assert convert(0.2, 0.3, 0.4, src="rgb", dst="lch") == convert(
        0.2, 0.3, 0.4, src=cs.rgb, dst=cs.lch
    )


def test_identity_src_eq_dst():
    assert convert(0.2, 0.3, 0.4, src=cs.rgb, dst=cs.rgb) == (0.2, 0.3, 0.4)


RGB_VALS = [0.0, 0.01, 0.3, 0.5, 0.7, 0.99, 1.0]


@pytest.mark.parametrize("dst", [v for v in cs if v != cs.rgb])
def test_rgb_convert_roundtrip_sweep(dst):
    """343-color roundtrip sweep, vectorized over the whole grid at once
    (the reference iterates scalars; same tolerance 0.1)."""
    colors = np.array(list(product(RGB_VALS, repeat=3)))  # (343, 3)
    arr = colors.T.reshape(3, -1, 1)  # (3, 343, 1)
    there = convert_arr(arr, cs.rgb, dst)
    back = convert_arr(there, dst, cs.rgb)
    bad = ~np.all(np.abs(back - arr) <= 0.1, axis=0).ravel()
    # LUV roundtrip of pure black-adjacent colors can drift; the reference
    # falls back to a colormath oracle there — we require failures to be
    # only at the degenerate zero-luminance corner.
    if bad.any():
        assert dst == cs.luv
        assert np.all(colors[bad].max(axis=1) <= 0.011)


def test_scalar_matches_array_kernel():
    rng = np.random.default_rng(42)
    arr = rng.random((3, 4, 5))
    out = convert_arr(arr, cs.rgb, cs.lch)
    for i in range(4):
        for j in range(5):
            s = convert(arr[0, i, j], arr[1, i, j], arr[2, i, j], cs.rgb, cs.lch)
            assert np.allclose(out[:, i, j], s, atol=1e-12)
