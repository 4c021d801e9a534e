"""Dtype scaling + magick translation tests, mirroring the reference's
tests/test_utils.py."""

import numpy as np

from rio_color_spark.functions.utils import magick_to_rio, scale_dtype, to_math_type


def test_to_math_type():
    arr = np.array([[0, 127, 255]], dtype="uint8")
    out = to_math_type(arr)
    assert out.dtype == np.float64
    assert out[0, 0] == 0.0
    assert out[0, 2] == 1.0


def test_scale_dtype_roundtrip_uint8():
    arr = np.arange(256, dtype="uint8").reshape(16, 16)
    assert np.array_equal(scale_dtype(to_math_type(arr), "uint8"), arr)


def test_scale_dtype_roundtrip_uint16():
    arr = np.array([0, 1, 1000, 65535], dtype="uint16")
    assert np.array_equal(scale_dtype(to_math_type(arr), "uint16"), arr)


def test_scale_dtype_truncates():
    # 0.9999 * 255 = 254.97 → truncates to 254 (no rounding)
    assert scale_dtype(np.array([0.9999]), "uint8")[0] == 254
    assert scale_dtype(np.array([1.0]), "uint8")[0] == 255
    assert scale_dtype(np.array([1.0]), "uint16")[0] == 65535


def test_magick_to_rio_golden():
    magick = (
        "-channel B -sigmoidal-contrast 4 -gamma 0.95 "
        "-channel r -gamma 1.10 "
        "-channel rgb -sigmoidal-contrast 1x55% "
        "-channel G -gamma 0.9 -modulate 100,125 "
        "+channel -sigmoidal-contrast 3,40% -modulate 222,135"
    )
    expected = (
        "sigmoidal B 4 0.5 gamma B 0.95 gamma R 1.10 sigmoidal RGB 1 0.55 "
        "gamma G 0.9 saturation 1.25 sigmoidal RGB 3 0.4 saturation 1.35"
    )
    assert magick_to_rio(magick) == expected
