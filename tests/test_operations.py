"""Golden-value + DSL tests, mirroring the reference's
tests/test_operations.py (layers 1-2 of SURVEY.md §5)."""

import numpy as np
import pytest

from rio_color_spark.functions.operations import (
    gamma,
    saturation,
    sigmoidal,
    simple_atmo,
    simple_atmo_opstring,
)
from rio_color_spark.functions.utils import to_math_type
from rio_color_spark.plans.dsl import compile_chain, parse_operations


@pytest.fixture
def arr():
    return to_math_type(
        np.array(
            [
                [[1, 2], [3, 4]],  # red
                [[5, 6], [7, 8]],  # green
                [[9, 10], [11, 12]],  # blue
            ]
        ).astype("uint8")
        * 10
    )


@pytest.fixture
def arr_rgba():
    return to_math_type(
        np.array(
            [
                [[1, 2], [3, 4]],
                [[5, 6], [7, 8]],
                [[9, 10], [11, 12]],
                [[0, 0], [25.5, 25.5]],  # alpha; 25.5→uint8 trunc 25, ×10=250
            ]
        ).astype("uint8")
        * 10
    )


def test_sigmoidal(arr):
    assert abs(sigmoidal(arr, 10, 0.15)[0][0][0] - 0.08056034) < 1e-4
    assert abs(sigmoidal(arr, -10, 0.15)[0][0][0] - 0.020186627) < 1e-4
    # bias 0 becomes epsilon
    assert abs(sigmoidal(arr, 10, 0)[0][0][0] - 0.19362122) < 1e-4
    # contrast 0 → identity, exactly
    assert np.array_equal(sigmoidal(arr, 0, 0.15), arr)
    # bias out of [0, 1]
    with pytest.raises(ValueError):
        sigmoidal(arr, 100, -0.5)
    # input out of [0, 1]
    with pytest.raises(ValueError):
        bad = arr.copy()
        bad[0][0][1] = 2.0
        sigmoidal(bad, 10, 0.5)


def test_gamma(arr):
    assert abs(gamma(arr, 0.95)[0][0][0] - 0.033069782) < 1e-4
    with pytest.raises(ValueError):
        gamma(arr, -2.0)
    with pytest.raises(ValueError):
        gamma(arr, -0.001)
    with pytest.raises(ValueError):
        gamma(arr, np.nan)
    with pytest.raises(ValueError):
        gamma(arr * -1, 2.2)


def test_sat(arr):
    # The reference's assertion is one-sided (no abs, reference
    # tests/test_operations.py:93): satmult=50 blows up chroma and the
    # xyz→rgb clamp (colorspace.pyx:411-423) drives R to exactly 0.0.
    x = saturation(arr, 50)
    assert x[0][0][0] - 0.15860622 < 1e-4
    assert x[0][0][0] == 0.0
    # a sane satmult hits the documented golden region
    assert abs(saturation(arr, 1.15)[0][0][0] - arr[0][0][0]) < 0.05


def test_sat_rgba_direct(arr_rgba):
    with pytest.raises(ValueError):
        saturation(arr_rgba, 50)
    with pytest.raises(ValueError):
        saturation(arr_rgba[0:2], 50)


def test_atmo(arr):
    assert abs(simple_atmo(arr, 0.03, 10, 0.15)[0][0][0] - 0.080560341) < 1e-4
    with pytest.raises(ValueError):
        simple_atmo(arr, 2.0, 10, 0.15)  # gamma_b <= 0
    with pytest.raises(ValueError):
        simple_atmo(arr, 0.03, 1000, -0.15)  # bias out of range


def test_atmo_alpha_passthrough(arr_rgba):
    out = simple_atmo(arr_rgba, 0.03, 10, 0.15)
    assert out.shape[0] == 4
    assert np.array_equal(out[3], arr_rgba[3])


def test_parse_gamma(arr):
    f = parse_operations("gamma rgb 0.95")[0]
    assert np.array_equal(f(arr), gamma(arr, 0.95))


def test_parse_sigmoidal(arr):
    f = parse_operations("sigmoidal rgb 5 0.53")[0]
    assert np.array_equal(f(arr), sigmoidal(arr, contrast=5, bias=0.53))


def test_parse_multi(arr):
    f1, f2 = parse_operations("gamma rgb 0.95 sigmoidal rgb 35 0.13")
    assert np.array_equal(
        f2(f1(arr)), sigmoidal(gamma(arr, g=0.95), contrast=35, bias=0.13)
    )


def test_parse_comma(arr):
    f1, f2 = parse_operations("gamma r,g,b 0.95, sigmoidal r,g,b 35 0.13")
    assert np.array_equal(
        f2(f1(arr)), sigmoidal(gamma(arr, g=0.95), contrast=35, bias=0.13)
    )


def test_parse_saturation_rgb(arr):
    f = parse_operations("saturation 1.25")[0]
    assert np.allclose(f(arr), saturation(arr, 1.25))


def test_parse_rgba(arr, arr_rgba):
    f = parse_operations("gamma rg 0.95")[0]
    rgb = f(arr)
    assert rgb.shape[0] == 3
    rgba = f(arr_rgba)
    assert rgba.shape[0] == 4
    assert np.allclose(rgba[0:3], rgb[0:3])
    assert np.array_equal(rgba[3], arr_rgba[3])


def test_saturation_rgba(arr, arr_rgba):
    f = parse_operations("saturation 1.25")[0]
    satrgb = f(arr)
    satrgba = f(arr_rgba)
    assert satrgba.shape[0] == 4
    assert np.array_equal(satrgba[3], arr_rgba[3])
    assert np.allclose(satrgba[0:3], satrgb[0:3])


def test_parse_bad_op():
    with pytest.raises(ValueError):
        parse_operations("foob 123")


def test_parse_bands(arr):
    fa = parse_operations("gamma 1,2 0.95")[0]
    fb = parse_operations("gamma Rg 0.95")[0]
    assert np.array_equal(fa(arr), fb(arr))
    with pytest.raises(ValueError):
        parse_operations("gamma 7,8,9 1.05")


def test_parse_multi_saturation_first(arr):
    f1, f2 = parse_operations("saturation 1.25 gamma rgb 0.95")
    assert np.array_equal(f2(f1(arr)), gamma(saturation(arr, 1.25), g=0.95))


def test_parse_multi_name(arr):
    f1, f2 = parse_operations("saturation 1.25 gamma rgb 0.95")
    assert f1.__name__ == "saturation"
    assert f2.__name__ == "gamma"


def test_simple_atmos_opstring(arr):
    x = simple_atmo(arr, 0.03, 10, 0.15)
    opstr = simple_atmo_opstring(0.03, 10, 0.15)
    assert opstr == "gamma g 0.99, gamma b 0.97, sigmoidal rgb 10 0.15"
    folded = arr
    for op in parse_operations(opstr):
        folded = op(folded)
    assert np.allclose(x, folded)


# -- fused-chain compiler (net-new: our whole-stage codegen) ------------------


@pytest.mark.parametrize(
    "ops",
    [
        "gamma rgb 0.95",
        "sigmoidal rgb 35 0.13",
        "saturation 1.25",
        "gamma b 1.85 gamma rg 1.95 sigmoidal rgb 35 0.13 saturation 1.15",
        "saturation 1.25 gamma rgb 0.95 sigmoidal 1,2 5 0.53",
        "sigmoidal rgb 0 0.5 gamma 3 1.1",
    ],
)
def test_fused_equals_folded(ops, arr):
    fused = compile_chain(ops)
    folded = arr
    for f in parse_operations(ops):
        folded = f(folded)
    assert np.array_equal(fused(arr), folded)


def test_fused_rgba_alpha_passthrough(arr_rgba):
    fused = compile_chain("gamma rg 0.95 sigmoidal rgb 20 0.2")
    out = fused(arr_rgba)
    assert out.shape == arr_rgba.shape
    assert np.array_equal(out[3], arr_rgba[3])


def test_fused_does_not_mutate_input(arr):
    before = arr.copy()
    compile_chain("gamma rgb 0.95")(arr)
    assert np.array_equal(arr, before)
