"""Color transfer functions: sigmoidal contrast, gamma, saturation, atmo.

Numeric semantics pinned to /root/reference/rio_color/operations.py:

- all math on float64 arrays scaled to [0, 1]; inputs outside
  ``[0 - eps, 1 + eps]`` raise ValueError (operations.py:52-56, 118-121)
- ``sigmoidal``: bias == 0 → epsilon (operations.py:61-62); contrast == 0 →
  identity returning the SAME array object (operations.py:64-65, pinned by
  the reference's tests/test_operations.py:61-62 ``array_equal``); the
  beta > 0 normalized-sigmoid and beta < 0 inverse-sigmoid closed forms
  (operations.py:69-95); divide/invalid errors silenced (operations.py:67)
- ``gamma``: ``arr ** (1.0 / g)`` — reciprocal exponent (operations.py:123);
  g <= 0 or NaN raises (operations.py:118-121)
- ``saturation``: exactly 3 bands, chroma multiply in LCH
  (operations.py:139-141)
- ``simple_atmo``: R untouched, G gamma'd by ``1 - haze/3``, B by
  ``1 - haze``, then sigmoidal over all three; bands past 3 pass through
  (operations.py:154-181)

Goldens: sigmoidal(arr,10,0.15)[0,0,0]≈0.08056034, gamma(arr,0.95)[0,0,0]≈
0.033069782, saturation(arr,50)[0,0,0]≈0.15860622 (reference
tests/test_operations.py:48-93).
"""

from __future__ import annotations

import numpy as np

from rio_color_spark.functions.colorspace import saturate_rgb
from rio_color_spark.functions.utils import epsilon


def _check_domain(arr: np.ndarray) -> None:
    if (arr.max() > 1.0 + epsilon) or (arr.min() < 0 - epsilon):
        raise ValueError("Input array must have float values between 0 and 1")


def sigmoidal(arr: np.ndarray, contrast: float, bias: float) -> np.ndarray:
    """Apply normalized sigmoidal contrast centered on ``bias``.

    ``contrast > 0`` applies
    ``(1/(1+exp(b*(a-x))) - 1/(1+exp(b*a))) / (1/(1+exp(b*(a-1))) - 1/(1+exp(b*a)))``
    with ``a = bias`` (epsilon if 0) and ``b = contrast``; ``contrast < 0``
    applies the closed-form inverse; ``contrast == 0`` is the identity.
    """
    _check_domain(arr)
    if (bias > 1.0 + epsilon) or (bias < 0 - epsilon):
        raise ValueError("bias must be a scalar float between 0 and 1")

    a = epsilon if bias == 0 else bias
    b = contrast
    if b == 0:
        return arr

    with np.errstate(divide="ignore", invalid="ignore"):
        if b > 0:
            numerator = 1 / (1 + np.exp(b * (a - arr))) - 1 / (1 + np.exp(b * a))
            denominator = 1 / (1 + np.exp(b * (a - 1))) - 1 / (1 + np.exp(b * a))
            return numerator / denominator
        # inverse sigmoid, same algebraic form as the reference
        return (
            b * a
            - np.log(
                1
                / (
                    arr / (1 + np.exp(b * a - b))
                    - arr / (1 + np.exp(b * a))
                    + 1 / (1 + np.exp(b * a))
                )
                - 1
            )
        ) / b


def gamma(arr: np.ndarray, g: float) -> np.ndarray:
    """Power-law correction: ``out = arr ** (1.0 / g)``."""
    _check_domain(arr)
    if g <= 0 or np.isnan(g):
        raise ValueError("gamma must be greater than 0")
    return arr ** (1.0 / g)


def saturation(arr: np.ndarray, proportion: float) -> np.ndarray:
    """Multiply chroma by ``proportion`` in LCH space; requires 3 bands."""
    if arr.shape[0] != 3:
        raise ValueError("saturation requires a 3-band array")
    return saturate_rgb(arr, proportion)


def simple_atmo_opstring(haze: float, contrast: float, bias: float) -> str:
    """DSL opstring equivalent of ``simple_atmo`` (operations.py:144-151)."""
    gamma_b = 1 - haze
    gamma_g = 1 - (haze / 3.0)
    return f"gamma g {gamma_g}, gamma b {gamma_b}, sigmoidal rgb {contrast} {bias}"


def simple_atmo(
    rgb: np.ndarray, haze: float, contrast: float, bias: float
) -> np.ndarray:
    """Static atmospheric correction; extra bands (alpha) pass through."""
    gamma_b = 1 - haze
    gamma_g = 1 - (haze / 3.0)

    arr = np.empty(shape=(3, rgb.shape[1], rgb.shape[2]))
    arr[0] = rgb[0]
    arr[1] = gamma(rgb[1], gamma_g)
    arr[2] = gamma(rgb[2], gamma_b)

    output = rgb.copy()
    output[0:3] = sigmoidal(arr, contrast, bias)
    return output
