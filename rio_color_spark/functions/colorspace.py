"""Vectorized colorspace conversions (RGB / XYZ / LAB / LCH / LUV).

Numeric semantics pinned to the reference's Cython kernel
(/root/reference/rio_color/colorspace.pyx), re-derived as whole-array NumPy
expressions — the per-pixel ``for i/for j`` loops (colorspace.pyx:90-98,
120-132) become ~10 array ops per conversion hop. Behavioral pins:

- sRGB companding piecewise (colorspace.pyx:265-277, compile-time flag
  ``SRGB_COMPAND=True`` at colorspace.pyx:255)
- non-standard white normalization: X/xn and Z/zn applied INSIDE rgb→xyz
  (colorspace.pyx:286-288) and re-multiplied in xyz→rgb (colorspace.pyx:383-384)
- LCH hue in RADIANS via atan2 (colorspace.pyx:332)
- xyz→rgb hard-clamps to [0, 1] (colorspace.pyx:411-423)
- luv→xyz special-cases L == 0 → (0,0,0) (colorspace.pyx:460-464)
- all routes hub through XYZ and/or LAB exactly as the reference's
  ``_convert`` routing (colorspace.pyx:137-231)
- division by zero / invalid propagates NaN/inf silently, matching the
  reference's ``cdivision=True`` C semantics (colorspace.pyx:1)
"""

from __future__ import annotations

from enum import IntEnum

import numpy as np


class ColorSpace(IntEnum):
    """Color space tags — values match the reference enum (colorspace.pyx:23-28)."""

    rgb = 0
    xyz = 1
    lab = 2
    lch = 3
    luv = 4


# D65 constants (colorspace.pyx:235-247)
_BINTERCEPT = 4.0 / 29
_DELTA = 6.0 / 29
_T0 = _DELTA**3
_ALPHA = (_DELTA**-2) / 3
_THIRD = 1.0 / 3
_KAPPA = (29.0 / 3) ** 3
_XN = 0.95047
_YN = 1.0
_ZN = 1.08883
_DENOM_N = _XN + (15 * _YN) + (3 * _ZN)
_UPRIME_N = (4 * _XN) / _DENOM_N
_VPRIME_N = (9 * _YN) / _DENOM_N


def _srgb_inverse_compand(c):
    """sRGB channel → linear-light channel (the pointwise companding leg,
    split out so quantized-input callers can fold it into a lookup table —
    operators/color.py; byte-identical op sequence either way)."""
    with np.errstate(invalid="ignore"):
        return np.where(c <= 0.04045, c / 12.92, ((c + 0.055) / 1.055) ** 2.4)


def _linear_rgb_to_xyz(rl, gl, bl):
    """linear-RGB → XYZ with the reference's in-stage X/xn, Z/zn norm."""
    x = (rl * 0.4124564 + gl * 0.3575761 + bl * 0.1804375) / _XN
    y = rl * 0.2126729 + gl * 0.7151522 + bl * 0.0721750
    z = (rl * 0.0193339 + gl * 0.1191920 + bl * 0.9503041) / _ZN
    return x, y, z


def _rgb_to_xyz(r, g, b):
    # sRGB inverse companding, then linear-RGB → XYZ
    return _linear_rgb_to_xyz(
        _srgb_inverse_compand(r),
        _srgb_inverse_compand(g),
        _srgb_inverse_compand(b),
    )


def _xyz_to_lab(x, y, z):
    # np.cbrt == pow(t, 1/3) to float ulps and runs ~1.8x faster (SIMD
    # cube root vs scalar libm pow); the ulp delta is far inside the
    # oracle twins' 6/7-digit rounding and the reference-golden tolerances
    with np.errstate(invalid="ignore"):
        fx = np.where(x > _T0, np.cbrt(x), _ALPHA * x + _BINTERCEPT)
        fy = np.where(y > _T0, np.cbrt(y), _ALPHA * y + _BINTERCEPT)
        fz = np.where(z > _T0, np.cbrt(z), _ALPHA * z + _BINTERCEPT)
    return 116 * fy - 16, 500 * (fx - fy), 200 * (fy - fz)


def _lab_to_lch(L, a, b):
    # hue is RADIANS (colorspace.pyx:332); C uses the same sqrt form as the
    # reference's ((a*a)+(b*b))**0.5
    return L, np.sqrt(a * a + b * b), np.arctan2(b, a)


def _lch_to_lab(L, C, H):
    return L, C * np.cos(H), C * np.sin(H)


def _lab_to_xyz(L, a, b):
    tx = (L + 16) / 116.0 + a / 500.0
    ty = (L + 16) / 116.0
    tz = (L + 16) / 116.0 - b / 200.0
    # t*t*t == t**3 within 1 ulp at ~2.3x the speed (two multiplies vs a
    # scalar libm pow pass); rounding on both oracle sides absorbs it
    with np.errstate(invalid="ignore"):
        x = np.where(tx > _DELTA, tx * tx * tx, 3 * _DELTA * _DELTA * (tx - _BINTERCEPT))
        y = np.where(ty > _DELTA, ty * ty * ty, 3 * _DELTA * _DELTA * (ty - _BINTERCEPT))
        z = np.where(tz > _DELTA, tz * tz * tz, 3 * _DELTA * _DELTA * (tz - _BINTERCEPT))
    return x, y, z


def _xyz_to_rgb(x, y, z):
    x = x * _XN
    z = z * _ZN
    rlin = x * 3.2404542 + y * -1.5371385 + z * -0.4985314
    glin = x * -0.9692660 + y * 1.8760108 + z * 0.0415560
    blin = x * 0.0556434 + y * -0.2040259 + z * 1.0572252
    with np.errstate(invalid="ignore"):
        r = np.where(rlin <= 0.0031308, 12.92 * rlin, 1.055 * rlin ** (1 / 2.4) - 0.055)
        g = np.where(glin <= 0.0031308, 12.92 * glin, 1.055 * glin ** (1 / 2.4) - 0.055)
        b = np.where(blin <= 0.0031308, 12.92 * blin, 1.055 * blin ** (1 / 2.4) - 0.055)
    # hard clamp for float drift (colorspace.pyx:411-423); NaN passes through
    # np.clip untouched, matching the C comparison chain's NaN behavior
    return np.clip(r, 0.0, 1.0), np.clip(g, 0.0, 1.0), np.clip(b, 0.0, 1.0)


def _xyz_to_luv(x, y, z):
    with np.errstate(divide="ignore", invalid="ignore"):
        denom = x + 15 * y + 3 * z
        uprime = (4 * x) / denom
        vprime = (9 * y) / denom
        yr = y / _YN
        L = np.where(yr <= _T0, _KAPPA * yr, 116 * np.power(yr, _THIRD) - 16)
        u = 13 * L * (uprime - _UPRIME_N)
        v = 13 * L * (vprime - _VPRIME_N)
    return L, u, v


def _luv_to_xyz(L, u, v):
    with np.errstate(divide="ignore", invalid="ignore"):
        uprime = u / (13 * L) + _UPRIME_N
        vprime = v / (13 * L) + _VPRIME_N
        y = np.where(L <= 8.0, L / _KAPPA, ((L + 16) / 116.0) ** 3)
        x = y * ((9 * uprime) / (4 * vprime))
        z = y * ((12 - 3 * uprime - 20 * vprime) / (4 * vprime))
    # L == 0 → exactly (0, 0, 0) (colorspace.pyx:460-464)
    zero = L == 0.0
    x = np.where(zero, 0.0, x)
    y = np.where(zero, 0.0, y)
    z = np.where(zero, 0.0, z)
    return x, y, z


# Routing table: every (src, dst) pair maps to a hop chain through the
# XYZ / LAB hubs, mirroring _convert (colorspace.pyx:137-231).
_ROUTES = {
    (ColorSpace.rgb, ColorSpace.xyz): (_rgb_to_xyz,),
    (ColorSpace.rgb, ColorSpace.lab): (_rgb_to_xyz, _xyz_to_lab),
    (ColorSpace.rgb, ColorSpace.lch): (_rgb_to_xyz, _xyz_to_lab, _lab_to_lch),
    (ColorSpace.rgb, ColorSpace.luv): (_rgb_to_xyz, _xyz_to_luv),
    (ColorSpace.xyz, ColorSpace.lab): (_xyz_to_lab,),
    (ColorSpace.xyz, ColorSpace.lch): (_xyz_to_lab, _lab_to_lch),
    (ColorSpace.xyz, ColorSpace.rgb): (_xyz_to_rgb,),
    (ColorSpace.xyz, ColorSpace.luv): (_xyz_to_luv,),
    (ColorSpace.lab, ColorSpace.xyz): (_lab_to_xyz,),
    (ColorSpace.lab, ColorSpace.lch): (_lab_to_lch,),
    (ColorSpace.lab, ColorSpace.rgb): (_lab_to_xyz, _xyz_to_rgb),
    (ColorSpace.lab, ColorSpace.luv): (_lab_to_xyz, _xyz_to_luv),
    (ColorSpace.lch, ColorSpace.lab): (_lch_to_lab,),
    (ColorSpace.lch, ColorSpace.xyz): (_lch_to_lab, _lab_to_xyz),
    (ColorSpace.lch, ColorSpace.rgb): (_lch_to_lab, _lab_to_xyz, _xyz_to_rgb),
    (ColorSpace.lch, ColorSpace.luv): (_lch_to_lab, _lab_to_xyz, _xyz_to_luv),
    (ColorSpace.luv, ColorSpace.lab): (_luv_to_xyz, _xyz_to_lab),
    (ColorSpace.luv, ColorSpace.xyz): (_luv_to_xyz,),
    (ColorSpace.luv, ColorSpace.rgb): (_luv_to_xyz, _xyz_to_rgb),
    (ColorSpace.luv, ColorSpace.lch): (_luv_to_xyz, _xyz_to_lab, _lab_to_lch),
}


def _normalize_space(value, which: str) -> ColorSpace:
    """Accept str / int / ColorSpace; ValueError otherwise (colorspace.pyx:44-69)."""
    if isinstance(value, str):
        try:
            return ColorSpace[value.lower()]
        except KeyError:
            raise ValueError(f"Invalid {which} colorspace: {value}")
    if isinstance(value, ColorSpace):
        return value
    if isinstance(value, int):
        try:
            return ColorSpace(value)
        except ValueError:
            raise ValueError(f"Invalid {which} colorspace: {value}")
    raise ValueError("Invalid colorspace")


def convert_channels(one, two, three, src: ColorSpace, dst: ColorSpace):
    """Convert three same-shaped arrays between colorspaces (vectorized core)."""
    if src == dst:
        return one, two, three
    chain = _ROUTES[(src, dst)]
    for hop in chain:
        one, two, three = hop(one, two, three)
    return one, two, three


def convert(one: float, two: float, three: float, src, dst):
    """Scalar conversion — API parity with the reference's ``convert``."""
    src = _normalize_space(src, "source")
    dst = _normalize_space(dst, "destination")
    a, b, c = convert_channels(
        np.float64(one), np.float64(two), np.float64(three), src, dst
    )
    return float(a), float(b), float(c)


def _check_arr(arr: np.ndarray) -> None:
    """Shape/dtype validation with the reference's error wording
    (colorspace.pyx buffer checks, pinned at tests/test_colorspace.py:140-170)."""
    if arr.ndim != 3:
        raise ValueError(
            f"Buffer has wrong number of dimensions (expected 3, got {arr.ndim})"
        )
    if arr.shape[0] != 3:
        raise ValueError("The 0th dimension must contain 3 bands")
    if arr.dtype != np.float64:
        raise ValueError("Buffer dtype mismatch, expected 'float64'")


def convert_arr(arr: np.ndarray, src, dst) -> np.ndarray:
    """Convert a (3, H, W) float64 array between colorspaces."""
    if not isinstance(src, ColorSpace) or not isinstance(dst, ColorSpace):
        # match the reference's `src not in ColorSpace` membership check
        try:
            src = ColorSpace(src) if not isinstance(src, ColorSpace) else src
            dst = ColorSpace(dst) if not isinstance(dst, ColorSpace) else dst
        except (ValueError, KeyError):
            raise ValueError("Invalid colorspace")
    _check_arr(arr)
    one, two, three = convert_channels(arr[0], arr[1], arr[2], src, dst)
    out = np.empty((3,) + arr.shape[1:], dtype=np.float64)
    out[0], out[1], out[2] = one, two, three
    return out


def saturate_rgb(arr: np.ndarray, satmult: float) -> np.ndarray:
    """RGB → LCH, scale chroma by ``satmult``, LCH → RGB — computed via
    the LAB shortcut: C = hypot(a, b) and H = atan2(b, a), so scaling C
    with H fixed is EXACTLY (a, b) → (satmult·a, satmult·b); the
    LAB→LCH→LAB legs cancel algebraically. This removes four
    transcendental passes (sqrt, atan2, cos, sin) per image versus the
    reference's literal per-pixel LCH loop (colorspace.pyx:103-134) —
    measured 3.5 s of a 9.8 s local[8] flagship-pipeline window — while
    agreeing with it to float ulps (pinned in tests/test_colorspace.py).
    """
    _check_arr(arr)
    return saturate_rgb_from_linear(
        _srgb_inverse_compand(arr[0]),
        _srgb_inverse_compand(arr[1]),
        _srgb_inverse_compand(arr[2]),
        satmult,
    )


def saturate_rgb_from_linear(rl, gl, bl, satmult: float) -> np.ndarray:
    """:func:`saturate_rgb` over already-inverse-companded linear channels.

    Split out so the quantized-input LUT path (operators/color.py) can fold
    the three companding ``pow(x, 2.4)`` passes into its per-band tables;
    the op sequence from the linear channels onward is byte-identical to
    :func:`saturate_rgb` (which now delegates here)."""
    L, a, b = _xyz_to_lab(*_linear_rgb_to_xyz(rl, gl, bl))
    r, g, bb = convert_channels(
        L, a * satmult, b * satmult, ColorSpace.lab, ColorSpace.rgb
    )
    out = np.empty((3,) + np.shape(rl), dtype=np.float64)
    out[0], out[1], out[2] = r, g, bb
    return out
