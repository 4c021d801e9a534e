"""Dtype scaling + ImageMagick translation utilities.

Semantics pinned to the reference (/root/reference/rio_color/utils.py):

- all intermediate math is float64 scaled to [0, 1] (utils.py:6-12)
- ``to_math_type`` divides by the SOURCE dtype's max (utils.py:15-20)
- ``scale_dtype`` multiplies by the TARGET dtype's max and TRUNCATES
  (``astype``, not round — utils.py:23-26; exact uint8 round-trip is pinned
  by the reference's tests/test_utils.py:34-37)
- ``magick_to_rio`` translates a small ImageMagick subset to the ops DSL
  (utils.py:29-90); golden translation pinned at tests/test_utils.py:40-62
"""

from __future__ import annotations

import re

import numpy as np

#: dtype used for every intermediate pixel-math operation
math_type = np.float64

#: smallest representable float64 increment; used for domain tolerances
epsilon: float = float(np.finfo(math_type).eps)


def to_math_type(arr: np.ndarray) -> np.ndarray:
    """Scale an integer array linearly down to float64 in [0, 1]."""
    return arr.astype(math_type) / np.iinfo(arr.dtype).max


def scale_dtype(arr: np.ndarray, dtype) -> np.ndarray:
    """Scale a [0, 1] float array linearly up to an integer dtype.

    Truncates (does not round) to match the reference exactly.
    """
    return (arr * np.iinfo(dtype).max).astype(dtype)


def psnr(a: np.ndarray, b: np.ndarray, peak: float | None = None) -> float:
    """Peak signal-to-noise ratio in dB between two same-shape images.

    The BASELINE gate is "golden pass at PSNR ≥ 40 dB on decoded pixels"
    (BASELINE.json metric; SURVEY.md §7a). With today's lossless npy8/npy16
    codecs engine output is bit-exact and this returns ``inf`` — the gate
    exists so any future LOSSY codec keeps an objective quality floor.

    ``peak`` defaults to the dtype max for integer arrays and 1.0 for the
    [0, 1] float math domain. Identical inputs → ``inf``.
    """
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        raise ValueError(f"shape mismatch {a.shape} vs {b.shape}")
    if peak is None:
        peak = float(np.iinfo(a.dtype).max) if a.dtype.kind in "iu" else 1.0
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0.0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


# -- ImageMagick `convert` option translation --------------------------------

_SPLIT_ARGS = re.compile(r"[,x]+")


def magick_to_rio(convert_opts: str) -> str:
    """Translate a limited subset of ImageMagick convert options to the DSL.

    Behavior (all pinned by the reference golden at tests/test_utils.py:40-62):

    - ``-channel X`` sets the band target for subsequent ops; ``+channel``
      resets it to RGB.
    - ``-sigmoidal-contrast CxP%`` → ``sigmoidal BANDS C P/100``; a bare
      ``C`` gets the default bias 0.5.
    - ``-gamma G`` → ``gamma BANDS G``.
    - ``-modulate A,B`` → ``saturation B/100`` (first arg ignored).
    """
    out: list[str] = []
    state = {"bands": "RGB"}

    def take_channel(token: str) -> None:
        state["bands"] = token.upper()

    def take_sigmoidal(token: str) -> None:
        args = [a for a in _SPLIT_ARGS.split(token) if a]
        if len(args) == 1:
            contrast, bias = args[0], 0.5
        else:
            contrast = args[0]
            bias = float(args[1].replace("%", "")) / 100.0
        out.append(f"sigmoidal {state['bands']} {contrast} {bias}")

    def take_gamma(token: str) -> None:
        out.append(f"gamma {state['bands']} {token}")

    def take_modulate(token: str) -> None:
        args = [a for a in _SPLIT_ARGS.split(token) if a]
        out.append(f"saturation {float(args[1]) / 100}")

    flag_handlers = {
        "-channel": take_channel,
        "-sigmoidal-contrast": take_sigmoidal,
        "-gamma": take_gamma,
        "-modulate": take_modulate,
    }

    pending = None
    for part in convert_opts.strip().split(" "):
        if part in flag_handlers:
            pending = flag_handlers[part]
        elif part == "+channel":
            state["bands"] = "RGB"
            pending = None
        else:
            if pending is not None:
                pending(part)
            pending = None

    return " ".join(out)
