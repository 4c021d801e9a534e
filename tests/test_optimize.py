"""optimize_color port tests (reference scripts/optimize_color.py):
histogram_distance goldens, distributed-histogram exactness, and
annealing convergence on a synthetic target."""

import numpy as np
import pytest

from rio_color_spark.operators.color import color_correct
from rio_color_spark.operators.optimize import (
    band_histograms,
    histogram_distance,
    optimize_color,
    sample_pixels,
)
from rio_color_spark.sources import codec
from rio_color_spark.sources.images import generate_pandas, images_df


def test_histogram_distance_golden():
    """Pinned values from the reference formula (10 bins, normalized SSE)."""
    a = np.linspace(0.001, 0.999, 1000)
    assert histogram_distance(a, a) == 0.0
    lo = np.full(100, 0.05)
    hi = np.full(100, 0.95)
    # all mass in one bin vs another: SSE = 1^2 + 1^2 = 2
    assert histogram_distance(lo, hi) == pytest.approx(2.0)
    half = np.concatenate([lo, hi])
    # (0.5-1)^2 + (0.5-0)^2 vs lo: = 0.25 + 0.25 ... relative to lo: bins
    # (0.5 vs 1.0) and (0.5 vs 0.0) -> 0.25 + 0.25 = 0.5
    assert histogram_distance(half, lo) == pytest.approx(0.5)
    with pytest.raises(AssertionError):
        histogram_distance(np.array([1.5]), np.array([0.5]))


def test_band_histograms_exact(spark):
    """Distributed partial+merge histogram == single-pass NumPy histogram."""
    df = images_df(spark, 60)
    got = band_histograms(df)
    src = generate_pandas(np.arange(60))
    want = np.zeros((3, 10))
    for r in src.itertuples(index=False):
        arr = codec.decode(r.bytes, r.w, r.h, r.fmt).astype(np.float64)
        arr = arr / np.iinfo(codec.format_info(r.fmt).dtype).max
        for b in range(3):
            want[b] += np.histogram(arr[b], bins=[x / 10 for x in range(11)])[0]
    want = want / want.sum(axis=1, keepdims=True)
    np.testing.assert_allclose(got, want, atol=1e-12)


def test_optimize_converges_to_synthetic_target(spark):
    """Source recolored by a known formula is recovered: annealing drives
    the histogram distance far below the identity formula's score."""
    src = images_df(spark, 80).filter("fmt != 'npy8a'").cache()
    target_ops = "gamma r 1.4, gamma g 0.8, gamma b 1.2, sigmoidal rgb 14 0.5"
    ref = color_correct(src, target_ops).cache()

    out = optimize_color(src, ref, steps=200, seed=7, max_pixels=60_000)
    assert out["initial_score"] > 0.5
    assert out["score"] < out["initial_score"] * 0.25
    assert out["ops"].startswith("gamma r ")
    # the found state moves in the right directions vs identity
    assert out["state"]["gamma_red"] > 1.05
    assert out["state"]["gamma_green"] < 0.95


def test_sample_pixels_bounded_and_in_domain(spark):
    s = sample_pixels(images_df(spark, 50), max_pixels=10_000)
    assert s.shape[0] == 3
    assert 0 < s.shape[1] <= 15_000  # stride rounding can slightly overshoot
    assert s.min() >= 0.0 and s.max() <= 1.0


def test_sample_pixels_thins_when_rows_exceed_budget(spark):
    """n_rows > max_pixels: the hash filter thins the row set to ≈budget
    images at 1px each (binomial, so assert a generous envelope), and the
    ceil stride never overshoots per_image on the dense path."""
    df = images_df(spark, 300)
    s = sample_pixels(df, max_pixels=100)
    assert s.shape[0] == 3
    assert 0 < s.shape[1] <= 200  # ≈100 survivors ± binomial noise
    assert s.min() >= 0.0 and s.max() <= 1.0
    # dense path: per_image bound is exact with the ceil stride
    s2 = sample_pixels(df, max_pixels=600, n_rows=300)
    assert s2.shape[1] <= 600


def test_band_histograms_rejects_empty_input(spark):
    df = images_df(spark, 10).filter("w < 0")
    with pytest.raises(ValueError, match="empty input"):
        band_histograms(df)
