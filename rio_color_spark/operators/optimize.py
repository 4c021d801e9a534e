"""Color-formula optimization — the Spark port of the reference's
``scripts/optimize_color.py`` (simulated annealing over
(gamma_red, gamma_green, gamma_blue, contrast) minimizing per-band
histogram SSE, reference optimize_color.py:50-191).

Spark-first split of the work:

- **Distributed**: pixel statistics over the full tables.
  :func:`band_histograms` computes exact 10-bin per-band histograms of an
  images table in one pass — partial histograms per Arrow batch (NumPy
  ``np.histogram`` in the worker), merged by a tiny (band, bin) groupBy:
  map-side combine, shuffle payload = bands × bins longs per task.
  :func:`sample_pixels` extracts a bounded, deterministic per-band pixel
  sample (the analogue of the reference's ~400px downsampled read,
  optimize_color.py:221-240).
- **Driver-side**: the annealing loop itself (reference semantics: move =
  multiply one random key by 0.95 or 1.05, optimize_color.py:79-94;
  energy = sum of per-band histogram distances × 100,
  optimize_color.py:110-118). Each energy evaluation is pure NumPy over
  the collected sample — annealing 5000 steps must not launch 5000 Spark
  jobs.

The found formula is an ops string ("gamma r X, gamma g Y, gamma b Z,
sigmoidal rgb C 0.5", optimize_color.py:96-102) directly consumable by
color_correct / the CLI.
"""

from __future__ import annotations

import math
import random
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_color_spark.functions.utils import to_math_type
from rio_color_spark.plans.dsl import compile_chain
from rio_color_spark.sources import codec

#: the reference's default bin edges (optimize_color.py:182)
DEFAULT_BINS = np.array([x / 10 for x in range(11)])


def histogram_distance(arr1: np.ndarray, arr2: np.ndarray, bins=None) -> float:
    """Sum of squared error between the normalized histograms of two [0,1]
    arrays — exact reference semantics (optimize_color.py:168-191) incl.
    the domain asserts."""
    eps = 1e-6
    assert arr1.min() > 0 - eps
    assert arr1.max() < 1 + eps
    assert arr2.min() > 0 - eps
    assert arr2.max() < 1 + eps
    if bins is None:
        bins = DEFAULT_BINS
    hist1 = np.histogram(arr1, bins=bins)[0] / arr1.size
    hist2 = np.histogram(arr2, bins=bins)[0] / arr2.size
    assert abs(hist1.sum() - 1.0) < eps
    assert abs(hist2.sum() - 1.0) < eps
    return float(((hist1 - hist2) ** 2).sum())


def _hist_sse(h1: np.ndarray, h2: np.ndarray) -> float:
    """histogram_distance on already-normalized histograms."""
    return float(((h1 - h2) ** 2).sum())


def histogram_df(df: DataFrame, bins=None) -> DataFrame:
    """Distributed exact per-band pixel histogram: (band, bin, n).

    One Python pass over the data (partial ``np.histogram`` per task,
    merged by a (band, bin) groupBy — map-side combine; the shuffle
    carries bands × bins longs per task, nothing else). Rows of each Arrow
    batch are stacked per (h, w, fmt) group (operators/media._group_stack)
    so the histogram kernel launches once per band per GROUP, not per row.
    """
    from rio_color_spark.operators.media import _group_stack

    edges = DEFAULT_BINS if bins is None else np.asarray(bins, dtype=np.float64)
    nb = len(edges) - 1

    def partial(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counts = np.zeros((3, nb), dtype=np.int64)
        for pdf in batches:
            for _sel, arr, _h, _w, fmt in _group_stack(pdf):
                # identical math to to_math_type(codec.decode(...)); the
                # stacked (B, C, h, w) array histograms each RGB band once
                scaled = arr[:, :3].astype(np.float64) / np.iinfo(
                    codec.format_info(fmt).dtype
                ).max
                for b in range(3):
                    counts[b] += np.histogram(scaled[:, b], bins=edges)[0]
        band_idx = np.repeat(np.arange(3), nb)
        bin_idx = np.tile(np.arange(nb), 3)
        yield pd.DataFrame(
            {"band": band_idx, "bin": bin_idx, "n": counts.ravel()}
        )

    return (
        df.select("bytes", "w", "h", "fmt")
        .mapInPandas(partial, schema="band int, bin int, n long")
        .groupBy("band", "bin")
        .agg(F.sum("n").alias("n"))
    )


def band_histograms(df: DataFrame, bins=None) -> np.ndarray:
    """Exact per-band normalized histogram of every pixel; (3, n_bins)."""
    edges = DEFAULT_BINS if bins is None else np.asarray(bins, dtype=np.float64)
    nb = len(edges) - 1
    out = np.zeros((3, nb), dtype=np.float64)
    for r in histogram_df(df, edges).collect():
        out[r["band"], r["bin"]] = r["n"]
    totals = out.sum(axis=1, keepdims=True)
    if not np.all(totals > 0):
        raise ValueError(
            "band_histograms: empty input (zero pixels in at least one band) "
            "— refusing to emit NaN histograms"
        )
    return out / totals


def sample_pixels(
    df: DataFrame, max_pixels: int = 250_000, n_rows: int | None = None
) -> np.ndarray:
    """Deterministic bounded per-band pixel sample, (3, N) float64 in [0,1].

    The collected sample stays ~``max_pixels`` regardless of table size
    (ADVICE r2): when the table has more rows than the budget, a
    deterministic ``xxhash64(image_id)`` filter first thins the row set to
    ≈max_pixels images (JVM-side — images outside the sample never cross
    into Python; hash thinning is binomial, so the count is max_pixels ±
    O(√max_pixels), not a hard ceiling), then each surviving image
    contributes a ceil-strided slice of ≤ per_image pixels (ceil, not
    floor: a floor stride overshoots the budget by up to 2×). Pass
    ``n_rows`` when the caller already knows the count (e.g. from a
    checkpoint manifest) to skip the extra counting scan.

    When the stride exceeds 1 each image starts its strided walk at a
    deterministic per-image offset (crc32 of the id, mod stride) instead
    of pixel 0 — with per_image == 1 a zero offset would make every image
    contribute exactly its top-left corner, a spatially biased sample for
    real imagery (vignetting/border artifacts; ADVICE r3)."""
    import zlib

    from rio_color_spark.operators.media import _group_stack

    if n_rows is None:
        n_rows = df.count()
    if n_rows > max_pixels:
        # keep ~max_pixels rows deterministically; survivors give 1px each
        keep = max(max_pixels, 1)
        df = df.filter(
            F.pmod(F.xxhash64(F.col("image_id")), F.lit(n_rows)) < F.lit(keep)
        )
        n_rows = keep
    per_image = max(1, max_pixels // max(n_rows, 1))

    def pick(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["image_id"].to_numpy()
            out = []
            for sel, arr, h, w, fmt in _group_stack(pdf):
                info = codec.format_info(fmt)
                scaled = arr[:, :3].astype(np.float64) / np.iinfo(info.dtype).max
                flat = scaled.reshape(len(scaled), 3, h * w)
                # ceil stride: ceil(npix/stride) <= per_image, never over
                stride = -(-(h * w) // per_image) if per_image < h * w else 1
                if stride == 1:
                    picked = flat  # every pixel — no offset needed
                    out.append(picked.transpose(1, 0, 2).reshape(3, -1))
                else:
                    offs = np.array(
                        [zlib.crc32(str(s).encode()) % stride for s in ids[sel]],
                        dtype=np.int64,
                    )
                    n_keep = min(per_image, h * w)
                    # strided walk from each image's offset, CLAMPED — not
                    # wrapped: when stride divides h*w a wrapped index lands
                    # exactly on an earlier pick (e.g. h*w=12, stride=3,
                    # off=0 → pixel 0 twice), silently shrinking the
                    # distinct sample. Rows contribute ceil((h*w-off)/stride)
                    # pixels each; the flat concat below doesn't need
                    # rectangular rows.
                    idx = offs[:, None] + stride * np.arange(n_keep)[None, :]
                    valid = idx < h * w  # (B, n_keep)
                    picked = flat[
                        np.arange(len(sel))[:, None, None],
                        np.arange(3)[None, :, None],
                        np.minimum(idx, h * w - 1)[:, None, :],
                    ]
                    # (B, 3, n_keep) → (3, B, n_keep), then mask the
                    # clamped tail per row → (3, n_valid)
                    out.append(picked.transpose(1, 0, 2)[:, valid])
            s = np.concatenate(out, axis=1) if out else np.zeros((3, 0))
            yield pd.DataFrame({"r": s[0], "g": s[1], "b": s[2]})

    pdf = (
        df.select("image_id", "bytes", "w", "h", "fmt")
        .mapInPandas(pick, schema="r double, g double, b double")
        .toPandas()
    )
    return np.stack([pdf["r"].to_numpy(), pdf["g"].to_numpy(), pdf["b"].to_numpy()])


KEYS = ("gamma_red", "gamma_green", "gamma_blue", "contrast")


def cmd(state: dict) -> str:
    """State → ops string (reference optimize_color.py:96-102 format)."""
    return (
        "gamma r {gamma_red:.2f}, gamma g {gamma_green:.2f}, "
        "gamma b {gamma_blue:.2f}, sigmoidal rgb {contrast:.2f} 0.5".format(**state)
    )


def _energy(state: dict, src: np.ndarray, ref_hists: np.ndarray, edges) -> float:
    fused = compile_chain(cmd(state))
    arr = fused(src[:, :, None].copy())[:, :, 0]
    scores = [
        _hist_sse(
            ref_hists[b],
            np.histogram(arr[b], bins=edges)[0] / arr[b].size,
        )
        for b in range(3)
    ]
    return sum(scores) * 100  # reference's readability scale (line 118)


def optimize_color(
    src_images: DataFrame,
    ref_images: DataFrame,
    steps: int = 500,
    seed: int = 0,
    max_pixels: int = 250_000,
    t_max: float = 5.0,
    t_min: float = 0.001,
    src_n_rows: int | None = None,
) -> dict:
    """Find the ops string making ``src_images``' histogram match
    ``ref_images``'. Returns {"state", "ops", "score", "initial_score"}.

    Spark does the heavy reads once (reference histograms exactly over the
    full table; a bounded pixel sample of the source); the annealing loop
    (reference move/energy semantics, exponential T schedule) runs on the
    driver over the sample. Deterministic under ``seed``.

    The default temperature range is scaled to this energy (100×SSE ≈
    0-20) rather than simanneal's generic Tmax=25000 the reference
    inherits — at 25000 every move is accepted for ~95% of the schedule
    and convergence relies on a 5000-step random walk; sized to the
    energy, a few hundred steps converge.

    Pass ``src_n_rows`` when the source row count is already known (a
    checkpoint manifest's lineage counts, table metadata) — it saves
    sample_pixels' counting scan, which at 100 TB is a whole extra pass.
    """
    edges = DEFAULT_BINS
    ref_hists = band_histograms(ref_images, edges)
    src = sample_pixels(src_images, max_pixels, n_rows=src_n_rows)

    rng = random.Random(seed)
    state = dict(gamma_red=1.0, gamma_green=1.0, gamma_blue=1.0, contrast=10.0)
    e = _energy(state, src, ref_hists, edges)
    initial = e
    best_state, best_e = dict(state), e

    t_factor = -math.log(t_max / t_min)
    for step in range(steps):
        T = t_max * math.exp(t_factor * step / steps)
        k = rng.choice(KEYS)
        mult = rng.choice((0.95, 1.05))
        prev = state[k]
        state[k] = prev * mult
        e_new = _energy(state, src, ref_hists, edges)
        dE = e_new - e
        if dE > 0.0 and math.exp(-dE / T) < rng.random():
            state[k] = prev  # reject
        else:
            e = e_new
            if e < best_e:
                best_e, best_state = e, dict(state)
    return {
        "state": best_state,
        "ops": cmd(best_state),
        "score": best_e,
        "initial_score": initial,
    }
