"""Deduplication operators for large-scale training-data pipelines.

All four families over a generic (id, text) DataFrame:

- **exact** — md5 groupBy (one shuffle on the 16-byte digest)
- **MinHash + LSH** — shingle → 16 MinHashes → 4×4 banding → candidate
  pairs via band equi-join → exact-Jaccard verification. The band join is
  the canonical big-data near-dup plan: no cross join ever materializes.
- **SimHash** — 32-bit majority-vote fingerprint; near-dups = pairs at
  Hamming distance ≤ r among band-join candidates
- **n-gram Jaccard** — exact 3-shingle Jaccard on candidate pairs

Every hash primitive comes from functions/texthash.py and has a DuckDB
twin, so the driver's oracle comparison covers these operators exactly.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from rio_color_spark.functions import texthash as TH

_WS = re.compile(TH.WS_REGEX)


def _sig_from_shingles(sh: list[str]) -> list[int]:
    """MinHash signature from a precomputed shingle list (one tokenization
    per document — the shingles are computed once and shared, not rebuilt
    inside the signature)."""
    if not sh:
        return [TH.MINHASH_P] * TH.N_MINHASH
    hs = np.array(
        [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in sh],
        dtype=np.int64,
    )
    a = np.array(TH.MINHASH_A, dtype=np.int64)[:, None]
    b = np.array(TH.MINHASH_B, dtype=np.int64)[:, None]
    sig = ((a * (hs % TH.MINHASH_P)[None, :] + b) % TH.MINHASH_P).min(axis=1)
    return sig.tolist()


def _minhash_sig_py(text: str) -> list[int]:
    """NumPy MinHash signature — same algorithm as texthash.minhash_col.

    Token/shingle/hash definitions mirror the Column builders exactly:
    whitespace split of trimmed lowercased text, 3-word shingles, first 8
    md5 hex chars as the element hash.
    """
    return _sig_from_shingles(_shingles_py(text))


def _simhash_py(text: str) -> int:
    """32-bit majority SimHash — same algorithm as texthash.simhash_col."""
    toks = _WS.split(text.strip().lower())
    hs = np.array(
        [int(hashlib.md5(t.encode("utf-8")).hexdigest()[:8], 16) for t in toks],
        dtype=np.int64,
    )
    n = len(hs)
    bits = (hs[:, None] >> np.arange(TH.SIMHASH_BITS)[None, :]) & 1  # (n, 32)
    maj = bits.sum(axis=0) * 2 > n
    return int((maj.astype(np.int64) << np.arange(TH.SIMHASH_BITS)).sum())


def simhash_udf():
    @pandas_udf("long")
    def _u(texts: pd.Series) -> pd.Series:
        return texts.map(_simhash_py)

    return _u


def minhash_sig_udf():
    # built lazily: pandas_udf parses its DDL type against the active session
    @pandas_udf("array<long>")
    def _u(texts: pd.Series) -> pd.Series:
        return texts.map(_minhash_sig_py)

    return _u


def _shingles_py(text: str) -> list[str]:
    toks = _WS.split(text.strip().lower())
    return [" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)]


def shingles_and_sig_udf():
    """One Arrow pass computing both the shingle set and the MinHash sig."""

    @pandas_udf("struct<sh: array<string>, sig: array<long>>")
    def _u(texts: pd.Series) -> pd.DataFrame:
        sh = texts.map(_shingles_py)
        sig = sh.map(_sig_from_shingles)  # derive from the SAME shingles
        return pd.DataFrame({"sh": sh, "sig": sig})

    return _u


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Duplicate groups by exact content hash.

    Output: (content_md5, n_dups, canonical_id) for groups with ≥2 members.
    """
    return (
        df.select(F.col(id_col).alias("id"), F.md5(F.col(text_col).cast("binary")).alias("content_md5"))
        .groupBy("content_md5")
        .agg(
            F.count("*").alias("n_dups"),
            F.min("id").alias("canonical_id"),
        )
        .filter(F.col("n_dups") >= 2)
    )


def with_minhash(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach mh0..mh15 MinHash signature columns.

    The signature is computed in ONE Arrow-vectorized UDF call per batch —
    building it from 16 Column HOF trees instead makes Catalyst's
    projection collapse inline the (deep) shingle pipeline 16×, which
    explodes codegen time; the UDF is extracted into a single
    ArrowEvalPython node evaluated once.
    """
    sig = df.withColumn("_mhsig", minhash_sig_udf()(F.col(text_col)))
    return sig.select(
        "*",
        *[
            F.element_at(F.col("_mhsig"), j + 1).alias(f"mh{j}")
            for j in range(TH.N_MINHASH)
        ],
    ).drop("_mhsig")


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    jaccard_threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, verified by exact Jaccard.

    Output: (id_a, id_b, jaccard) with id_a < id_b, deduped across bands.

    Plan shape (100-TB discipline — the shuffles carry NO payload):

    1. ONE Arrow pass computes shingles + signature per document.
    2. Bands come from ``posexplode`` of the per-band signature array and
       carry ONLY (id, band, band_sig) — the shingle arrays never enter
       the band exchange (they used to dominate it: each document's full
       shingle set was shuffled once per band per side).
    3. Candidates dedupe on the narrow (id_a, id_b).
    4. Shingles are fetched by joining the surviving candidate ids back to
       the enriched table — a recompute of the map-side Arrow pass, which
       at scale is far cheaper than shuffling every shingle array 2×4
       bands wide (and with an Iceberg/persisted enriched table it is a
       plain column read).
    """
    enriched = df.select(
        F.col(id_col).alias("id"),
        shingles_and_sig_udf()(F.col(text_col)).alias("m"),
    ).select("id", F.col("m.sh").alias("shingles"), F.col("m.sig").alias("sig"))

    band_sigs = F.array(
        *[
            F.concat_ws(
                "-",
                *[
                    F.element_at(F.col("sig"), b * TH.LSH_ROWS + r + 1)
                    for r in range(TH.LSH_ROWS)
                ],
            )
            for b in range(TH.LSH_BANDS)
        ]
    )
    banded = enriched.select(
        "id", F.posexplode(band_sigs).alias("band", "band_sig")
    )

    left = banded.select("band", "band_sig", F.col("id").alias("id_a"))
    right = banded.select("band", "band_sig", F.col("id").alias("id_b"))
    cand = (
        left.join(right, ["band", "band_sig"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )

    sh_a = enriched.select(F.col("id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = enriched.select(F.col("id").alias("id_b"), F.col("shingles").alias("sh_b"))
    pairs = cand.join(sh_a, "id_a").join(sh_b, "id_b")

    inter = F.size(F.array_intersect(F.array_distinct("sh_a"), F.array_distinct("sh_b")))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        pairs.withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "jaccard")
    )


def with_simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, simhash) — 32-bit majority-vote fingerprint per document.

    One Arrow UDF call per batch (the 32 Column-HOF formulation in
    texthash.simhash_col is kept as the cross-checked reference but costs
    32 passes over the token array in codegen)."""
    return df.select(
        F.col(id_col).alias("id"),
        simhash_udf()(F.col(text_col)).alias("simhash"),
    )


def simhash_neardups(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Pairs at Hamming distance ≤ ``max_hamming``.

    Candidates via 4×8-bit band equi-join. By pigeonhole the 4 bands
    guarantee full recall only for Hamming ≤ 3 — hence the default.
    Passing a larger ``max_hamming`` widens the FILTER but keeps the same
    4-band candidate set, so recall beyond distance 3 is partial (a pair
    differing in ≥4 bits may hit all four bands and share none); callers
    wanting guaranteed radius r need ceil(32/(r+1))-bit bands.
    """
    sim = with_simhash(df, id_col, text_col)
    bands = None
    for b in range(4):
        part = sim.select(
            "id",
            "simhash",
            F.lit(b).alias("band"),
            F.shiftright(F.col("simhash"), b * 8).bitwiseAND(F.lit(0xFF)).alias("band_val"),
        )
        bands = part if bands is None else bands.unionAll(part)

    left = bands.select(
        "band", "band_val", F.col("id").alias("id_a"), F.col("simhash").alias("sh_a")
    )
    right = bands.select(
        "band", "band_val", F.col("id").alias("id_b"), F.col("simhash").alias("sh_b")
    )
    return (
        left.join(right, ["band", "band_val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", TH.hamming32_col(F.col("sh_a"), F.col("sh_b")))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    group_col: str | None = None,
    threshold: float = 0.1,
) -> DataFrame:
    """Exact 3-gram Jaccard for pairs within a blocking group.

    ``group_col`` bounds the pair space (block join); None falls back to the
    LSH candidate pairs. Output: (id_a, id_b, jaccard).
    """
    if group_col is None:
        return minhash_lsh_pairs(df, id_col, text_col, threshold)
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("id"),
        F.array_distinct(TH.shingles3_col(F.col(text_col))).alias("sh"),
    )
    left = base.select("grp", F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    right = base.select("grp", F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    inter = F.size(F.array_intersect("sh_a", "sh_b"))
    union = F.size(F.array_union("sh_a", "sh_b"))
    return (
        left.join(right, "grp")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn(
            "jaccard",
            F.when(union > 0, inter.cast("double") / union.cast("double")).otherwise(
                F.lit(0.0)
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
