"""Text-analysis operators: language id, quality scoring, token counting,
document fingerprinting. All native Column expressions (JVM-side), each
with a DuckDB oracle twin built from the same constants."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from rio_color_spark.functions import texthash as TH


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + a BPE-ish subword estimate.

    ``bpe_est`` approximates subword count as ceil(chars_no_space / 4) —
    the usual ~4-chars-per-token heuristic, exact integer math.
    """
    toks = TH.tokens_col(F.col(text_col))
    chars_ns = F.length(F.regexp_replace(F.col(text_col), TH.WS_REGEX, ""))
    return df.withColumns(
        {
            "n_tokens": F.size(toks),
            "bpe_est": F.ceil(chars_ns.cast("double") / F.lit(4.0)).cast("long"),
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    return df.withColumn("lang_pred", TH.lang_id_col(F.col(text_col)))


def with_quality(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic quality features + composite score.

    - len_score  = least(n_tokens / 64, 1)
    - punct_ratio = punct chars / chars (0 for empty)
    - mean_tok_len = non-space chars / n_tokens
    - score = 0.5*len_score + 0.3*(1 - punct_ratio) + 0.2*least(mean_tok_len/8, 1)

    All rational arithmetic over integers — bit-identical across engines.
    """
    toks = TH.tokens_col(F.col(text_col))
    n_tok = F.size(toks)
    n_chars = F.length(F.col(text_col))
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[^\w\s]", ""))
    chars_ns = F.length(F.regexp_replace(F.col(text_col), TH.WS_REGEX, ""))

    len_score = F.least(n_tok.cast("double") / F.lit(64.0), F.lit(1.0))
    punct_ratio = F.when(
        n_chars > 0, n_punct.cast("double") / n_chars.cast("double")
    ).otherwise(F.lit(0.0))
    mean_tok_len = F.when(
        n_tok > 0, chars_ns.cast("double") / n_tok.cast("double")
    ).otherwise(F.lit(0.0))

    return df.withColumns(
        {
            "len_score": len_score,
            "punct_ratio": punct_ratio,
            "mean_tok_len": mean_tok_len,
            "quality_score": F.lit(0.5) * len_score
            + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
            + F.lit(0.2) * F.least(mean_tok_len / F.lit(8.0), F.lit(1.0)),
        }
    )


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalization-stable content fingerprint: md5 of lowercase text with
    whitespace runs collapsed to single spaces."""
    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), TH.WS_REGEX, " ")
    return df.withColumn("fingerprint", F.md5(norm.cast("binary")))
