"""Model-based quality filtering: a linear classifier over engineered text
features — the plumbing behind fastText-style pretraining-data filters
(CCNet / GPT-3's quality classifier), where a trained model scores every
document and the pipeline keeps the high-margin ones.

The weights here stand in for a trained model's; swapping in real
coefficients is a literal change, not a code change. What matters for the
engine is the EXECUTION shape: every feature is a pure Column expression
(JVM-side, whole-stage codegen, no UDFs), the margin is a fixed
left-to-right chain of IEEE double multiply-adds — bit-identical across
engines, so the classification is value-oracle-checkable — and scoring is
a scan-time projection: zero shuffles at any corpus size.

The decision value is the raw margin (w·x + b), NOT a sigmoid: sigmoid
needs exp(), whose last-ulp rounding is engine-specific, and it is
monotone in the margin anyway — thresholding the margin at 0 IS
thresholding the probability at 0.5, with none of the transcendental
parity risk.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import (
    alpha_ratio,
    alpha_ratio_sql,
    punct_ratio,
    punct_ratio_sql,
    stopword_ratio,
    stopword_ratio_sql,
    token_count_ws,
    token_count_ws_sql,
)

__all__ = [
    "quality_margin",
    "classify_quality",
    "classify_quality_sql",
    "curriculum_buckets",
    "curriculum_buckets_sql",
]

# (name, weight) — stand-in coefficients for a trained linear model; the
# SQL mirror bakes the same literals, so both engines run the identical
# multiply-add chain in the identical order.
WEIGHTS: list[tuple[str, float]] = [
    ("alpha_ratio", 2.0),
    ("stopword_ratio", 3.0),
    ("punct_ratio", -4.0),
    ("log_length", 0.25),
]
BIAS = -1.5


def _features(col: Column) -> dict[str, Column]:
    # log_length via the token count's bit length — an integer, engine-
    # independent proxy for log2(length) (floor(log2(n))+1), avoiding ln()
    tok = token_count_ws(col)
    return {
        "alpha_ratio": alpha_ratio(col),
        "stopword_ratio": stopword_ratio(col),
        "punct_ratio": punct_ratio(col),
        "log_length": F.bit_length(F.conv(tok.cast("string"), 10, 2)).cast(
            "double"
        )
        / F.lit(8.0),
    }


def _features_sql(expr: str) -> dict[str, str]:
    return {
        "alpha_ratio": alpha_ratio_sql(expr),
        "stopword_ratio": stopword_ratio_sql(expr),
        "punct_ratio": punct_ratio_sql(expr),
        "log_length": (
            f"CAST(bit_length(bin(CAST({token_count_ws_sql(expr)} AS BIGINT)))"
            f" AS DOUBLE) / 8.0"
        ),
    }


def quality_margin(col: Column) -> Column:
    """w·x + b as a strict left-to-right multiply-add chain."""
    feats = _features(col)
    margin = F.lit(float(BIAS))
    for name, w in WEIGHTS:
        margin = margin + F.lit(float(w)) * feats[name]
    return margin


def classify_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, margin, keep) per document; keep = margin ≥ 0 (p ≥ 0.5)."""
    m = quality_margin(F.col(text_col))
    return df.select(
        F.col(id_col),
        m.alias("margin"),
        (m >= F.lit(0.0)).alias("keep"),
    )


def classify_quality_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB mirror: identical literals, identical chain order."""
    feats = _features_sql(text_col)
    margin = f"{float(BIAS)!r}"
    for name, w in WEIGHTS:
        margin = f"({margin} + {float(w)!r} * {feats[name]})"
    return (
        f"SELECT {id_col}, {margin} AS margin, "
        f"{margin} >= 0.0 AS keep FROM {table}"
    )


def curriculum_buckets(
    df: DataFrame,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, stratum, margin, bucket 1-4): difficulty quartiles per stratum
    for curriculum ordering (easy→hard schedules, quality-tiered mixing).

    NOT ntile(): ranking a stratum forces its global sort into one task.
    Instead, per-stratum exact quartile CUTS (one aggregate; Spark's exact
    ``percentile`` and DuckDB's ``quantile_cont`` share the (n−1)·p
    interpolation, so the cuts agree bit-for-bit) are broadcast back and
    the bucket is three comparisons at scan time — no sort at any scale.
    Ties sharing a cut value land in the same bucket (the semantically
    right call for equal difficulty; ntile would split them arbitrarily)."""
    m = quality_margin(F.col(text_col))
    scored = df.select(
        F.col(id_col), F.col(stratum_col), m.alias("margin")
    )
    cuts = scored.groupBy(stratum_col).agg(
        F.percentile("margin", F.lit(0.25)).alias("_q1"),
        F.percentile("margin", F.lit(0.50)).alias("_q2"),
        F.percentile("margin", F.lit(0.75)).alias("_q3"),
    )
    bucket = (
        F.lit(1)
        + (F.col("margin") > F.col("_q1")).cast("int")
        + (F.col("margin") > F.col("_q2")).cast("int")
        + (F.col("margin") > F.col("_q3")).cast("int")
    )
    return scored.join(F.broadcast(cuts), stratum_col).select(
        id_col, stratum_col, "margin", bucket.alias("bucket")
    )


def curriculum_buckets_sql(
    table: str,
    stratum_col: str = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror: quantile_cont cuts + identical comparisons."""
    feats = _features_sql(text_col)
    margin = f"{float(BIAS)!r}"
    for name, w in WEIGHTS:
        margin = f"({margin} + {float(w)!r} * {feats[name]})"
    return f"""
WITH scored AS (
  SELECT {id_col}, {stratum_col}, {margin} AS margin FROM {table}
),
cuts AS (
  SELECT {stratum_col},
         quantile_cont(margin, 0.25) AS q1,
         quantile_cont(margin, 0.50) AS q2,
         quantile_cont(margin, 0.75) AS q3
  FROM scored GROUP BY {stratum_col}
)
SELECT s.{id_col}, s.{stratum_col}, s.margin,
       1 + CAST(s.margin > c.q1 AS INT) + CAST(s.margin > c.q2 AS INT)
         + CAST(s.margin > c.q3 AS INT) AS bucket
FROM scored s JOIN cuts c USING ({stratum_col})
""".strip()
