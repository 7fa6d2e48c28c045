"""Deterministic distinct-count sketching: KMV (k-minimum-values).

At 100 TB, ``countDistinct`` on a high-cardinality key is a full shuffle
of every distinct value; a KMV sketch shrinks per-group state to the k
smallest hash values — mergeable, bounded, and (unlike HyperLogLog's
engine-specific registers) EXACTLY reproducible in any engine that has
md5, so the whole sketch is value-oracle-checkable in DuckDB.

Estimator: with h(x) = first 60 bits of md5(x) mapped onto [0, 2⁶⁰), the
k-th smallest of n distinct uniform hashes sits near k/n of the range, so
``n̂ = (k-1) · 2⁶⁰ / h_(k)`` (the classic unbiased KMV estimate; groups
with fewer than k distinct values are exact by construction). Standard
error ≈ 1/√(k−2).

60 bits, not 64: the value must survive a signed BIGINT in both engines
and DuckDB's hex fold (15 nibbles < 2⁶⁰ < 2⁶³).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import _hex_int_sql

__all__ = ["kmv_distinct", "kmv_distinct_sql", "kmv_hash"]

_RANGE = float(2**60)


def kmv_hash(col: Column) -> Column:
    """Portable 60-bit uniform hash: first 15 hex chars of md5(string)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from a k-minimum-values sketch.

    Output: group columns + ``n_kept`` (retained hashes, ≤ k), ``kth_hash``
    (the largest retained hash), ``est_distinct`` (the KMV estimate —
    exact when the group has < k distinct keys).

    Plan: distinct (group, hash) → per-group bottom-k via rank window →
    single aggregate. The window sorts only distinct hashes and the
    retained state is k rows per group — the same two-shuffle shape at any
    scale, with no unbounded collect_set.
    """
    h = kmv_hash(F.col(key_col)).alias("__h")
    hashed = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_RANGE) / F.col("kth_hash"))
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("__h").alias("kth_hash"),
        )
        .withColumn("est_distinct", F.round(est, 4))
    )


def kmv_distinct_sql(
    table: str,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` — same md5-derived hash, same
    bottom-k, same estimator arithmetic."""
    groups = ", ".join(group_cols)
    h = _hex_int_sql(f"substr(md5(CAST({key_col} AS VARCHAR)), 1, 15)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups}, {h} AS h FROM {table}
),
topk AS (
  SELECT * FROM hashed
  QUALIFY row_number() OVER (PARTITION BY {groups} ORDER BY h) <= {k}
),
sk AS (
  SELECT {groups}, count(*) AS n_kept, max(h) AS kth_hash
  FROM topk GROUP BY {groups}
)
SELECT {groups}, n_kept, kth_hash,
       round(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
             ELSE {float(k - 1)} * {_RANGE} / kth_hash END, 4) AS est_distinct
FROM sk
""".strip()
