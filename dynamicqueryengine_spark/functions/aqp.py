"""Approximate query processing: sample-based aggregates with error
bounds (BlinkDB / Quickr pattern; beyond-reference — the reference has
no aggregates beyond argmin/argmax/count, SURVEY.md §2.3).

At 100 TB an exploratory GROUP BY over the full table is a full scan;
a deterministic ~1% Bernoulli sample answers the same question 100×
cheaper with quantified error. Estimators are Horvitz-Thompson under
hash-Bernoulli sampling with inclusion probability ``p = 1/k``:

* ``est_count = n_s · k`` (unbiased for the group's population count)
* ``est_sum   = sum_s · k`` (unbiased for the group's population sum)
* ``se_sum    = sqrt( sumsq_s · (k² − k) )`` — the HT variance
  estimator ``Σ_{i∈s} x_i²(1−p)/p²`` with ``(1−p)/p² = k² − k``; a 95%
  CI is ``est_sum ± 1.96·se_sum``. ``se_count`` is the x=1 special
  case ``sqrt(n_s · (k² − k))``.

Cross-engine determinism is engineered, not assumed: the sample is the
portable md5 hash-fraction cut from functions/sampling.py (any engine,
any rerun selects identical rows); ``p`` is restricted to ``1/k`` for
integer ``k``; every decimal product is sized so NEITHER engine adjusts
the result scale (Spark silently rounds when ideal precision exceeds
38 — so ``x`` is ``decimal(18,6)``, making ``x·x`` an exact (37,12),
and ``est_sum`` multiplies a (32,6) sum by a (5,0) k into an exact
(38,6)); the variance terms convert ONE exact decimal to double and do
the remaining arithmetic in IEEE doubles, identical in both engines.
The whole estimate, error bounds included, value-oracles against
DuckDB after round(…, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .sampling import _hex_fraction_sql, hash_fraction

__all__ = ["approx_groupby", "approx_groupby_sql"]


def _inv(fraction: float) -> int:
    k = round(1.0 / fraction)
    if k < 1 or abs(k * fraction - 1.0) > 1e-9:
        raise ValueError(
            f"fraction must be 1/k for integer k, got {fraction!r} "
            "(keeps every estimator step cross-engine exact)"
        )
    return k


def approx_groupby(
    df: DataFrame,
    id_col: str,
    value_col: str,
    group_cols: list[str],
    fraction: float,
) -> DataFrame:
    """Approximate per-group COUNT and SUM(value) from a deterministic
    ``fraction = 1/k`` Bernoulli sample, with standard errors. One scan
    of the SAMPLE (the hash-cut filter prunes at the source); groups
    with no sampled row are simply absent — the honest answer of a
    sample-based estimator, not a bug."""
    k = _inv(fraction)
    var_mult = k * k - k  # (1-p)/p² for p = 1/k, exact in a double
    x = F.col(value_col).cast("decimal(18,6)")
    sampled = df.filter(hash_fraction(F.col(id_col)) < F.lit(fraction))
    agg = sampled.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sum"),  # exact decimal(28,6)
        F.sum(x * x).alias("_sumsq"),  # (37,12) products, exact sum
    )
    return agg.select(
        *group_cols,
        F.col("_n").cast("long").alias("n_sampled"),
        (F.col("_n") * F.lit(k)).cast("long").alias("est_count"),
        # (32,6) × (5,0) → exact (38,6) in Spark AND DuckDB: no engine
        # hits its precision cap, so no hidden scale adjustment/rounding
        (
            F.col("_sum").cast("decimal(32,6)")
            * F.lit(k).cast("decimal(5,0)")
        )
        .cast("double")
        .alias("est_sum"),
        F.round(
            F.sqrt(F.col("_n").cast("double") * F.lit(float(var_mult))), 6
        ).alias("se_count"),
        F.round(
            F.sqrt(
                F.col("_sumsq").cast("double") * F.lit(float(var_mult))
            ),
            6,
        ).alias("se_sum"),
    )


def approx_groupby_sql(
    table: str,
    id_col: str,
    value_col: str,
    group_cols: list[str],
    fraction: float,
) -> str:
    """DuckDB mirror: same hash cut, same exact-decimal accumulation and
    product widths, same double arithmetic for the variance terms."""
    k = _inv(fraction)
    vm = k * k - k
    keys = ", ".join(group_cols)
    frac = _hex_fraction_sql(id_col)
    x = f"CAST({value_col} AS DECIMAL(18,6))"
    return f"""
WITH s AS (
  SELECT * FROM {table} WHERE {frac} < {fraction}
),
a AS (
  SELECT {keys}, count(*) AS _n,
         sum({x}) AS _sum,
         sum({x} * {x}) AS _sumsq
  FROM s GROUP BY {keys}
)
SELECT {keys}, CAST(_n AS BIGINT) AS n_sampled,
       CAST(_n * {k} AS BIGINT) AS est_count,
       CAST(CAST(_sum AS DECIMAL(32,6)) * CAST({k} AS DECIMAL(5,0))
            AS DOUBLE) AS est_sum,
       round(sqrt(CAST(_n AS DOUBLE) * {vm}), 6) AS se_count,
       round(sqrt(CAST(_sumsq AS DOUBLE) * {vm}), 6) AS se_sum
FROM a
""".strip()
