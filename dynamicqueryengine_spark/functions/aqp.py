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

__all__ = [
    "approx_groupby",
    "approx_groupby_sql",
    "approx_groupby_stratified",
    "approx_groupby_stratified_sql",
]


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


def approx_groupby_stratified(
    df: DataFrame,
    id_col: str,
    value_col: str,
    strata_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.25,
) -> DataFrame:
    """Stratified AQP: per-stratum sampling rates (each ``1/k``), so rare
    strata keep tight error bounds without paying the common strata's
    scan — the BlinkDB stratified-sample move. A stratum sampled at
    ``1/k_s`` gets Horvitz-Thompson estimates with ITS ``k_s`` in every
    term; the output schema matches :func:`approx_groupby` with the
    stratum as the group. Unknown strata take ``default_fraction``.
    Same cross-engine determinism contract as the uniform variant."""
    ks = {s: _inv(f) for s, f in fractions.items()}
    k_default = _inv(default_fraction)
    frac_col = F.lit(default_fraction)
    k_col = F.lit(k_default)
    vm_col = F.lit(k_default * k_default - k_default)
    for s, f in fractions.items():
        cond = F.col(strata_col) == F.lit(s)
        frac_col = F.when(cond, F.lit(f)).otherwise(frac_col)
        k_col = F.when(cond, F.lit(ks[s])).otherwise(k_col)
        vm_col = F.when(
            cond, F.lit(ks[s] * ks[s] - ks[s])
        ).otherwise(vm_col)
    x = F.col(value_col).cast("decimal(18,6)")
    sampled = df.filter(hash_fraction(F.col(id_col)) < frac_col)
    agg = sampled.groupBy(strata_col).agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(x).alias("_sum"),
        F.sum(x * x).alias("_sumsq"),
        F.first(k_col).alias("_k"),  # constant within the stratum
        F.first(vm_col).alias("_vm"),
    )
    return agg.select(
        strata_col,
        F.col("_n").cast("long").alias("n_sampled"),
        (F.col("_n") * F.col("_k")).cast("long").alias("est_count"),
        (
            F.col("_sum").cast("decimal(32,6)")
            * F.col("_k").cast("decimal(5,0)")
        )
        .cast("double")
        .alias("est_sum"),
        F.round(
            F.sqrt(
                F.col("_n").cast("double") * F.col("_vm").cast("double")
            ),
            6,
        ).alias("se_count"),
        F.round(
            F.sqrt(
                F.col("_sumsq").cast("double") * F.col("_vm").cast("double")
            ),
            6,
        ).alias("se_sum"),
    )


def approx_groupby_stratified_sql(
    table: str,
    id_col: str,
    value_col: str,
    strata_col: str,
    fractions: "dict[str, float]",
    default_fraction: float = 0.25,
) -> str:
    """DuckDB mirror of :func:`approx_groupby_stratified`."""
    ks = {s: _inv(f) for s, f in fractions.items()}
    k_default = _inv(default_fraction)
    frac = _hex_fraction_sql(id_col)
    x = f"CAST({value_col} AS DECIMAL(18,6))"

    def case(expr_for):
        whens = " ".join(
            f"WHEN '{s}' THEN {expr_for(s)}" for s in fractions
        )
        return f"CASE {strata_col} {whens} ELSE {expr_for(None)} END"

    frac_case = case(
        lambda s: str(fractions[s]) if s else str(default_fraction)
    )
    k_case = case(lambda s: str(ks[s]) if s else str(k_default))
    vm_case = case(
        lambda s: str(ks[s] * ks[s] - ks[s])
        if s
        else str(k_default * k_default - k_default)
    )
    return f"""
WITH s AS (
  SELECT * FROM {table} WHERE {frac} < {frac_case}
),
a AS (
  SELECT {strata_col}, count(*) AS _n,
         sum({x}) AS _sum,
         sum({x} * {x}) AS _sumsq,
         max({k_case}) AS _k,
         max({vm_case}) AS _vm
  FROM s GROUP BY {strata_col}
)
SELECT {strata_col}, CAST(_n AS BIGINT) AS n_sampled,
       CAST(_n * _k AS BIGINT) AS est_count,
       CAST(CAST(_sum AS DECIMAL(32,6)) * CAST(_k AS DECIMAL(5,0))
            AS DOUBLE) AS est_sum,
       round(sqrt(CAST(_n AS DOUBLE) * CAST(_vm AS DOUBLE)), 6)
         AS se_count,
       round(sqrt(CAST(_sumsq AS DOUBLE) * CAST(_vm AS DOUBLE)), 6)
         AS se_sum
FROM a
""".strip()
