"""Exact grouped quantiles — nearest-rank percentiles of a numeric column
per group, the corpus-stats primitive behind "p50/p95 document length per
source" dashboards and length-filter threshold tuning.

Definition: the p-quantile of n sorted values is the value at rank
``ceil(p·n)`` (1-based) — the classic nearest-rank percentile. Chosen over
interpolated definitions deliberately: the result is always an actual data
value selected by integer arithmetic, so Spark and any oracle agree
bit-for-bit with no interpolation-rounding escape hatch.

Scale shape (100 TB): one window sort per group — the irreducible cost of
EXACT quantiles (selection requires a total order per group). Groups
parallelize across the cluster; a single pathological group degrades to
that group's sort, which is the honest bound of exactness. When error
tolerance is acceptable at scale, ``F.percentile_approx`` (t-digest-style
bounded state, no sort) is the production path; this operator is the
exact reference that verifies it.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

__all__ = [
    "group_quantiles",
    "group_quantiles_approx_check",
    "group_quantiles_approx_check_sql",
    "group_quantiles_sql",
]

DEFAULT_PS = (0.25, 0.5, 0.75, 0.9, 0.99)


def group_quantiles(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ps: Sequence[float] = DEFAULT_PS,
) -> DataFrame:
    """(group, p, quantile, n) — one row per group per requested p.

    Ties in the value order break on nothing: rank is assigned by value
    alone via ``row_number`` over (value asc), which is deterministic for
    the SELECTED value even when equal values straddle the rank (any of
    the tied rows yields the same value).

    NULL values are excluded before ranking: a NULL is not a data value, so
    it must neither occupy a rank nor inflate ``n`` — and engines disagree
    on NULL sort placement (Spark ASC = NULLS FIRST, DuckDB default = NULLS
    LAST), so admitting them would silently break cross-engine parity.
    """
    w = Window.partitionBy(group_col).orderBy(F.col(value_col).asc())
    ranked = df.select(group_col, value_col).filter(
        F.col(value_col).isNotNull()
    ).withColumn(
        "_rn", F.row_number().over(w)
    ).withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(group_col)))
    picks = F.array(
        *[
            F.struct(
                F.lit(float(p)).alias("p"),
                F.ceil(F.lit(float(p)) * F.col("_n")).cast("long").alias("_r"),
            )
            for p in ps
        ]
    )
    return (
        ranked.select(
            group_col,
            F.col(value_col).alias("quantile"),
            "_rn",
            "_n",
            F.explode(picks).alias("pk"),
        )
        .filter(F.col("_rn") == F.col("pk._r"))
        .select(
            group_col,
            F.col("pk.p").alias("p"),
            "quantile",
            F.col("_n").alias("n"),
        )
    )


def group_quantiles_approx_check(
    df: DataFrame,
    value_col: str,
    group_col: str,
    ps: Sequence[float] = DEFAULT_PS,
    accuracy: int = 100,
) -> DataFrame:
    """The APPROXIMATE-quantile scale path, run for real and checked
    against its own guarantee: (group, p, quantile, n, approx_ok).

    ``quantile``/``n`` are the exact nearest-rank values (value-oracled in
    SQL); ``approx_ok`` verifies Spark's ``percentile_approx`` output — a
    Greenwald-Khanna sketch with bounded state and rank error ≤ n/accuracy
    — by computing the true rank interval of the value it returned and
    asserting it overlaps [p·n − ε·n, p·n + ε·n], ε = 1/accuracy. The
    sketch value itself is engine-specific (DuckDB has no GK twin), so the
    ORACLE pins the guarantee (``approx_ok = TRUE``): if the approximate
    path ever returned a value outside its error bound, the hash check
    would go red.

    Scale shape: the production path is the ``percentile_approx``
    aggregate alone — bounded O(accuracy) state per group, map-side
    combined, NO per-group sort. The rank-interval verification join
    (per-group value histogram) is the verification harness, same
    cost-positioning as the exact side of cms_topk_estimates.
    """
    src = (
        df.select(group_col, value_col)
        .filter(F.col(value_col).isNotNull())
        .persist()
    )
    src.count()
    exact = group_quantiles(src, value_col, group_col, ps)
    approx = src.groupBy(group_col).agg(
        F.percentile_approx(
            F.col(value_col), [float(p) for p in ps], accuracy
        ).alias("_aq")
    )
    pairs = approx.select(
        group_col,
        F.posexplode("_aq").alias("_i", "_av"),
    ).select(
        group_col,
        F.element_at(
            F.array(*[F.lit(float(p)) for p in ps]), F.col("_i") + 1
        ).alias("p"),
        "_av",
    )
    hist = src.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    bounds = (
        pairs.join(hist, group_col)
        .groupBy(group_col, "p", "_av")
        .agg(
            F.sum(F.when(F.col(value_col) < F.col("_av"), F.col("_c")).otherwise(0)).alias("_rlo"),
            F.sum(F.when(F.col(value_col) <= F.col("_av"), F.col("_c")).otherwise(0)).alias("_rhi"),
        )
    )
    target = F.ceil(F.col("p") * F.col("n"))
    eps_n = F.greatest(F.lit(1), F.ceil(F.col("n") / F.lit(int(accuracy))))
    ok = (
        (F.col("_rhi") > F.col("_rlo"))  # returned value actually occurs
        & (F.col("_rhi") >= target - eps_n)
        & (F.col("_rlo") + 1 <= target + eps_n)
    )
    return (
        exact.join(bounds, [group_col, "p"])
        .select(
            group_col,
            "p",
            "quantile",
            "n",
            ok.alias("approx_ok"),
        )
    )


def group_quantiles_approx_check_sql(
    inner_sql: str,
    value_col: str,
    group_col: str,
    ps: Sequence[float] = DEFAULT_PS,
) -> str:
    """DuckDB mirror: the exact columns come from the identical rank
    arithmetic; ``approx_ok`` is the GK guarantee itself (TRUE) — see
    :func:`group_quantiles_approx_check` for why the sketch value is not
    directly comparable across engines."""
    base = group_quantiles_sql(inner_sql, value_col, group_col, ps)
    return f"SELECT *, TRUE AS approx_ok FROM ({base})"


def group_quantiles_sql(
    inner_sql: str,
    value_col: str,
    group_col: str,
    ps: Sequence[float] = DEFAULT_PS,
) -> str:
    """DuckDB mirror — identical rank arithmetic over ``inner_sql``
    (a query producing at least (group_col, value_col))."""
    ps_rows = " UNION ALL ".join(f"SELECT CAST({float(p)} AS DOUBLE) AS p" for p in ps)
    return f"""
WITH src AS ({inner_sql}),
ranked AS (
  SELECT {group_col}, {value_col},
         row_number() OVER (PARTITION BY {group_col}
                            ORDER BY {value_col} ASC) AS rn,
         CAST(count(*) OVER (PARTITION BY {group_col}) AS BIGINT) AS n
  FROM src
  WHERE {value_col} IS NOT NULL
),
ps AS ({ps_rows})
SELECT r.{group_col}, ps.p, r.{value_col} AS quantile, r.n
FROM ranked r JOIN ps ON r.rn = CAST(ceil(ps.p * r.n) AS BIGINT)
""".strip()
