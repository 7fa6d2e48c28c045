"""ANALYZE-style column profiler: one row per column with row/null/
distinct counts — the first thing run against any new 100 TB table
(schema sanity, join-key cardinality, null audits) and the statistics
sources feed cost-based decisions from.

Plan shape: ONE aggregation pass over the table computes every
column's count / exact count-distinct together (Catalyst plans
multi-distinct aggregates through a single Expand — one scan, one
shuffle bounded by |columns| × partial state), then a ``stack`` unpivot
to the per-column long form. No per-column rescan, no driver loop.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["profile_table", "profile_table_sql"]


def profile_table(
    df: DataFrame, dtypes: Mapping[str, str] | None = None
) -> DataFrame:
    """(col_name, dtype, n_rows, n_nulls, n_distinct, null_frac) per
    column. ``dtypes`` overrides the reported type labels (pass a shared
    label map when comparing against another engine); defaults to
    Spark's simple strings."""
    cols = df.columns
    labels = dict(df.dtypes)
    if dtypes:
        labels.update(dtypes)
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"_nn_{c}"))
        aggs.append(F.countDistinct(F.col(c)).alias(f"_nd_{c}"))
    row = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', _nn_{c}, _nd_{c}" for c in cols)
    long = row.select(
        "_n",
        F.expr(
            f"stack({len(cols)}, {stack_args})"
            " AS (col_name, _nonnull, n_distinct)"
        ),
    )
    dtype = F.lit(None).cast("string")
    for c in reversed(cols):
        dtype = F.when(F.col("col_name") == c, F.lit(labels[c])).otherwise(
            dtype
        )
    return long.select(
        "col_name",
        dtype.alias("dtype"),
        F.col("_n").alias("n_rows"),
        (F.col("_n") - F.col("_nonnull")).alias("n_nulls"),
        "n_distinct",
        (
            (F.col("_n") - F.col("_nonnull")).cast("double")
            / F.col("_n").cast("double")
        ).alias("null_frac"),
    )


def profile_table_sql(table: str, cols: Sequence[tuple[str, str]]) -> str:
    """DuckDB mirror of :func:`profile_table` for the given
    (column, dtype-label) pairs — one aggregation CTE, per-column scalar
    projections UNION ALLed."""
    aggs = ["count(*) AS n"]
    for c, _ in cols:
        aggs.append(f"count({c}) AS nn_{c}")
        aggs.append(f"count(DISTINCT {c}) AS nd_{c}")
    selects = [
        f"""SELECT '{c}' AS col_name, '{label}' AS dtype,
       n AS n_rows, n - nn_{c} AS n_nulls, nd_{c} AS n_distinct,
       CAST(n - nn_{c} AS DOUBLE) / CAST(n AS DOUBLE) AS null_frac
FROM agg"""
        for c, label in cols
    ]
    body = "\nUNION ALL\n".join(selects)
    return f"WITH agg AS (SELECT {', '.join(aggs)} FROM {table})\n{body}"
