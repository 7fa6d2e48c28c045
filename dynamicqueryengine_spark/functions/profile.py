"""ANALYZE-style column profiler: one row per column with row/null/
distinct counts — the first thing run against any new 100 TB table
(schema sanity, join-key cardinality, null audits) and the statistics
sources feed cost-based decisions from.

Plan shape: ONE aggregation pass over the table computes every
column's count / exact count-distinct together (Catalyst plans
multi-distinct aggregates through a single Expand — one scan, one
shuffle bounded by |columns| × partial state), then an array-of-structs
explode to the per-column long form. No per-column rescan, no driver
loop — and no string-built expressions: internal aliases are
positional (``_nn_0``…) and display names travel as literals, so
column names containing spaces, quotes, or other specials profile
correctly (the SQL mirror double-quotes identifiers and doubles
embedded quotes for the same reason).
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
    for i, c in enumerate(cols):
        aggs.append(F.count(df[c]).alias(f"_nn_{i}"))
        aggs.append(F.countDistinct(df[c]).alias(f"_nd_{i}"))
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.lit(labels[c]).alias("dtype"),
                F.col(f"_nn_{i}").alias("_nonnull"),
                F.col(f"_nd_{i}").alias("n_distinct"),
            )
            for i, c in enumerate(cols)
        ]
    )
    long = row.select("_n", F.explode(entries).alias("e"))
    nulls = F.col("_n") - F.col("e._nonnull")
    return long.select(
        F.col("e.col_name").alias("col_name"),
        F.col("e.dtype").alias("dtype"),
        F.col("_n").alias("n_rows"),
        nulls.alias("n_nulls"),
        F.col("e.n_distinct").alias("n_distinct"),
        (nulls.cast("double") / F.col("_n").cast("double")).alias(
            "null_frac"
        ),
    )


def profile_table_sql(table: str, cols: Sequence[tuple[str, str]]) -> str:
    """DuckDB mirror of :func:`profile_table` for the given
    (column, dtype-label) pairs — one aggregation CTE, per-column scalar
    projections UNION ALLed. Identifiers are double-quoted (embedded
    ``"`` doubled) and labels single-quote-escaped, so arbitrary column
    names generate valid SQL."""

    def _ident(c: str) -> str:
        return '"' + c.replace('"', '""') + '"'

    def _lit(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    aggs = ["count(*) AS n"]
    for i, (c, _) in enumerate(cols):
        aggs.append(f"count({_ident(c)}) AS nn_{i}")
        aggs.append(f"count(DISTINCT {_ident(c)}) AS nd_{i}")
    selects = [
        f"""SELECT {_lit(c)} AS col_name, {_lit(label)} AS dtype,
       n AS n_rows, n - nn_{i} AS n_nulls, nd_{i} AS n_distinct,
       CAST(n - nn_{i} AS DOUBLE) / CAST(n AS DOUBLE) AS null_frac
FROM agg"""
        for i, (c, label) in enumerate(cols)
    ]
    body = "\nUNION ALL\n".join(selects)
    return f"WITH agg AS (SELECT {', '.join(aggs)} FROM {table})\n{body}"
