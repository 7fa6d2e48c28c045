"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition a (narrow) input to cluster parallelism before per-row
    heavy compute (shingle explode, regex batteries, Arrow decode).

    A small table read from one Parquet file arrives as ONE partition —
    every downstream map runs on one core. The round-robin shuffle of the
    narrow input costs almost nothing and unlocks full parallelism for the
    expensive projection that follows. At 100 TB inputs arrive with
    thousands of splits and this is a no-op-sized safeguard, not a cost.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)


def bind_columns(df: DataFrame, **exprs: Column) -> DataFrame:
    """Append computed columns behind a PROJECTION BARRIER so downstream
    filters/projections reference them as plain attributes instead of
    re-inlining their defining expressions.

    ``df.withColumn("q", heavy).filter(F.col("q") > x)`` looks like it
    computes ``heavy`` once, but CollapseProject + filter pushdown inline
    the expression into every consumer — a filter over two scored columns
    evaluates both scores twice per row (measured ~2× on the regex-battery
    quality/language scores at sf0.1; worse when the expression lands
    inside a per-element lambda, where inlining turns O(dim) into
    O(dim²)). A Generate's input, by contrast, is evaluated exactly once
    per row and its outputs are attributes, so ``inline_outer`` over a
    one-element struct array is a zero-copy let-binding Catalyst cannot
    collapse away. Row counts are preserved (_outer: no emptiness filter).
    """
    return df.select(
        "*",
        F.inline_outer(
            F.array(F.struct(*[c.alias(n) for n, c in exprs.items()]))
        ),
    )
