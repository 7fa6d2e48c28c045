"""Skew-handling utilities for hot-key workloads at scale.

Spark already gives two layers of skew protection: map-side partial
aggregation (hot groups collapse per-partition before the shuffle) and AQE
skew-join splitting (enabled in session.py). The utilities here cover the
cases those don't:

* :func:`count_distinct_unskewed` — ``countDistinct`` keeps a per-group
  hash set in the aggregation buffer; a hot key concentrates that whole set
  on one task. The two-shuffle reformulation (dedupe on (keys, value) —
  uniform hash distribution — then count) bounds every task's state.
* :func:`salted_collect_set` — same problem for ``collect_set``-style
  holistic aggregates: pre-aggregate per (keys, salt) so no single task
  materializes a hot key's full set, then merge the ≤ ``salt`` partials.
* :func:`with_salt` — deterministic salt column for manual two-phase
  patterns (hash of the value column, NOT random — keeps runs reproducible
  and co-locates equal values, which set-union semantics require).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def with_salt(df: DataFrame, salt_col: str, source_col: str, buckets: int = 16) -> DataFrame:
    """Deterministic salt in [0, buckets): hash of ``source_col``."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(F.col(source_col)), F.lit(buckets))
    )


def count_distinct_unskewed(
    df: DataFrame, keys: Sequence[str], value_col: str, out_col: str = "n_distinct"
) -> DataFrame:
    """Skew-safe COUNT(DISTINCT value) GROUP BY keys.

    Phase 1 shuffles on (keys, value) — uniformly distributed even when one
    key dominates; phase 2 counts tiny deduped rows per key. Exactly
    equivalent to ``groupBy(keys).agg(countDistinct(value))`` — including a
    0-count row for groups whose values are all NULL — with bounded
    per-task state."""
    deduped = (
        df.select(*keys, value_col).where(F.col(value_col).isNotNull()).distinct()
    )
    counts = deduped.groupBy(*keys).agg(F.count(F.lit(1)).alias(out_col))
    all_groups = df.select(*keys).distinct()
    # groupBy treats NULL as a regular grouping value, so the join back must
    # be null-safe — a plain equi-join would drop NULL-keyed groups to the
    # fillna default instead of their true count
    cond = None
    for k in keys:
        c = all_groups[k].eqNullSafe(counts[k])
        cond = c if cond is None else cond & c
    return all_groups.join(counts, cond, "left").select(
        *[all_groups[k] for k in keys],
        F.coalesce(counts[out_col], F.lit(0)).alias(out_col),
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    buckets: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join for when BOTH sides are too big to broadcast and
    the join key is hot (a handful of values carrying most rows — the case
    AQE's skew splitting mitigates per-partition but a 1000-executor
    shuffle still funnels each hot key through one reducer).

    The big side gets a deterministic salt in [0, buckets) — hashed from
    ``salt_source`` (any high-cardinality column; defaults to ALL non-key
    columns) so a hot key's rows spread across ``buckets`` reducers — and
    the small side is replicated once per salt value. Joining on
    (keys, salt) is then row-for-row identical to the plain join for
    ``inner``/``left`` joins, with per-reducer work bounded by
     1/``buckets`` of the hottest key."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    on = list(on)
    if salt_source is not None:
        salt_cols = [F.col(salt_source)]
    else:
        salt_cols = [F.col(c) for c in big.columns if c not in on] or [
            F.col(on[0])
        ]
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(*salt_cols), F.lit(buckets)).cast("int")
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)]))
    )
    return salted_big.join(replicated, on + ["_salt"], how).drop("_salt")


def salted_collect_set(
    df: DataFrame,
    keys: Sequence[str],
    value_col: str,
    buckets: int = 16,
    out_col: str = "values",
) -> DataFrame:
    """Skew-safe collect_set: partial sets per (keys, salt) — each at most
    the salt-bucket's share of a hot key — then a flatten+distinct merge of
    ≤ ``buckets`` partial arrays per key."""
    salted = with_salt(df, "_salt", value_col, buckets)
    partial = salted.groupBy(*keys, "_salt").agg(
        F.collect_set(value_col).alias("_partial")
    )
    return partial.groupBy(*keys).agg(
        F.array_distinct(F.flatten(F.collect_list("_partial"))).alias(out_col)
    )
