"""Temporal join operators Spark lacks natively: as-of join and
point-in-interval range join.

The reference engine has no joins at all (SURVEY.md §2.5 — declared
absent), but a time-series/analytics engine at 100 TB needs both shapes,
and naive formulations (theta-joins) are quadratic. Each operator here is
a composition of built-in DataFrame ops that keeps the plan shuffle-
minimal and Catalyst-visible — no UDFs, no driver materialization.

As-of join (``asof_join``): the classic "latest right row at or before
each left row per key". A direct ``left.join(right, key & ts<=ts)`` is a
per-key cross product; instead we UNION the two sides (constant-width
tagged schema), hash-partition once by key, and carry the most recent
right payload forward with ``last(..., ignorenulls=True)`` over an
ever-growing row window. One shuffle, linear state, AQE-friendly — the
same plan a hand-written merge-join would produce, but expressed
declaratively so whole-stage codegen applies.

Range join (``range_join``): match fact timestamps to intervals.
``strategy="broadcast"`` nested-loop-joins a broadcast interval table
(right answer when intervals are few: dashboards, incident windows).
``strategy="bucket"`` quantizes time into buckets, explodes each interval
into the buckets it covers, equi-joins on bucket, then refines with the
exact predicate — turning a theta join into a shuffle-bounded equi-join;
right answer when both sides are large. A fact's single bucket meets each
interval at most once, so no post-join dedup is needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["asof_join", "range_join", "choose_join_strategy"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_payload: list[str] | None = None,
    right_tiebreak: str | None = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts <= left_ts`` within the same ``on`` key (left outer: rows
    with no prior right row keep NULL payload).

    Ties on ``right_ts`` resolve to the greatest ``right_tiebreak`` value
    (pass a unique column for determinism). Implementation: tagged union +
    one window per key ordered by (ts, side, tiebreak); right rows sort
    before left rows at equal ts so "at or before" includes exact ties.
    """
    from pyspark.sql import Window

    right_payload = list(right_payload or right.columns)
    tagged_cols = [f"{c}{suffix}" for c in right_payload]

    l_tag = left.select(
        *[F.col(c) for c in left.columns],
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(t)
          for c, t in zip(right_payload, tagged_cols)],
    )
    tie = (
        F.col(right_tiebreak).cast("long")
        if right_tiebreak is not None
        else F.lit(0).cast("long")
    )
    r_tag = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          if c not in on
          else F.col(c)
          for c in left.columns],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        *[F.col(c).alias(t) for c, t in zip(right_payload, tagged_cols)],
    )

    w = (
        Window.partitionBy(*on)
        .orderBy("__ts", "__side", "__tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = l_tag.unionByName(r_tag).select(
        *left.columns,
        F.col("__side").alias("__side"),
        *[F.last(t, ignorenulls=True).over(w).alias(t) for t in tagged_cols],
    )
    return carried.filter(F.col("__side") == 1).drop("__side")


def _bucket(col: Column, bucket_seconds: int) -> Column:
    return F.floor(F.unix_micros(col) / F.lit(bucket_seconds * 1_000_000))


def range_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    strategy: str = "bucket",
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Join fact rows to every interval with ``start <= ts < end``
    (half-open). Returns facts ⋈ intervals (inner).

    ``strategy="broadcast"``: broadcast nested-loop — optimal when the
    interval table is small (it is replicated to every task; the fact scan
    never shuffles). ``strategy="bucket"``: both sides get time-bucket
    keys (intervals explode to every covered bucket), the join becomes an
    equi-join on bucket + exact refinement — scales to large interval
    tables at the cost of one shuffle; pick ``bucket_seconds`` near the
    median interval width so the explode factor stays small.
    """
    exact = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    if strategy == "broadcast":
        return facts.join(F.broadcast(intervals), exact)
    if strategy != "bucket":
        raise ValueError(f"unknown range_join strategy: {strategy!r}")
    f_b = facts.withColumn("__b", _bucket(F.col(ts_col), bucket_seconds))
    # end is exclusive: the last covered bucket is the one holding end-1µs.
    i_b = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                _bucket(F.col(start_col), bucket_seconds),
                _bucket(
                    F.timestamp_micros(F.unix_micros(F.col(end_col)) - 1),
                    bucket_seconds,
                ),
            )
        ),
    )
    return f_b.join(i_b, ["__b"]).filter(exact).drop("__b")


def choose_join_strategy(
    left_stats: dict,
    right_stats: dict,
    on: "list[str]",
    broadcast_bytes: int = 32 * 1024 * 1024,
    skew_share: float = 0.2,
    buckets: int = 16,
) -> dict:
    """Cost-based join-strategy choice from table statistics dicts (the
    shape sources/versioned.py's ``vt_table_stats`` produces: ``bytes``,
    ``rows``, optional ``analyze.columns[col].{ndv,nulls,mcv_count}``).
    Pure metadata — callable with no Spark session, unit-testable with
    hand-built stats.

    Rules, in order (the same ladder Catalyst's JoinSelection walks, but
    driven by OUR manifest stats, which Catalyst cannot see behind a
    plain parquet read):

    1. **broadcast** — the smaller side's bytes ≤ ``broadcast_bytes``:
       build side = smaller side; no shuffle of the big side.
    2. **salted** — no broadcast fit, and the BIGGER side's first join
       key has a recorded most-common-value share ≥ ``skew_share``
       (``mcv_count / (rows - nulls)`` from its latest ANALYZE; stale
       stats still count — skew is a property of the domain, not the
       snapshot): salt the big (probe) side, replicate the small side
       ``buckets`` ways.
    3. **shuffle** — otherwise: plain shuffle join, AQE handles runtime
       skew/size surprises.

    Returns ``{"strategy", "build_side"/"probe_side", "left_bytes",
    "right_bytes", "skew_share"}`` for audit."""
    lb, rb = int(left_stats.get("bytes") or 0), int(right_stats.get("bytes") or 0)
    out = {"left_bytes": lb, "right_bytes": rb, "skew_share": None}
    small_side = "left" if lb <= rb else "right"
    small_bytes = min(lb, rb)
    if small_bytes <= broadcast_bytes:
        out.update(strategy="broadcast", build_side=small_side)
        return out
    probe_side = "right" if small_side == "left" else "left"
    probe = left_stats if probe_side == "left" else right_stats
    key = on[0] if on else None
    cstats = ((probe.get("analyze") or {}).get("columns") or {}).get(key)
    arows = (probe.get("analyze") or {}).get("rows")
    if cstats and arows and "mcv_count" in cstats:
        nonnull = max(int(arows) - int(cstats.get("nulls", 0)), 1)
        share = cstats["mcv_count"] / nonnull
        out["skew_share"] = share
        if share >= skew_share:
            out.update(
                strategy="salted", probe_side=probe_side, buckets=buckets
            )
            return out
    out.update(strategy="shuffle", probe_side=probe_side)
    return out
