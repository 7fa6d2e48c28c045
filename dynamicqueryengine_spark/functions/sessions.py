"""Gap-based sessionization — event-stream analytics operator
(SURVEY.md §7 Phase 4; absent in the reference, which has no
window/streaming surface at all — SURVEY.md §2.5).

Batch formulation: classic lag+cumulative-sum — a new session starts when
the gap to the previous event of the same user exceeds ``gap``; the session
index is the running count of session starts. Pure window functions, one
shuffle keyed by user, microsecond-exact gap arithmetic (``unix_micros`` /
``epoch_us`` in the SQL mirror — no truncation mismatch between engines).

The streaming twin (streaming/sessionize.py) implements the same semantics
incrementally with ``applyInPandasWithState``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def sessionize(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event session assignment: (user, ts, session_idx)."""
    gap_us = gap_seconds * 1_000_000
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col).asc())
    prev_us = F.lag(F.unix_micros(F.col(ts_col))).over(w)
    new_session = F.when(
        prev_us.isNull() | (F.unix_micros(F.col(ts_col)) - prev_us > gap_us),
        F.lit(1),
    ).otherwise(F.lit(0))
    return events.withColumn(
        "session_idx",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """One row per session: bounds, event count, value sum.

    ``sum_value`` aggregates through DECIMAL(38,9) so the summation is
    exact and order-independent — plain ``sum(double)`` depends on the
    engine's reduction order and diverges from the oracle at the 6-dp
    rounding boundary (this was CORRECTNESS_r01's one hash mismatch).
    Same pattern as analytics.py's ``sum_price``."""
    tagged = sessionize(events, gap_seconds, user_col, ts_col)
    return (
        tagged.groupBy(user_col, "session_idx")
        .agg(
            F.min(ts_col).alias("session_start"),
            F.max(ts_col).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col(value_col).cast("decimal(38,9)")), 6
            ).cast("double").alias("sum_value"),
        )
    )


def session_stats_sql(
    table: str,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    """DuckDB oracle — identical lag+cumsum formulation, µs-exact."""
    gap_us = gap_seconds * 1_000_000
    return f"""
WITH tagged AS (
  SELECT {user_col}, {ts_col}, {value_col},
    CAST(SUM(CASE WHEN prev_us IS NULL OR epoch_us({ts_col}) - prev_us > {gap_us}
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY {user_col} ORDER BY {ts_col}
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_idx
  FROM (
    SELECT {user_col}, {ts_col}, {value_col},
           LAG(epoch_us({ts_col})) OVER (PARTITION BY {user_col} ORDER BY {ts_col}) AS prev_us
    FROM {table}))
SELECT {user_col}, session_idx,
       min({ts_col}) AS session_start, max({ts_col}) AS session_end,
       count(*) AS n_events,
       CAST(round(sum(CAST({value_col} AS DECIMAL(38,9))), 6) AS DOUBLE) AS sum_value
FROM tagged GROUP BY {user_col}, session_idx
""".strip()
