"""Temporal-join and multi-resolution-rollup workloads over the events
table: as-of join, point-in-interval range join, and ROLLUP grouping sets.

The reference has no join/window surface at all (SURVEY.md §2.5); these
queries document the engine's time-series breadth with full DuckDB value
oracles. The Spark plans are the scale-shaped ones (tagged-union as-of,
bucketed range join); the oracles are the naive quadratic formulations —
exact at sf0.01, which is the point of an oracle.

Numeric parity: every ``sum(value)`` goes through DECIMAL(38,9) (double
summation order differs between engines — the events_sessionize lesson,
VERDICT round 1 §wrong.1); timestamps compare naive-UTC (registry pins
``spark.sql.session.timeZone=UTC``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..operators.joins import asof_join, range_join
from ..sources.registry import load_table
from .llm import FnWorkload
from .reference import _EVENTS_ORACLE_SOURCE

_EVENTS_CTE = _EVENTS_ORACLE_SOURCE.removesuffix(" AS events")


def _events_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-style as-of join: each purchase event picks up the most
    recent earlier-or-simultaneous non-purchase event by the same user
    (ties on ts → greatest event_id). Tagged-union + single window — one
    shuffle by user_id; the oracle is the quadratic theta-join."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase")
    prior = events.filter(F.col("event_type") != "purchase")
    joined = asof_join(
        purchases,
        prior,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_payload=["event_id", "ts", "event_type"],
        right_tiebreak="event_id",
    )
    return joined.select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
        F.col("event_id_asof").alias("prior_event_id"),
        F.col("ts_asof").alias("prior_ts"),
        F.col("event_type_asof").alias("prior_type"),
    )


_EVENTS_ASOF_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
ranked AS (
  SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
         p.value AS purchase_value,
         c.event_id AS prior_event_id, c.ts AS prior_ts,
         c.event_type AS prior_type,
         row_number() OVER (PARTITION BY p.event_id
                            ORDER BY c.ts DESC, c.event_id DESC) AS rn
  FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
  LEFT JOIN (SELECT * FROM ev WHERE event_type <> 'purchase') c
    ON c.user_id = p.user_id AND c.ts <= p.ts
)
SELECT purchase_id, user_id, purchase_ts, purchase_value,
       prior_event_id, prior_ts, prior_type
FROM ranked WHERE rn = 1
""".strip()


def _events_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incident-window range join: the 12 busiest hours (by exact decimal
    value sum, ties → earliest hour) become half-open windows
    [hour-30min, hour+90min); every event landing in a window is counted.
    Windows overlap, so this is a genuine point-in-interval join — run
    through the bucketed equi-join strategy (explode factor ≤ 3)."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.groupBy(F.date_trunc("hour", F.col("ts")).alias("w_hour"))
        .agg(F.sum(F.col("value").cast("decimal(38,9)")).alias("__total"))
    )
    windows = (
        hourly.orderBy(F.desc("__total"), F.asc("w_hour"))
        .limit(12)
        .select(
            "w_hour",
            (F.col("w_hour") - F.expr("INTERVAL 30 MINUTES")).alias("w_start"),
            (F.col("w_hour") + F.expr("INTERVAL 90 MINUTES")).alias("w_end"),
        )
    )
    joined = range_join(
        events, windows, "ts", "w_start", "w_end",
        strategy="bucket", bucket_seconds=3600,
    )
    return joined.groupBy("w_hour").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double"), 6
        ).alias("sum_value"),
    )


_EVENTS_RANGE_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
hourly AS (
  SELECT time_bucket(INTERVAL '1 hour', ts) AS w_hour,
         sum(CAST(value AS DECIMAL(38,9))) AS total
  FROM ev GROUP BY 1
),
wins AS (
  SELECT w_hour, w_hour - INTERVAL 30 MINUTE AS w_start,
         w_hour + INTERVAL 90 MINUTE AS w_end
  FROM hourly ORDER BY total DESC, w_hour ASC LIMIT 12
)
SELECT w.w_hour AS w_hour, count(*) AS n_events,
       count(DISTINCT e.user_id) AS n_users,
       round(CAST(sum(CAST(e.value AS DECIMAL(38,9))) AS DOUBLE), 6)
         AS sum_value
FROM ev e JOIN wins w ON e.ts >= w.w_start AND e.ts < w.w_end
GROUP BY 1
""".strip()


def _events_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: one pass produces
    (event_type, day), (event_type), and grand-total aggregates via ROLLUP
    grouping sets — Catalyst expands to a single shuffle (Expand + one
    aggregate), not three scans. GROUPING flags disambiguate real NULLs
    from rollup NULLs."""
    events = load_table(spark, sf_dir, "events")
    daily = events.select(
        "event_type",
        F.date_trunc("day", F.col("ts")).alias("day"),
        "value",
    )
    return daily.rollup("event_type", "day").agg(
        F.grouping("event_type").cast("int").alias("g_type"),
        F.grouping("day").cast("int").alias("g_day"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,9)")).cast("double"), 6
        ).alias("sum_value"),
    )


_EVENTS_ROLLUP_SQL = f"""
WITH ev AS ({_EVENTS_CTE})
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS INTEGER)
         AS g_day,
       count(*) AS n_events,
       round(CAST(sum(CAST(value AS DECIMAL(38,9))) AS DOUBLE), 6)
         AS sum_value
FROM ev
GROUP BY ROLLUP (event_type, CAST(date_trunc('day', ts) AS TIMESTAMP))
""".strip()


def _events_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC bars per (hour, event_type): open/close are the values at the
    window's first/last event — argmin/argmax over (ts, event_id, value)
    structs, the same single-pass no-window-sort technique as the rule
    engine's Min/Max aggregation (operators/aggregate.py) — high/low/count/
    decimal-sum ride the same ONE shuffle. Ties on ts break by event_id,
    so open/close are deterministic and value-oracle-checkable."""
    events = load_table(spark, sf_dir, "events")
    first = F.min(F.struct("ts", "event_id", "value"))
    last = F.max(F.struct("ts", "event_id", "value"))
    return (
        events.groupBy(F.window(F.col("ts"), "1 hour"), "event_type")
        .agg(
            first["value"].alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            last["value"].alias("close"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("value").cast("decimal(38,9)")).cast("double"), 6
            ).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "open",
            "high",
            "low",
            "close",
            "n_events",
            "sum_value",
        )
    )


_EVENTS_OHLC_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
b AS (
  SELECT time_bucket(INTERVAL '1 hour', CAST(ts AS TIMESTAMP)) AS ws,
         event_type, ts, event_id, value
  FROM ev
),
o AS (
  SELECT ws, event_type, value AS open FROM b
  QUALIFY row_number() OVER (
    PARTITION BY ws, event_type ORDER BY ts ASC, event_id ASC) = 1
),
c AS (
  SELECT ws, event_type, value AS close FROM b
  QUALIFY row_number() OVER (
    PARTITION BY ws, event_type ORDER BY ts DESC, event_id DESC) = 1
),
agg AS (
  SELECT ws, event_type, max(value) AS high, min(value) AS low,
         count(*) AS n_events,
         CAST(round(sum(CAST(value AS DECIMAL(38,9))), 6) AS DOUBLE)
           AS sum_value
  FROM b GROUP BY 1, 2
)
SELECT agg.ws AS window_start, agg.ws + INTERVAL '1 hour' AS window_end,
       agg.event_type, o.open, agg.high, agg.low, c.close,
       agg.n_events, agg.sum_value
FROM agg
JOIN o ON o.ws = agg.ws AND o.event_type = agg.event_type
JOIN c ON c.ws = agg.ws AND c.event_type = agg.event_type
""".strip()


TEMPORAL_QUERIES: dict[str, FnWorkload] = {
    "events_asof_join": FnWorkload(_events_asof, _EVENTS_ASOF_SQL),
    "events_range_join": FnWorkload(_events_range, _EVENTS_RANGE_SQL),
    "events_rollup_multires": FnWorkload(_events_rollup, _EVENTS_ROLLUP_SQL),
    "events_ohlc_hourly": FnWorkload(_events_ohlc, _EVENTS_OHLC_SQL),
}
