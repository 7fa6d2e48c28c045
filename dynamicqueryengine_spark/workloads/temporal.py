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
            F.sum(F.col("value").cast("decimal(38,9)")), 6
        ).cast("double").alias("sum_value"),
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
       CAST(round(sum(CAST(e.value AS DECIMAL(38,9))), 6) AS DOUBLE)
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
            F.sum(F.col("value").cast("decimal(38,9)")), 6
        ).cast("double").alias("sum_value"),
    )


_EVENTS_ROLLUP_SQL = f"""
WITH ev AS ({_EVENTS_CTE})
SELECT event_type,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
       CAST(GROUPING(event_type) AS INTEGER) AS g_type,
       CAST(GROUPING(CAST(date_trunc('day', ts) AS TIMESTAMP)) AS INTEGER)
         AS g_day,
       count(*) AS n_events,
       CAST(round(sum(CAST(value AS DECIMAL(38,9))), 6) AS DOUBLE)
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
                F.sum(F.col("value").cast("decimal(38,9)")), 6
            ).cast("double").alias("sum_value"),
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


def _events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type — the distribution
    profile behind alert thresholds and drift monitors. Bin edges are
    ANCHORED to constants (lo=0, width=5), not data-derived min/max: at
    100 TB a data-dependent range needs an extra full pass and makes
    histograms from different snapshots non-comparable; anchored bins are
    one map-only pass + one bounded aggregate (state = types × bins).
    Out-of-range values clamp into the edge bins so mass is conserved.
    Integer bin arithmetic (floor of a non-negative double / constant) is
    engine-exact — no float-boundary ambiguity in the group keys."""
    from ..sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    n_bins, width = 20, 5.0
    raw = F.floor(F.col("value") / F.lit(width)).cast("long")
    b = F.least(F.greatest(raw, F.lit(0)), F.lit(n_bins - 1))
    return (
        ev.select("event_type", b.alias("bin"))
        .groupBy("event_type", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            "bin",
            (F.col("bin") * width).alias("bin_lo"),
            ((F.col("bin") + 1) * width).alias("bin_hi"),
            "n",
        )
    )


_EVENTS_VALUE_HISTOGRAM_SQL = """
SELECT event_type, bin,
       bin * 5.0 AS bin_lo, (bin + 1) * 5.0 AS bin_hi,
       count(*) AS n
FROM (
  SELECT event_type,
         least(greatest(CAST(floor(value / 5.0) AS BIGINT), 0), 19) AS bin
  FROM events)
GROUP BY event_type, bin
""".strip()


def _corpus_drift_chisq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square drift report between two corpus snapshots — the
    distribution-shift monitor a recurring ingest pipeline runs before
    accepting a new crawl. Snapshots are simulated deterministically
    (doc_id parity: even = baseline, odd = candidate); categories are
    (source, lang) cells. Per-cell output — observed counts, expected
    under homogeneity, and the cell's χ² contribution — keeps every
    number a short rational expression of integer counts (one division,
    one square), so the value oracle is exact; the global χ² is the
    caller's trivial sum and a global FP-sum would only add an
    engine-specific reduction order. Scale shape: two bounded aggregates
    (cells × 2 state), no shuffle wider than the category table."""
    from ..sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    tagged = docs.select(
        "source",
        "lang",
        (F.col("doc_id") % 2 == 0).alias("_base"),
    )
    cells = tagged.groupBy("source", "lang").agg(
        F.sum(F.when(F.col("_base"), 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(F.col("_base"), 0).otherwise(1)).alias("n_cand"),
    )
    totals = cells.agg(
        F.sum("n_base").alias("_tb"), F.sum("n_cand").alias("_tc")
    )
    j = cells.crossJoin(F.broadcast(totals))
    row_tot = F.col("n_base") + F.col("n_cand")
    grand = F.col("_tb") + F.col("_tc")
    e_base = (row_tot * F.col("_tb")).cast("double") / grand
    e_cand = (row_tot * F.col("_tc")).cast("double") / grand
    contrib = (
        (F.col("n_base") - e_base) * (F.col("n_base") - e_base) / e_base
        + (F.col("n_cand") - e_cand) * (F.col("n_cand") - e_cand) / e_cand
    )
    return j.select(
        "source",
        "lang",
        "n_base",
        "n_cand",
        F.round(e_base, 6).alias("expect_base"),
        F.round(contrib, 6).alias("chisq_contrib"),
    )


_CORPUS_DRIFT_SQL = """
WITH cells AS (
  SELECT source, lang,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_base,
         CAST(sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS BIGINT) AS n_cand
  FROM documents GROUP BY source, lang
),
tot AS (
  SELECT CAST(sum(n_base) AS BIGINT) AS tb, CAST(sum(n_cand) AS BIGINT) AS tc
  FROM cells
)
SELECT source, lang, n_base, n_cand,
       round(CAST((n_base + n_cand) * tb AS DOUBLE) / (tb + tc), 6) AS expect_base,
       round(
         (n_base - CAST((n_base + n_cand) * tb AS DOUBLE) / (tb + tc))
           * (n_base - CAST((n_base + n_cand) * tb AS DOUBLE) / (tb + tc))
           / (CAST((n_base + n_cand) * tb AS DOUBLE) / (tb + tc))
         + (n_cand - CAST((n_base + n_cand) * tc AS DOUBLE) / (tb + tc))
           * (n_cand - CAST((n_base + n_cand) * tc AS DOUBLE) / (tb + tc))
           / (CAST((n_base + n_cand) * tc AS DOUBLE) / (tb + tc)), 6)
         AS chisq_contrib
FROM cells CROSS JOIN tot
""".strip()


TEMPORAL_QUERIES.update(
    {
        "events_value_histogram": FnWorkload(
            _events_value_histogram, _EVENTS_VALUE_HISTOGRAM_SQL
        ),
        "corpus_drift_chisq": FnWorkload(
            _corpus_drift_chisq, _CORPUS_DRIFT_SQL
        ),
    }
)


def _events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-step funnel: for every user, each ``view`` event joined to the
    user's FIRST subsequent ``purchase`` within 30 minutes — the
    conversion primitive of event analytics. Formulated as one per-user
    ordered window (min of future purchase times via a range frame on the
    event-time long), not a self-join: the window shuffles each user's
    events ONCE, where the join formulation shuffles views × purchases
    and explodes on hot users. Output: (user_id, view_ts, purchase_ts,
    secs_to_convert) for converted views only — µs-exact integer
    arithmetic end to end."""
    from ..sources.registry import load_table
    from pyspark.sql.window import Window

    horizon_us = 30 * 60 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("_us"),
        F.col("ts"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_us").asc())
        .rangeBetween(1, horizon_us)
    )
    nxt = F.min(
        F.when(F.col("event_type") == "purchase", F.col("_us"))
    ).over(w)
    return (
        ev.withColumn("_next_purchase_us", nxt)
        .filter(
            (F.col("event_type") == "view")
            & F.col("_next_purchase_us").isNotNull()
        )
        .select(
            "user_id",
            F.col("ts").alias("view_ts"),
            F.timestamp_micros(F.col("_next_purchase_us")).alias("purchase_ts"),
            ((F.col("_next_purchase_us") - F.col("_us")) / 1_000_000.0).alias(
                "secs_to_convert"
            ),
        )
    )


_EVENTS_FUNNEL_SQL = """
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
tagged AS (
  SELECT user_id, event_type, ts, us,
         min(CASE WHEN event_type = 'purchase' THEN us END) OVER (
           PARTITION BY user_id ORDER BY us ASC
           RANGE BETWEEN 1 FOLLOWING AND 1800000000 FOLLOWING
         ) AS next_purchase_us
  FROM ev
)
SELECT user_id, ts AS view_ts,
       make_timestamp(next_purchase_us) AS purchase_ts,
       (next_purchase_us - us) / 1000000.0 AS secs_to_convert
FROM tagged
WHERE event_type = 'view' AND next_purchase_us IS NOT NULL
""".strip()


TEMPORAL_QUERIES.update(
    {
        "events_funnel_view_purchase": FnWorkload(
            _events_funnel, _EVENTS_FUNNEL_SQL
        ),
    }
)


def funnel_ksteps(
    events: DataFrame,
    steps: "list[str]",
    horizon_us: int = 30 * 60 * 1_000_000,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered K-step funnel in ONE per-user pass: the earliest chain
    s1 → s2 → … → sK where each step occurs strictly after the previous
    matched step and within ``horizon_us`` of it (greedy-earliest, the
    standard funnel semantics). Output: one row per user who entered the
    funnel — (user, step1_ts … stepK_ts, steps_completed).

    Plan shape: filter to the K step types, ONE groupBy(user) building the
    user's time-sorted (us, type) array, then a single ``F.aggregate``
    fold whose state is the K matched timestamps — one shuffle total,
    state bounded by events-per-user (human-bounded), no self-join and no
    per-step repartition. The chained-min formulation (step i = min
    qualifying ts after step i-1) is provably equal to this fold on
    time-sorted events, which is what the SQL oracle uses — so the
    one-pass plan is value-checked against the K-aggregate formulation.
    """
    from ..util import spread

    ev = spread(events).select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("t"),
        F.unix_micros(F.col(ts_col)).alias("us"),
    ).filter(F.col("t").isin(list(steps)))
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("us"), F.col("t")))
        ).alias("evs")
    )

    k = len(steps)
    names = [f"t{i + 1}" for i in range(k)]
    init = F.struct(
        *[F.lit(None).cast("long").alias(n) for n in names]
    )

    def merge(acc, e):
        fields = []
        for i, name in enumerate(names):
            cur = acc[name]
            if i == 0:
                hit = cur.isNull() & (e["t"] == steps[0])
            else:
                prev = acc[names[i - 1]]
                hit = (
                    cur.isNull()
                    & prev.isNotNull()
                    & (e["t"] == steps[i])
                    & (e["us"] > prev)
                    & (e["us"] <= prev + F.lit(int(horizon_us)))
                )
            fields.append(F.when(hit, e["us"]).otherwise(cur).alias(name))
        return F.struct(*fields)

    chain = F.aggregate(F.col("evs"), init, merge)
    done = sum(
        (F.when(chain[n].isNotNull(), 1).otherwise(0) for n in names),
        F.lit(0),
    )
    return (
        per_user.select(
            "user_id",
            *[
                F.timestamp_micros(chain[n]).alias(f"step{i + 1}_ts")
                for i, n in enumerate(names)
            ],
            done.cast("int").alias("steps_completed"),
        )
        .filter(F.col("step1_ts").isNotNull())
    )


def _events_funnel_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-step view → click → purchase funnel via the K-step one-pass
    fold (funnel_ksteps) — the r3 verdict's stretch ask."""
    from ..sources.registry import load_table

    return funnel_ksteps(
        load_table(spark, sf_dir, "events"), ["view", "click", "purchase"]
    )


_EVENTS_FUNNEL_3STEP_SQL = """
WITH ev AS (
  SELECT user_id, event_type AS t, epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events
),
u1 AS (
  SELECT user_id, min(us) AS t1 FROM ev WHERE t = 'view' GROUP BY user_id
),
u2 AS (
  SELECT ev.user_id, min(us) AS t2 FROM ev JOIN u1 USING (user_id)
  WHERE t = 'click' AND us > t1 AND us <= t1 + 1800000000
  GROUP BY ev.user_id
),
u3 AS (
  SELECT ev.user_id, min(us) AS t3 FROM ev JOIN u2 USING (user_id)
  WHERE t = 'purchase' AND us > t2 AND us <= t2 + 1800000000
  GROUP BY ev.user_id
)
SELECT u1.user_id,
       make_timestamp(t1) AS step1_ts,
       make_timestamp(t2) AS step2_ts,
       make_timestamp(t3) AS step3_ts,
       CAST(1 + COALESCE(CAST(t2 IS NOT NULL AS INT), 0)
              + COALESCE(CAST(t3 IS NOT NULL AS INT), 0) AS INT)
         AS steps_completed
FROM u1
LEFT JOIN u2 USING (user_id)
LEFT JOIN u3 USING (user_id)
""".strip()


def _events_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The funnel REPORT: how many users completed exactly N steps of the
    view → click → purchase sequence — the chart product analytics draws
    from the per-user chains."""
    return (
        _events_funnel_3step(spark, sf_dir)
        .groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("users"))
    )


_EVENTS_FUNNEL_STEPS_SQL = f"""
SELECT steps_completed, count(*) AS users
FROM ({_EVENTS_FUNNEL_3STEP_SQL})
GROUP BY steps_completed
""".strip()


TEMPORAL_QUERIES.update(
    {
        "events_funnel_3step": FnWorkload(
            _events_funnel_3step, _EVENTS_FUNNEL_3STEP_SQL
        ),
        "events_funnel_steps": FnWorkload(
            _events_funnel_steps, _EVENTS_FUNNEL_STEPS_SQL
        ),
    }
)


def _events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly retention cohorts: users grouped by first-seen week, then
    for every (cohort_week, week_offset) the count of cohort members
    active that week — THE product-analytics retention triangle. All
    bucketing is integer division of the µs epoch (engine-exact keys);
    the plan is two bounded aggregates (first-seen per user — map-side
    combined min; distinct user-week activity) joined on user, so state
    never exceeds users + user-weeks and no window touches the raw
    event stream."""
    from ..sources.registry import load_table

    week_us = 7 * 24 * 3600 * 1_000_000
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(f"unix_micros(ts) div {week_us}").alias("_wk"),
    )
    first_seen = ev.groupBy("user_id").agg(F.min("_wk").alias("_cohort"))
    active = ev.distinct()
    return (
        active.join(first_seen, "user_id")
        .groupBy(
            F.col("_cohort").alias("cohort_week"),
            (F.col("_wk") - F.col("_cohort")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


_EVENTS_RETENTION_SQL = """
WITH ev AS (
  SELECT DISTINCT user_id,
         epoch_us(CAST(ts AS TIMESTAMP)) // 604800000000 AS wk
  FROM events
),
first_seen AS (
  SELECT user_id, CAST(min(wk) AS BIGINT) AS cohort FROM ev GROUP BY user_id
)
SELECT cohort AS cohort_week,
       CAST(wk - cohort AS BIGINT) AS week_offset,
       count(*) AS active_users
FROM ev JOIN first_seen USING (user_id)
GROUP BY 1, 2
""".strip()


TEMPORAL_QUERIES.update(
    {
        "events_retention_cohorts": FnWorkload(
            _events_retention_cohorts, _EVENTS_RETENTION_SQL
        ),
    }
)


def _events_session_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped funnel — the composition story: gap-sessionize
    (functions/sessions.py) tags each event, then the K-step one-pass
    fold (funnel_ksteps) runs PER SESSION by passing the composite
    (user, session) struct as the funnel's grouping key (struct group
    keys are first-class in both engines). No step horizon — the
    session gap already bounds the chain. Output: sessions that entered
    the funnel, counted by how many ordered steps they completed.

    Plan shape: one keyed window shuffle for the session tagging, one
    groupBy((user, session)) for the fold, one tiny aggregation onto
    ≤K rows. The oracle uses the chained-min formulation per (user,
    session) — provably equal to the fold on time-sorted events."""
    from ..functions.sessions import sessionize
    from ..sources.registry import load_table

    tagged = sessionize(load_table(spark, sf_dir, "events"), 1800)
    keyed = tagged.select(
        F.struct("user_id", "session_idx").alias("_usess"),
        "event_type",
        "ts",
    )
    per_session = funnel_ksteps(
        keyed,
        ["view", "click", "purchase"],
        horizon_us=10**15,  # unbounded within a session
        user_col="_usess",
    )
    return (
        per_session.groupBy("steps_completed")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
    )


_EVENTS_SESSION_FUNNEL_SQL = """
WITH lagged AS (
  SELECT user_id, ts, event_type,
         LAG(epoch_us(CAST(ts AS TIMESTAMP)))
           OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
  FROM events
),
tagged AS (
  SELECT user_id, ts, event_type,
    CAST(SUM(CASE WHEN prev_us IS NULL
                    OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
             THEN 1 ELSE 0 END)
      OVER (PARTITION BY user_id ORDER BY ts
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      AS session_idx
  FROM lagged
),
f AS (
  SELECT user_id, session_idx,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_type AS t
  FROM tagged WHERE event_type IN ('view', 'click', 'purchase')
),
u1 AS (
  SELECT user_id, session_idx, min(us) AS t1
  FROM f WHERE t = 'view' GROUP BY 1, 2
),
u2 AS (
  SELECT f.user_id, f.session_idx, min(us) AS t2
  FROM f JOIN u1 USING (user_id, session_idx)
  WHERE t = 'click' AND us > t1 GROUP BY 1, 2
),
u3 AS (
  SELECT f.user_id, f.session_idx, min(us) AS t3
  FROM f JOIN u2 USING (user_id, session_idx)
  WHERE t = 'purchase' AND us > t2 GROUP BY 1, 2
),
lev AS (
  SELECT u1.user_id, u1.session_idx,
         CAST(1 + CASE WHEN t2 IS NOT NULL THEN 1 ELSE 0 END
                + CASE WHEN t3 IS NOT NULL THEN 1 ELSE 0 END AS INT)
           AS steps_completed
  FROM u1
  LEFT JOIN u2 USING (user_id, session_idx)
  LEFT JOIN u3 USING (user_id, session_idx)
)
SELECT steps_completed, count(*) AS n_sessions
FROM lev GROUP BY 1
""".strip()


TEMPORAL_QUERIES["events_session_funnel"] = FnWorkload(
    _events_session_funnel, _EVENTS_SESSION_FUNNEL_SQL
)


def _events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day — the sweep-line (interval
    stabbing) pattern: every session (functions/sessions.py, 30-min
    gap) emits +1 at its start and −1 just after its end; the running
    sum over the time-ordered delta stream is the live concurrency, and
    its per-day max is the capacity-planning number.

    Plan shape (100 TB): the running sum is a TWO-LEVEL prefix sum —
    the functions/packing.py machinery — never a global-ordered window:
    boundary events land in contiguous time-range buckets (integer
    arithmetic, monotone in us); per-bucket delta sums (a buckets-row
    table) take the only ordered window; every boundary row then pays
    one bucket-local running sum keyed by (_bkt), i.e. buckets-way
    parallel. Values are identical to the naive global window, which is
    what the SQL oracle runs, because bucketing by us-range preserves
    the global order: prefix(r) = Σ earlier buckets + bucket-local
    prefix. Ties are total-ordered (us, delta asc — ends strictly
    before starts at the same instant, the conservative convention —
    then user/session id) and tie groups share one us, hence one
    bucket, so the running sum is deterministic in both engines.
    tests/test_plan_audit.py pins that the full delta stream never
    crosses a single-partition exchange."""
    from ..functions.sessions import session_stats
    from ..sources.registry import load_table
    from pyspark.sql import Window

    sess = session_stats(load_table(spark, sf_dir, "events"), 1800).select(
        "user_id",
        "session_idx",
        F.unix_micros("session_start").alias("s_us"),
        F.unix_micros("session_end").alias("e_us"),
    ).persist()  # consumed by bounds, bucket stats, and the bucket join —
    # without it every lazy reference re-derives the sessionize windows
    # (~8 full scans of events in the un-persisted plan)
    deltas = sess.select(
        F.col("s_us").alias("us"), F.lit(1).alias("delta"),
        "user_id", "session_idx",
    ).unionByName(
        sess.select(
            (F.col("e_us") + 1).alias("us"), F.lit(-1).alias("delta"),
            "user_id", "session_idx",
        )
    )
    buckets = 64
    bounds = deltas.agg(F.min("us").alias("_lo"), F.max("us").alias("_hi"))
    ranged = deltas.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.expr(f"CAST(((us - _lo) * {buckets}) div (_hi - _lo + 1) AS INT)"),
    )
    bstats = ranged.groupBy("_bkt").agg(F.sum("delta").alias("_bsum"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bstats = bstats.withColumn(
        "_boff", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    ).drop("_bsum")
    wd = (
        Window.partitionBy("_bkt")
        .orderBy("us", F.asc("delta"), "user_id", "session_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    live = ranged.join(F.broadcast(bstats), "_bkt").select(
        F.timestamp_micros(F.col("us")).alias("t"),
        (F.col("_boff") + F.sum("delta").over(wd)).alias("concurrency"),
    )
    return (
        live.groupBy(F.date_trunc("day", F.col("t")).alias("day"))
        .agg(F.max("concurrency").cast("long").alias("peak_concurrency"))
    )


_EVENTS_PEAK_CONCURRENCY_SQL = """
WITH sess AS (
  SELECT user_id, session_idx,
         epoch_us(CAST(min(ts) AS TIMESTAMP)) AS s_us,
         epoch_us(CAST(max(ts) AS TIMESTAMP)) AS e_us
  FROM (
    SELECT user_id, ts,
      CAST(SUM(CASE WHEN prev_us IS NULL
                      OR epoch_us(CAST(ts AS TIMESTAMP)) - prev_us > 1800000000
               THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        AS session_idx
    FROM (
      SELECT user_id, ts,
             LAG(epoch_us(CAST(ts AS TIMESTAMP)))
               OVER (PARTITION BY user_id ORDER BY ts) AS prev_us
      FROM events))
  GROUP BY user_id, session_idx
),
deltas AS (
  SELECT s_us AS us, 1 AS delta, user_id, session_idx FROM sess
  UNION ALL
  SELECT e_us + 1, -1, user_id, session_idx FROM sess
),
live AS (
  SELECT make_timestamp(us) AS t,
         SUM(delta) OVER (ORDER BY us, delta ASC, user_id, session_idx
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS concurrency
  FROM deltas
)
SELECT CAST(date_trunc('day', t) AS TIMESTAMP) AS day,
       CAST(max(concurrency) AS BIGINT) AS peak_concurrency
FROM live GROUP BY 1
""".strip()


TEMPORAL_QUERIES["events_peak_concurrency"] = FnWorkload(
    _events_peak_concurrency, _EVENTS_PEAK_CONCURRENCY_SQL
)


def _events_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal index per event type: observed share of each
    weekday vs the uniform 1/7 baseline — the STL-lite seasonality
    profile behind anomaly baselines (events_seasonal_baseline holds the
    hour-of-day twin). One scan, one aggregation onto the 5 types × 7
    days matrix; the index is 7·n_dow / n_type computed in double after
    exact integer counts. Weekday numbering pinned to 1 = Sunday … 7 =
    Saturday in both engines (DuckDB's EXTRACT(dow) is 0-based)."""
    events = load_table(spark, sf_dir, "events")
    per = events.groupBy(
        "event_type",
        F.dayofweek("ts").cast("long").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("value").cast("decimal(38,12)")), 6
        ).cast("double").alias("sum_value"),
    )
    tot = Window.partitionBy("event_type")
    return per.select(
        "event_type",
        "dow",
        "n",
        "sum_value",
        F.round(
            F.lit(7.0)
            * F.col("n").cast("double")
            / F.sum("n").over(tot).cast("double"),
            6,
        ).alias("seasonal_index"),
    )


_DOW_SEASONALITY_SQL = """
WITH per AS (
  SELECT event_type,
         CAST(EXTRACT(dow FROM CAST(ts AS TIMESTAMP)) + 1 AS BIGINT) AS dow,
         count(*) AS n,
         CAST(round(sum(CAST(value AS DECIMAL(38,12))), 6) AS DOUBLE)
           AS sum_value
  FROM events
  GROUP BY 1, 2
)
SELECT event_type, dow, n, sum_value,
       round(7.0 * CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY event_type) AS DOUBLE), 6)
         AS seasonal_index
FROM per
""".strip()


TEMPORAL_QUERIES["events_dow_seasonality"] = FnWorkload(
    _events_dow_seasonality, _DOW_SEASONALITY_SQL
)
