"""Behavioral-trend workloads over the events table: Markov transition
matrix, grouped OLS trend lines, z-score outliers, and gap-fill +
forward-fill resampling.

The reference has no window/temporal surface at all (SURVEY.md §2.5);
these extend the engine's product-analytics breadth, each with a full
DuckDB value oracle.

Numeric parity strategy (the events_sessionize lesson, VERDICT r1):
every SUM over doubles goes through a per-row CAST to DECIMAL(38,12)
(exactly mirrored in the oracle SQL), so the aggregation is
order-insensitive and engine-exact; derived statistics (slope, mean,
variance, z) are then computed from those exact sums with ONE shared
double-precision formula written identically on both sides — identical
IEEE-754 operation sequences produce bit-identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from ..sources.registry import load_table
from .llm import FnWorkload
from .reference import _EVENTS_ORACLE_SOURCE

_EVENTS_CTE = _EVENTS_ORACLE_SOURCE.removesuffix(" AS events")

# Fixed epoch offset (2023-10-14T12:26:40Z) keeping x small enough that
# x*x stays well inside double's 2^53 integer-exact window at second
# scale; both engines subtract the same exactly-representable literal.
_X_OFFSET = 1_700_000_000.0

_DEC = "decimal(38,12)"


def _dec_sum(col: F.Column) -> F.Column:
    """Order-insensitive exact sum of a double expression."""
    return F.sum(col.cast(_DEC))


# ------------------------------------------------- transition matrix --


def _events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov transition matrix of event types: for each user's
    time-ordered event stream (ties broken by event_id), count src→dst
    transitions and the conditional probability P(dst | src).

    Plan shape: ONE shuffle by user_id for the lead() window, then an
    aggregation onto the (src,dst) key space — bounded by
    |event_types|², so the second stage is trivially small no matter the
    corpus size. The probability is an exact-integer double division,
    identical in both engines."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.select(
            F.col("event_type").alias("src_type"),
            F.lead("event_type").over(w).alias("dst_type"),
        )
        .filter(F.col("dst_type").isNotNull())
        .groupBy("src_type", "dst_type")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    tot = Window.partitionBy("src_type")
    return pairs.select(
        "src_type",
        "dst_type",
        "n_pairs",
        F.sum("n_pairs").over(tot).alias("total_from_src"),
        (
            F.col("n_pairs").cast("double")
            / F.sum("n_pairs").over(tot).cast("double")
        ).alias("prob"),
    )


_EVENTS_TRANSITION_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
nx AS (
  SELECT event_type AS src_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
  FROM ev
),
c AS (
  SELECT src_type, dst_type, count(*) AS n_pairs
  FROM nx WHERE dst_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT src_type, dst_type, n_pairs,
       CAST(sum(n_pairs) OVER (PARTITION BY src_type) AS BIGINT)
         AS total_from_src,
       CAST(n_pairs AS DOUBLE)
         / CAST(sum(n_pairs) OVER (PARTITION BY src_type) AS DOUBLE)
         AS prob
FROM c
""".strip()


# ------------------------------------------------------ grouped OLS --


def _events_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend of value over time: slope and
    intercept from the five classical moments (n, Σx, Σy, Σx², Σxy),
    each accumulated as an exact DECIMAL(38,12) sum of per-row double
    expressions, then combined with one shared double formula.

    Plan shape: a single map + partial-aggregated shuffle onto
    |event_types| groups — the textbook scale-out regression; no window,
    no second pass."""
    events = load_table(spark, sf_dir, "events")
    x = F.col("ts").cast("double") - F.lit(_X_OFFSET)
    y = F.col("value")
    m = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(x).cast("double").alias("sx"),
        _dec_sum(y).cast("double").alias("sy"),
        _dec_sum(x * x).cast("double").alias("sxx"),
        _dec_sum(x * y).cast("double").alias("sxy"),
    )
    n_d = F.col("n").cast("double")
    slope = (n_d * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n_d * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return m.select(
        "event_type",
        "n",
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / n_d).alias("intercept"),
    )


_EVENTS_TREND_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
m AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(epoch(ts) - {_X_OFFSET!r} AS DECIMAL(38,12)))
           AS DOUBLE) AS sx,
         CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST((epoch(ts) - {_X_OFFSET!r})
                       * (epoch(ts) - {_X_OFFSET!r}) AS DECIMAL(38,12)))
           AS DOUBLE) AS sxx,
         CAST(sum(CAST((epoch(ts) - {_X_OFFSET!r}) * value
                       AS DECIMAL(38,12))) AS DOUBLE) AS sxy
  FROM ev GROUP BY 1
)
SELECT event_type, n,
       (CAST(n AS DOUBLE) * sxy - sx * sy)
         / (CAST(n AS DOUBLE) * sxx - sx * sx) AS slope,
       (sy - (CAST(n AS DOUBLE) * sxy - sx * sy)
               / (CAST(n AS DOUBLE) * sxx - sx * sx) * sx)
         / CAST(n AS DOUBLE) AS intercept
FROM m
""".strip()


# --------------------------------------------------- z-score outliers --


def _events_zscore_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier flags: mean and sample variance
    from exact decimal sums (Σy, Σy²), then z = (y − mean)/std per row;
    keep |z| ≥ 2.5.

    Plan shape: one aggregation onto |event_types| rows, broadcast back
    onto the stream (AQE picks broadcast — the stats side is tiny by
    construction), then a map-side filter. Two scans of events but zero
    wide shuffles of the raw stream."""
    events = load_table(spark, sf_dir, "events")
    y = F.col("value")
    stats = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        _dec_sum(y).cast("double").alias("sy"),
        _dec_sum(y * y).cast("double").alias("syy"),
    )
    n_d = F.col("n").cast("double")
    mean = F.col("sy") / n_d
    var = (F.col("syy") - F.col("sy") * F.col("sy") / n_d) / (n_d - F.lit(1.0))
    stats = stats.select(
        "event_type", mean.alias("mean_v"), F.sqrt(var).alias("std_v")
    )
    z = (F.col("value") - F.col("mean_v")) / F.col("std_v")
    return (
        events.join(F.broadcast(stats), "event_type")
        .select("event_id", "event_type", "value", z.alias("z"))
        .filter(F.abs(F.col("z")) >= 2.5)
    )


_EVENTS_ZSCORE_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
s AS (
  SELECT event_type,
         count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(sum(CAST(value * value AS DECIMAL(38,12))) AS DOUBLE) AS syy
  FROM ev GROUP BY 1
),
st AS (
  SELECT event_type,
         sy / CAST(n AS DOUBLE) AS mean_v,
         sqrt((syy - sy * sy / CAST(n AS DOUBLE))
              / (CAST(n AS DOUBLE) - 1.0)) AS std_v
  FROM s
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - st.mean_v) / st.std_v AS z
FROM ev e JOIN st USING (event_type)
WHERE abs((e.value - st.mean_v) / st.std_v) >= 2.5
""".strip()


# ---------------------------------------------- gap-fill + forward fill --


def _events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regular-grid resampling with forward fill: per user, build the
    hourly grid spanning their first..last active hour, attach the last
    observed value in each hour (ties broken by event_id), and
    forward-fill gaps with last(ignorenulls) over the grid.

    Plan shape: hourly argmax and per-user bounds are ONE aggregation
    each on the user key; the grid is generated executor-side with
    sequence()+explode (no driver loop, no cross join); the fill is a
    per-user running window over the bounded grid (≤ span-hours rows per
    user), never over the raw event stream."""
    events = load_table(spark, sf_dir, "events")
    hourly = (
        events.select(
            "user_id",
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "ts",
            "event_id",
            "value",
        )
        .groupBy("user_id", "hour")
        .agg(F.max(F.struct("ts", "event_id", "value"))["value"].alias("obs"))
    )
    grid = (
        hourly.groupBy("user_id")
        .agg(F.min("hour").alias("h0"), F.max("hour").alias("h1"))
        .select(
            "user_id",
            F.explode(
                F.sequence("h0", "h1", F.expr("interval 1 hour"))
            ).alias("hour"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return grid.join(hourly, ["user_id", "hour"], "left").select(
        "user_id",
        "hour",
        F.last("obs", ignorenulls=True).over(w).alias("value_ffill"),
        F.col("obs").isNotNull().alias("is_observed"),
    )


_EVENTS_GAPFILL_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
hourly AS (
  SELECT user_id, date_trunc('hour', ts) AS hour, value AS obs
  FROM ev
  QUALIFY row_number() OVER (
    PARTITION BY user_id, date_trunc('hour', ts)
    ORDER BY ts DESC, event_id DESC) = 1
),
grid AS (
  SELECT user_id,
         unnest(generate_series(h0, h1, INTERVAL 1 hour)) AS hour
  FROM (SELECT user_id, min(hour) AS h0, max(hour) AS h1
        FROM hourly GROUP BY 1)
)
SELECT g.user_id, g.hour,
       last_value(h.obs IGNORE NULLS) OVER (
         PARTITION BY g.user_id ORDER BY g.hour
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill,
       h.obs IS NOT NULL AS is_observed
FROM grid g LEFT JOIN hourly h
  ON h.user_id = g.user_id AND h.hour = g.hour
""".strip()


TREND_QUERIES: dict[str, FnWorkload] = {
    "events_transition_matrix": FnWorkload(
        _events_transition_matrix, _EVENTS_TRANSITION_SQL
    ),
    "events_value_trend": FnWorkload(_events_value_trend, _EVENTS_TREND_SQL),
    "events_zscore_outliers": FnWorkload(
        _events_zscore_outliers, _EVENTS_ZSCORE_SQL
    ),
    "events_gapfill_ffill": FnWorkload(_events_gapfill, _EVENTS_GAPFILL_SQL),
}


# ------------------------------------------------------- per-user EWMA --


def _events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average of value (α=0.25,
    seeded with the first observation) — the classic sequential
    recurrence, expressed as an ORDERED ARRAY FOLD: one groupBy(user)
    collects the time-sorted value array, then ``aggregate`` folds
    acc·0.75 + v·0.25 left-to-right.

    Parity: α=0.25 and 1−α=0.75 are exact binary fractions and both
    engines fold the identical sorted sequence with identical IEEE ops,
    so the result is bit-exact vs DuckDB's list_reduce mirror. Scale
    shape: ONE shuffle by user_id; per-user state is that user's own
    event list (the funnel_ksteps pattern) — no window over the raw
    stream, no cross-user state."""
    events = load_table(spark, sf_dir, "events")
    arr = F.array_sort(F.collect_list(F.struct("ts", "event_id", "value")))
    return (
        events.groupBy("user_id")
        .agg(arr.alias("_a"))
        .select(
            "user_id",
            F.size("_a").cast("long").alias("n_events"),
            F.expr(
                "aggregate("
                " slice(transform(_a, x -> x.value), 2,"
                "       greatest(size(_a) - 1, 0)),"
                " CAST(element_at(_a, 1).value AS DOUBLE),"
                " (acc, v) -> acc * 0.75 + v * 0.25)"
            ).alias("ewma"),
        )
    )


_EVENTS_EWMA_SQL = f"""
WITH ev AS ({_EVENTS_CTE})
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       list_reduce(
         list_prepend(
           (list(value ORDER BY ts, event_id))[1],
           (list(value ORDER BY ts, event_id))[2:]),
         (acc, v) -> acc * 0.75 + v * 0.25) AS ewma
FROM ev
GROUP BY user_id
""".strip()


TREND_QUERIES["events_ewma_user"] = FnWorkload(_events_ewma, _EVENTS_EWMA_SQL)


# --------------------------------------------------- JSON property stats --


def _events_json_kstats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: parse the ``props`` JSON string
    at scan time (``get_json_object`` — JVM-side, codegen, no UDF),
    extract the integer property ``k``, and aggregate per event_type.

    Malformed JSON degrades to NULL on both engines (Spark natively;
    the oracle guards with json_valid), counted in n_null_k. Integer
    sums are exact; the mean is one shared double division. Scale
    shape: scan-time projection + one aggregation onto |event_types|
    rows — JSON parsing never causes a shuffle."""
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("k").isNull(), 1).otherwise(0)).alias(
                "n_null_k"
            ),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (
                F.sum("k").cast("double") / F.count("k").cast("double")
            ).alias("avg_k"),
        )
    )


_EVENTS_JSON_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
parsed AS (
  SELECT event_type,
         CAST(json_extract_string(
           CASE WHEN json_valid(props) THEN props END, '$.k')
         AS BIGINT) AS k
  FROM ev
)
SELECT event_type,
       count(*) AS n,
       CAST(sum(CASE WHEN k IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_null_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE) AS avg_k
FROM parsed
GROUP BY event_type
""".strip()


TREND_QUERIES["events_json_kstats"] = FnWorkload(
    _events_json_kstats, _EVENTS_JSON_SQL
)


# --------------------------------------------------- MAD robust outliers --


def _events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier flags via median absolute deviation: per
    event_type, med = median(value), MAD = median(|value − med|); flag
    |value − med| ≥ 6·MAD. Unlike the z-score variant the thresholds
    are insensitive to the outliers themselves (median breakdown point
    50% vs the mean's 0%) — the robust twin of events_zscore_outliers.

    Parity: both engines interpolate even-count medians identically
    (the lineitem_stats precedent); deviations are per-row IEEE
    subtractions of the broadcast median. Plan: two |groups|-row
    aggregations (each an exact median over the group's values), stats
    broadcast back, flagging is a map-side filter."""
    events = load_table(spark, sf_dir, "events")
    med = events.groupBy("event_type").agg(
        F.median("value").alias("med_v")
    )
    dev = events.join(F.broadcast(med), "event_type").withColumn(
        "_adev", F.abs(F.col("value") - F.col("med_v"))
    )
    mad = dev.groupBy("event_type").agg(F.median("_adev").alias("mad_v"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter(F.col("_adev") > F.lit(6.0) * F.col("mad_v"))
        .select(
            "event_id",
            "event_type",
            "value",
            F.round("med_v", 6).alias("med_v"),
            F.round("mad_v", 6).alias("mad_v"),
        )
    )


_EVENTS_MAD_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
med AS (SELECT event_type, median(value) AS med_v FROM ev GROUP BY 1),
dev AS (
  SELECT e.event_id, e.event_type, e.value, med.med_v,
         abs(e.value - med.med_v) AS adev
  FROM ev e JOIN med USING (event_type)
),
mad AS (SELECT event_type, median(adev) AS mad_v FROM dev GROUP BY 1)
SELECT d.event_id, d.event_type, d.value,
       round(d.med_v, 6) AS med_v, round(mad.mad_v, 6) AS mad_v
FROM dev d JOIN mad USING (event_type)
WHERE d.adev > 6.0 * mad.mad_v
""".strip()


TREND_QUERIES["events_mad_outliers"] = FnWorkload(
    _events_mad_outliers, _EVENTS_MAD_SQL
)


# ------------------------------------------------- top user journeys --


def _events_top_journeys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step user journeys: consecutive event-type triples
    per user's time-ordered stream (ties by event_id), counted corpus-
    wide and top-20 by frequency (ties on the journey string).

    Plan shape: the same single user-keyed window shuffle as the
    transition matrix (two leads ride one window), then an aggregation
    onto the |types|³-bounded journey space; orderBy+limit compiles to
    TakeOrdered — no global sort."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            F.col("event_type").alias("s1"),
            F.lead("event_type", 1).over(w).alias("s2"),
            F.lead("event_type", 2).over(w).alias("s3"),
        )
        .filter(F.col("s3").isNotNull())
        .groupBy("s1", "s2", "s3")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.concat_ws(" > ", "s1", "s2", "s3").alias("journey"), "n"
        )
        .orderBy(F.col("n").desc(), F.col("journey").asc())
        .limit(20)
    )


_EVENTS_JOURNEYS_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
steps AS (
  SELECT event_type AS s1,
         lead(event_type, 1) OVER w AS s2,
         lead(event_type, 2) OVER w AS s3
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT s1 || ' > ' || s2 || ' > ' || s3 AS journey, count(*) AS n
FROM steps WHERE s3 IS NOT NULL
GROUP BY s1, s2, s3
ORDER BY n DESC, journey ASC
LIMIT 20
""".strip()


TREND_QUERIES["events_top_journeys"] = FnWorkload(
    _events_top_journeys, _EVENTS_JOURNEYS_SQL
)


# -------------------------------------- percentile-rank normalization --


def _events_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type percentile-rank normalization of value — the rank-based
    feature transform (quantile normalization) that makes heavy-tailed
    metrics comparable across groups. percent_rank = (rank−1)/(n−1) is
    exact integer arithmetic in one IEEE division, so the normalized
    column is bit-identical across engines.

    Plan: ONE window shuffle keyed by event_type; no second pass."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    return events.select(
        "event_id",
        "event_type",
        "value",
        F.percent_rank().over(w).alias("pct_rank"),
    )


_EVENTS_PCTRANK_SQL = f"""
WITH ev AS ({_EVENTS_CTE})
SELECT event_id, event_type, value,
       percent_rank() OVER (
         PARTITION BY event_type ORDER BY value, event_id) AS pct_rank
FROM ev
""".strip()


# ------------------------------------------------ seasonal baselines --


def _events_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal baseline per event type: mean value and the
    largest absolute deviation from it in each (type, hour-of-day) cell
    — the profile a time-of-day-adjusted anomaly detector thresholds
    against. Means from exact decimal sums; the max deviation is an
    argmax over per-row IEEE subtractions against the broadcast
    baseline. Output bounded by |types|·24."""
    events = load_table(spark, sf_dir, "events")
    hod = F.hour("ts").alias("hod")
    base = events.select("event_type", hod, "value").groupBy(
        "event_type", "hod"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum(F.col("value").cast(_DEC)).cast("double")
            / F.count(F.lit(1)).cast("double")
        ).alias("mean_v"),
    )
    dev = (
        events.select("event_type", hod, "value")
        .join(F.broadcast(base), ["event_type", "hod"])
        .groupBy("event_type", "hod")
        .agg(
            F.max(F.abs(F.col("value") - F.col("mean_v"))).alias(
                "max_abs_dev"
            )
        )
    )
    return base.join(dev, ["event_type", "hod"]).select(
        "event_type", "hod", "n", "mean_v", "max_abs_dev"
    )


_EVENTS_SEASONAL_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
base AS (
  SELECT event_type, CAST(hour(ts) AS INT) AS hod, count(*) AS n,
         CAST(sum(CAST(value AS DECIMAL(38,12))) AS DOUBLE)
           / CAST(count(*) AS DOUBLE) AS mean_v
  FROM ev GROUP BY 1, 2
),
dev AS (
  SELECT e.event_type, CAST(hour(e.ts) AS INT) AS hod,
         max(abs(e.value - b.mean_v)) AS max_abs_dev
  FROM ev e JOIN base b
    ON b.event_type = e.event_type AND b.hod = hour(e.ts)
  GROUP BY 1, 2
)
SELECT base.event_type, base.hod, base.n, base.mean_v, dev.max_abs_dev
FROM base JOIN dev USING (event_type, hod)
""".strip()


TREND_QUERIES["events_percentile_rank"] = FnWorkload(
    _events_percentile_rank, _EVENTS_PCTRANK_SQL
)
TREND_QUERIES["events_seasonal_baseline"] = FnWorkload(
    _events_seasonal_baseline, _EVENTS_SEASONAL_SQL
)


# ----------------------------------------------------------- DAU / WAU --


def _events_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily / weekly active users with stickiness (DAU/WAU): per day,
    distinct users that day and distinct users over the trailing 7 days.

    COUNT DISTINCT over a sliding range frame isn't a window aggregate
    either engine supports, so the trailing-week distinct uses the
    bounded-interval reformulation: dedupe to the (day, user) activity
    table first (the bounded state — |days|·|users| worst case), then
    EXPLODE each activity day to the ≤7 target days whose trailing week
    it falls in and equi-group — a map-side ×7 expansion feeding one
    hash aggregation. (A theta range join here plans as a
    BroadcastNestedLoopJoin testing every activity row against every
    day — |du|·|days| predicate evaluations, the one plan shape that
    dies at years-of-days × 10⁹ activity rows; the explode is linear
    and tests/test_plan_audit.py pins the nested-loop-free plan.)
    The inner join against the observed-day list (broadcast — bounded
    by the calendar) drops the up-to-6 future target days past each
    activity day that no event ever lands on. Stickiness is one shared
    IEEE division of exact integers."""
    events = load_table(spark, sf_dir, "events")
    du = events.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    dau = du.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    days = du.select("day").distinct()
    cover = du.select(
        F.explode(
            F.sequence(F.to_date("day"), F.date_add(F.to_date("day"), 6))
        ).alias("d"),
        "user_id",
    ).select(F.col("d").cast("timestamp").alias("day"), "user_id")
    wau = (
        cover.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
    )
    return dau.join(wau, "day").select(
        "day",
        "dau",
        "wau",
        (F.col("dau").cast("double") / F.col("wau").cast("double")).alias(
            "stickiness"
        ),
    )


_EVENTS_DAU_WAU_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
du AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, user_id
  FROM ev
),
dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM du GROUP BY 1),
days AS (SELECT DISTINCT day FROM du),
wau AS (
  SELECT d.day, count(DISTINCT a.user_id) AS wau
  FROM days d JOIN du a
    ON a.day <= d.day AND a.day >= d.day - INTERVAL 6 DAY
  GROUP BY d.day
)
SELECT dau.day, dau.dau, wau.wau,
       CAST(dau.dau AS DOUBLE) / CAST(wau.wau AS DOUBLE) AS stickiness
FROM dau JOIN wau USING (day)
""".strip()


TREND_QUERIES["events_dau_wau"] = FnWorkload(_events_dau_wau, _EVENTS_DAU_WAU_SQL)


# ------------------------------------------- trailing-week range frame --


def _events_trailing_week_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, day): that user's event count and exact value sum over
    the TRAILING 7 days — the interval RANGE-frame window (`RANGE
    BETWEEN 6 days PRECEDING AND CURRENT ROW`), the per-key analog of
    the corpus-wide DAU/WAU reformulation.

    Here the range frame IS the scale-correct plan: the window
    partitions by user (one keyed shuffle), each partition sorts its own
    bounded day list, and Spark evaluates the sliding frame
    incrementally — no self-join, no explode needed because the frame is
    per-user (the DAU/WAU case needed the explode only because its
    distinct-count is NOT decomposable per user). Spark range frames
    need a numeric ordering column, so the day orders by epoch-day long;
    the DuckDB mirror uses the identical integer frame. The sum is a
    pre-aggregated per-day DECIMAL (exact), summed again by the frame —
    decimal addition is associative, so frame order cannot perturb it."""
    events = load_table(spark, sf_dir, "events")
    daily = (
        events.select(
            "user_id",
            F.date_trunc("day", F.col("ts")).alias("day"),
            F.col("value"),
        )
        .groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_day"),
            F.sum(F.col("value").cast(_DEC)).alias("v_day"),
        )
        .withColumn(
            "epoch_day", (F.unix_timestamp("day") / F.lit(86400.0)).cast("long")
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("epoch_day")
        .rangeBetween(-6, Window.currentRow)
    )
    return daily.select(
        "user_id",
        "day",
        F.sum("n_day").over(w).alias("n_week"),
        F.round(F.sum("v_day").over(w), 6).cast("double").alias("v_week"),
    )


_EVENTS_TRAILING_WEEK_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
         count(*) AS n_day,
         sum(CAST(value AS DECIMAL(38,12))) AS v_day,
         CAST(epoch(CAST(date_trunc('day', ts) AS TIMESTAMP)) / 86400
              AS BIGINT) AS epoch_day
  FROM ev GROUP BY user_id, CAST(date_trunc('day', ts) AS TIMESTAMP)
)
SELECT user_id, day,
       CAST(sum(n_day) OVER w AS BIGINT) AS n_week,
       CAST(round(sum(v_day) OVER w, 6) AS DOUBLE) AS v_week
FROM daily
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_day
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
""".strip()


TREND_QUERIES["events_trailing_week_sum"] = FnWorkload(
    _events_trailing_week_sum, _EVENTS_TRAILING_WEEK_SQL
)


# ------------------------------------------------ last-touch attribution --


def _events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: every purchase credits the
    user's most recent NON-purchase event within the trailing 7 days
    (ties broken by event_id); purchases with no qualifying touch are
    'direct'. Output: per attributed channel, conversion count and the
    exact purchase-value sum.

    The carry is the ignore-nulls running window — `last(non-purchase
    row) OVER (user ORDER BY ts, id ROWS UNBOUNDED PRECEDING TO 1
    PRECEDING)` — one keyed shuffle, evaluated incrementally per
    partition; both engines implement identical IGNORE NULLS frame
    semantics, and the two carried fields (type, ts) come from the same
    row because both windows ignore nulls over the same predicate. The
    final aggregation lands on the ≤|event_types|+1 channel space."""
    events = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    non_purchase = F.col("event_type") != "purchase"
    touch_type = F.last(
        F.when(non_purchase, F.col("event_type")), ignorenulls=True
    ).over(w)
    touch_ts = F.last(
        F.when(non_purchase, F.col("ts")), ignorenulls=True
    ).over(w)
    pur = (
        events.select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
            "value",
            touch_type.alias("_tt"),
            touch_ts.alias("_tts"),
        )
        .filter(F.col("event_type") == "purchase")
    )
    channel = F.when(
        F.col("_tts").isNull()
        | (F.col("_tts") < F.col("ts") - F.expr("INTERVAL 7 DAYS")),
        F.lit("direct"),
    ).otherwise(F.col("_tt"))
    return pur.groupBy(channel.alias("channel")).agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.round(F.sum(F.col("value").cast(_DEC)), 6)
        .cast("double")
        .alias("attributed_value"),
    )


_EVENTS_ATTRIBUTION_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
carried AS (
  SELECT user_id, ts, event_id, event_type, value,
         last_value(CASE WHEN event_type <> 'purchase' THEN event_type END
                    IGNORE NULLS) OVER w AS tt,
         last_value(CASE WHEN event_type <> 'purchase' THEN ts END
                    IGNORE NULLS) OVER w AS tts
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
)
SELECT CASE WHEN tts IS NULL OR tts < ts - INTERVAL 7 DAY
            THEN 'direct' ELSE tt END AS channel,
       count(*) AS n_conversions,
       CAST(round(sum(CAST(value AS DECIMAL(38,12))), 6) AS DOUBLE)
         AS attributed_value
FROM carried WHERE event_type = 'purchase'
GROUP BY 1
""".strip()


TREND_QUERIES["events_attribution_last_touch"] = FnWorkload(
    _events_attribution_last_touch, _EVENTS_ATTRIBUTION_SQL
)


def _events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive-active-day streak per user, reported as the
    streak-length distribution — the canonical GAPS-AND-ISLANDS shape:
    distinct (user, day) → row_number per user over days → island key =
    day_index − row_number (constant within a consecutive run) → streak
    lengths → per-user max → histogram. Every step is a keyed shuffle
    on user_id (the islands trick needs no self-join and no global
    sort); the final histogram's key space is ≤ |days in calendar|.
    Day indexes are exact integer datediffs from a pinned epoch, so the
    island keys are bit-identical in both engines."""
    events = load_table(spark, sf_dir, "events")
    days = (
        events.select(
            "user_id",
            F.datediff(
                F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
            ).cast("long").alias("day_idx"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy("day_idx")
    islands = days.select(
        "user_id",
        (F.col("day_idx") - F.row_number().over(w)).alias("island"),
    )
    streaks = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    per_user = streaks.groupBy("user_id").agg(
        F.max("streak_len").alias("max_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )
    return per_user.groupBy("max_streak").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.round(F.avg(F.col("n_streaks").cast("double")), 6).alias(
            "avg_n_streaks"
        ),
    )


_EVENTS_STREAKS_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
days AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS day_idx
  FROM ev
),
islands AS (
  SELECT user_id,
         day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
                                      ORDER BY day_idx) AS island
  FROM days
),
streaks AS (
  SELECT user_id, island, count(*) AS streak_len
  FROM islands GROUP BY user_id, island
),
per_user AS (
  SELECT user_id, max(streak_len) AS max_streak,
         count(*) AS n_streaks
  FROM streaks GROUP BY user_id
)
SELECT max_streak, count(*) AS n_users,
       round(avg(CAST(n_streaks AS DOUBLE)), 6) AS avg_n_streaks
FROM per_user
GROUP BY max_streak
""".strip()


TREND_QUERIES["events_user_streaks"] = FnWorkload(
    _events_user_streaks, _EVENTS_STREAKS_SQL
)


def _events_attribution_time_decay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MULTI-touch attribution with half-life time decay — the
    fractional-credit model last-touch (events_attribution_last_touch)
    approximates: every purchase splits its value across ALL its
    non-purchase touches in the trailing 7 days, weighted
    2^(−floor(age_days)) and normalized per purchase. Numeric-parity
    design: the weights are exact powers of two with integer exponents
    0..6, so weight sums are EXACT in double and the only float steps
    are one correctly-rounded division per touch and the final rounded
    aggregate — no libm pow/exp whose last-ulp behavior could differ
    between engines.

    Execution: purchases ⋈ touches is a per-user range self-join (equi
    on user_id + ts band), the same bounded shape as events_asof_join —
    per-user event counts bound the fan-out, the join shuffles on
    user_id once, and the final aggregate lands on the channel space."""
    events = load_table(spark, sf_dir, "events")
    pur = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("p_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    touch = events.filter(F.col("event_type") != "purchase").select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("t_type"),
        F.col("ts").alias("t_ts"),
    )
    joined = pur.join(
        touch,
        (F.col("p_user") == F.col("t_user"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    )
    age_days = F.floor(
        (
            F.col("p_ts").cast("double") - F.col("t_ts").cast("double")
        )
        / F.lit(86400.0)
    ).cast("int")
    weighted = joined.select(
        "p_id",
        "p_value",
        "t_type",
        F.pow(F.lit(2.0), (-age_days).cast("double")).alias("w"),
    )
    per_pur = Window.partitionBy("p_id")
    credit = weighted.select(
        "t_type",
        (
            F.col("p_value").cast("double")
            * F.col("w")
            / F.sum("w").over(per_pur)
        ).alias("credit"),
    )
    return credit.groupBy(F.col("t_type").alias("channel")).agg(
        F.round(F.sum("credit"), 4).alias("attributed_value"),
        F.count(F.lit(1)).alias("n_touchpoints"),
    )


_EVENTS_TIME_DECAY_SQL = f"""
WITH ev AS ({_EVENTS_CTE}),
joined AS (
  SELECT p.event_id AS p_id, p.value AS p_value, t.event_type AS t_type,
         pow(2.0, -CAST(floor((epoch(p.ts) - epoch(t.ts)) / 86400.0)
                        AS INT)) AS w
  FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
  JOIN (SELECT * FROM ev WHERE event_type <> 'purchase') t
    ON p.user_id = t.user_id
   AND t.ts < p.ts AND t.ts >= p.ts - INTERVAL 7 DAY
),
credits AS (
  SELECT t_type,
         CAST(p_value AS DOUBLE) * w
           / sum(w) OVER (PARTITION BY p_id) AS credit
  FROM joined
)
SELECT t_type AS channel,
       round(sum(credit), 4) AS attributed_value,
       count(*) AS n_touchpoints
FROM credits
GROUP BY t_type
""".strip()


TREND_QUERIES["events_attribution_time_decay"] = FnWorkload(
    _events_attribution_time_decay, _EVENTS_TIME_DECAY_SQL
)
