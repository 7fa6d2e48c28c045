"""Structured Streaming rule evaluation (SURVEY.md §7 Phase 4).

The reference has no streaming at all (SURVEY.md §2.5); this module runs the
SAME compiled rule predicates over unbounded sources — the rule compiler is
batch/stream agnostic because it only builds ``Column`` expressions.

Patterns provided:

* :func:`apply_rule_stream` — filter a stream with a rule document
  (stateless; identical semantics to the batch path).
* :func:`windowed_rule_counts` — watermarked tumbling-window counts of
  rule matches (stateful; late rows beyond the watermark are dropped).
* :func:`stream_events` — file-source stream over the driver's events
  parquet (nanos→µs normalization applied, same as the batch loader).

At scale: watermarks bound state; the shuffle is keyed by (window, keys);
``spark.sql.shuffle.partitions`` sizes the state store spread.
"""

from __future__ import annotations

import os
from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..operators.predicates import compile_predicate
from ..plans.model import RuleDefinition
from ..plans.validate import validate_rule

EVENTS_SCHEMA_DDL = (
    "event_id LONG, ts LONG, user_id LONG, event_type STRING, "
    "value DOUBLE, props STRING"
)


def stream_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """readStream over the events parquet directory (file source). The
    schema must be pinned (streams can't infer), but the footer's ``ts``
    physical type varies by testdata generation — INT64 nanos vs plain µs
    timestamp — so probe it with a batch footer read (metadata only, no
    scan) and normalize nanos to a µs timestamp exactly like the batch
    loader."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import os

    batch_ts = dict(
        spark.read.parquet(os.path.join(sf_dir, "events.parquet")).dtypes
    )["ts"]
    nanos = batch_ts == "bigint"
    ts_ddl = "ts LONG" if nanos else "ts TIMESTAMP_NTZ"
    schema = EVENTS_SCHEMA_DDL.replace("ts LONG", ts_ddl)
    # the file source needs a directory; events.parquet is a single file —
    # stream the parent dir with a glob filter selecting just that file
    raw = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    if nanos:
        raw = raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    return raw


def apply_rule_stream(
    stream: DataFrame,
    rule: RuleDefinition | Mapping[str, Any],
    external_params: Mapping[str, Any] | None = None,
    strict_compat: bool = True,
) -> DataFrame:
    """Stateless rule filter on a streaming DataFrame — same compile path
    as batch ``apply_rule`` (aggregation is handled by the windowed variant
    because streams need watermarked, windowed aggregates)."""
    if not isinstance(rule, RuleDefinition):
        rule = RuleDefinition.from_dict(rule)
    validate_rule(rule, stream.schema)
    if rule.conditions is None or rule.conditions.is_empty():
        return stream
    return stream.filter(
        compile_predicate(rule.conditions, stream.schema, external_params, strict_compat)
    )


def windowed_rule_counts(
    stream: DataFrame,
    rule: RuleDefinition | Mapping[str, Any],
    ts_col: str = "ts",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
    keys: Sequence[str] = ("event_type",),
    external_params: Mapping[str, Any] | None = None,
) -> DataFrame:
    """Tumbling (or, with ``slide``, sliding/hopping) window counts of rule
    matches with late-data handling: watermark bounds state size; output
    schema (window_start, window_end, *keys, matches)."""
    filtered = apply_rule_stream(stream, rule, external_params)
    return (
        filtered.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window, slide or window), *keys)
        .agg(F.count(F.lit(1)).alias("matches"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *keys,
            "matches",
        )
    )


class scoped_state_partitions:
    """Temporarily set ``spark.sql.shuffle.partitions`` around a streaming
    query start. For STREAMING this conf does double duty: it fixes the
    number of state-store instances for the query's lifetime. Batch sizing
    (≈ cores) is wrong for small-keyspace streams — each microbatch pays
    per-instance overhead for mostly-empty stores — so size to expected
    key cardinality instead. The conf is captured at query START, so a
    scoped set/restore affects only the query begun inside the block."""

    def __init__(self, spark: SparkSession, n: int):
        self.spark, self.n = spark, n

    def __enter__(self):
        self._old = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set("spark.sql.shuffle.partitions", str(self.n))
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self._old)
        return False


# Per-sink progress of the most recent drain: {table: {"batches", "compute_ms"}}.
# ``compute_ms`` sums each micro-batch's triggerExecution duration — the
# engine's own measure of work done, excluding stream planning / sink setup /
# await polling. The bench harness reads this to report compute-only time
# for the events_stream_* queries alongside wall clock (micro-batch startup
# amortizes on a real unbounded stream, so wall clock alone overstates the
# steady-state cost of a finite availableNow drain).
STREAM_PROGRESS: dict[str, dict] = {}


def run_stream_to_memory(
    query_df: DataFrame, table_name: str, output_mode: str = "append"
) -> None:
    """Drain a (finite file-source) stream into an in-memory sink with the
    availableNow trigger — the test/verification harness for streaming
    pipelines; production sinks swap in Kafka/Delta via the same writer."""
    query = (
        query_df.writeStream.format("memory")
        .queryName(table_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    progress = query.recentProgress
    STREAM_PROGRESS[table_name] = {
        "batches": len(progress),
        "compute_ms": sum(
            (p.get("durationMs") or {}).get("triggerExecution", 0)
            for p in progress
        ),
    }
