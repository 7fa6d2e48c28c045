"""Streaming exact deduplication — the online twin of the batch
``functions/dedup.py`` exact path: drop re-deliveries / re-crawls of an
already-seen record as they arrive, instead of re-scanning the corpus.

Spark-native shape: ``dropDuplicates`` keeps per-key state in the state
store (first arrival wins). Unbounded streams MUST bound that state —
``dropDuplicatesWithinWatermark`` expires keys once the event-time
watermark passes them, which is the 100 TB-safe configuration: state
holds only the de-dup horizon (e.g. 24h of keys), not history. The
unbounded variant is kept for finite replays/backfills where the whole
key set fits the state store.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame

__all__ = ["stream_dedup_exact", "stream_dedup_within_watermark"]


def stream_dedup_exact(
    stream_df: DataFrame, key_cols: Sequence[str]
) -> DataFrame:
    """First-arrival-wins exact dedup on ``key_cols`` with UNBOUNDED
    per-key state — correct for finite replays; prefer the watermarked
    variant on endless streams."""
    return stream_df.dropDuplicates(list(key_cols))


def stream_dedup_within_watermark(
    stream_df: DataFrame,
    key_cols: Sequence[str],
    event_time_col: str,
    delay: str = "1 hour",
) -> DataFrame:
    """Exact dedup whose state expires with the event-time watermark:
    a key is remembered only while a duplicate could still legally
    arrive (within ``delay``), so state size is bounded by the horizon's
    key cardinality regardless of stream length."""
    return stream_df.withWatermark(
        event_time_col, delay
    ).dropDuplicatesWithinWatermark(list(key_cols))
