"""Streaming exact-dedup tests (streaming/dedup.py): memory-sink runs
checked against batch DISTINCT twins, plus the watermarked variant."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamicqueryengine_spark.streaming.dedup import (
    stream_dedup_exact,
    stream_dedup_within_watermark,
)
from dynamicqueryengine_spark.streaming.rules import (
    run_stream_to_memory,
    stream_events,
)

SF_DIR = "/root/testdata/sf0.001"


class TestStreamDedup:
    def test_matches_batch_distinct_counts(self, spark):
        from dynamicqueryengine_spark.sources.registry import load_table

        deduped = stream_dedup_exact(
            stream_events(spark, SF_DIR), ["user_id", "event_type"]
        )
        counts = deduped.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        run_stream_to_memory(counts, "t_sd_counts", output_mode="complete")
        got = {
            r["event_type"]: r["n"]
            for r in spark.table("t_sd_counts").collect()
        }

        batch = (
            load_table(spark, SF_DIR, "events")
            .select("user_id", "event_type")
            .distinct()
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        want = {r["event_type"]: r["n"] for r in batch.collect()}
        assert got == want and got

    def test_watermarked_dedup_drops_in_horizon_duplicates(self, spark):
        deduped = stream_dedup_within_watermark(
            stream_events(spark, SF_DIR),
            ["user_id", "event_type"],
            event_time_col="ts",
            delay="10 days",  # horizon covers the whole finite fixture
        )
        run_stream_to_memory(deduped, "t_sd_wm", output_mode="append")
        n = spark.table("t_sd_wm").count()
        from dynamicqueryengine_spark.sources.registry import load_table

        want = (
            load_table(spark, SF_DIR, "events")
            .select("user_id", "event_type")
            .distinct()
            .count()
        )
        assert n == want
