"""Streaming CDC sink: maintain a keyed, incrementally-updated parquet
table from a stream via ``foreachBatch`` + the keyed merge/upsert
writer — the pattern behind every "streaming materialized view"
(running per-entity totals, latest-state tables) when the sink is a
plain columnar directory rather than a transactional table format.

Per micro-batch: aggregate the batch, pull ONLY the touched keys'
current rows (semi-join — the state read is proportional to the batch's
key set, not the table), combine, and merge_upsert the combined rows.
Sums accumulate in DECIMAL(38,12) in the stored state so cross-batch
addition is exact and the final table is value-oracle-checkable against
a one-shot batch aggregation.

At production scale the same ``foreachBatch`` body targets Delta/Iceberg
MERGE INTO; bounded per-batch work and key-proportional state reads are
the properties that survive the swap.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..sources.writers import merge_upsert

__all__ = ["stream_upsert_totals"]

_DEC = "decimal(38,12)"


def stream_upsert_totals(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    key_col: str = "user_id",
    value_col: str = "value",
) -> None:
    """Drain ``stream_df`` (finite file source, availableNow) into a
    keyed totals table at ``path``: one row per key with n_events and an
    exact decimal running sum, upserted per micro-batch."""
    spark = stream_df.sparkSession

    def upsert_batch(batch_df: DataFrame, batch_id: int) -> None:
        agg = batch_df.groupBy(key_col).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col(value_col).cast(_DEC)).cast(_DEC).alias("sum_value"),
        )
        if os.path.exists(path):
            current = spark.read.parquet(path).join(
                agg.select(key_col), key_col, "semi"
            )
            agg = (
                current.unionByName(agg)
                .groupBy(key_col)
                .agg(
                    F.sum("n_events").alias("n_events"),
                    F.sum("sum_value").cast(_DEC).alias("sum_value"),
                )
            )
        merge_upsert(spark, path, agg, [key_col])

    query = (
        stream_df.writeStream.foreachBatch(upsert_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
