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

Replay idempotence: ``foreachBatch`` is at-least-once — a crash between
the merge commit and the checkpoint commit replays the batch. Each
stored row therefore carries ``last_batch_id``, the highest batch that
touched its key, committed ATOMICALLY with the data by the same
copy-on-write swap; on replay, keys whose stored ``last_batch_id`` is
already >= the incoming batch id are excluded from the update set and
keep their current rows, so re-applying a batch is a no-op. (A sidecar
"last batch" file would leave a window between data commit and sidecar
write; a per-key column inside the table has no such window.)

At production scale the same ``foreachBatch`` body targets Delta/Iceberg
MERGE INTO; bounded per-batch work, key-proportional state reads, and
the per-key batch-id guard are the properties that survive the swap.
(``sources/versioned.py`` provides the transaction-log variant of the
same merge — atomic manifest commits, snapshot isolation, time travel —
for sinks that need readable history rather than a single head table;
``events_upsert_time_travel`` executes it.)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..sources.writers import merge_upsert

__all__ = ["stream_upsert_totals", "upsert_batch"]

_DEC = "decimal(38,12)"


def upsert_batch(
    spark,
    path: str,
    batch_df: DataFrame,
    batch_id: int,
    key_col: str = "user_id",
    value_col: str = "value",
) -> None:
    """Apply ONE micro-batch's aggregates to the totals table at
    ``path``, idempotently under at-least-once replay (see module
    docstring). Module-level so the replay contract is directly
    testable outside a streaming query."""
    agg = batch_df.groupBy(key_col).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast(_DEC)).cast(_DEC).alias("sum_value"),
    )
    if os.path.exists(path):
        cur = spark.read.parquet(path)
        if "last_batch_id" not in cur.columns:  # pre-guard tables
            cur = cur.withColumn("last_batch_id", F.lit(-1).cast("long"))
        touched = cur.join(agg.select(key_col), key_col, "semi")
        # keys whose stored row already includes THIS batch (replay):
        # keep their current rows by excluding them from the update set
        done = touched.filter(F.col("last_batch_id") >= batch_id).select(
            key_col
        )
        todo = agg.join(done, key_col, "left_anti")
        prev = touched.filter(F.col("last_batch_id") < batch_id).select(
            key_col, "n_events", "sum_value"
        )
        agg = (
            prev.unionByName(todo.select(key_col, "n_events", "sum_value"))
            .groupBy(key_col)
            .agg(
                F.sum("n_events").alias("n_events"),
                F.sum("sum_value").cast(_DEC).alias("sum_value"),
            )
        )
    merge_upsert(
        spark,
        path,
        agg.withColumn("last_batch_id", F.lit(batch_id).cast("long")),
        [key_col],
    )


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

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        upsert_batch(spark, path, batch_df, batch_id, key_col, value_col)

    query = (
        stream_df.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
