"""Small shared utilities."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, multiplier: int = 1) -> DataFrame:
    """Repartition a (narrow) input to cluster parallelism before per-row
    heavy compute (shingle explode, regex batteries, Arrow decode).

    A small table read from one Parquet file arrives as ONE partition —
    every downstream map runs on one core. The round-robin shuffle of the
    narrow input costs almost nothing and unlocks full parallelism for the
    expensive projection that follows. At 100 TB inputs arrive with
    thousands of splits and this is a no-op-sized safeguard, not a cost.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism * multiplier
    if df.rdd.getNumPartitions() >= parallelism:
        return df
    return df.repartition(parallelism)
