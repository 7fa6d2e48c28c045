#!/usr/bin/env python
"""Skewed-join demonstration (r4 verdict stretch ask #9): measure the
same hot-key join three ways on a synthetic skewed fact table —

1. plain sort-merge join, AQE OFF  (the naive plan: one reducer gets
   the hot key's entire partition)
2. plain sort-merge join, AQE ON   (Spark's runtime skew-join split)
3. salted_join (operators/skew.py), AQE OFF (the manual lever for when
   both sides are big or AQE can't see the skew)

Fact: N rows, ``hot_frac`` of them on ONE key, remainder uniform over
``n_keys``. Dim: one row per key. Broadcast is disabled so the join
actually shuffles — at 100 TB the dim side of a genuinely skewed join
is rarely broadcastable, which is exactly when salting matters.

Prints one JSON line; numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dynamicqueryengine_spark import get_spark  # noqa: E402
from dynamicqueryengine_spark.operators.skew import salted_join  # noqa: E402

N = int(os.environ.get("SKEW_N", 20_000_000))
N_KEYS = 1000
HOT_FRAC = 0.9


def build(spark):
    # deterministic skew: first 90% of ids land on key 0, rest uniform
    fact = spark.range(N).select(
        F.when(F.col("id") < int(N * HOT_FRAC), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return fact, dim


def timed(fn):
    start = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - start, 2)


def run(spark, aqe: bool, salted: bool, skew_threshold_mb: int | None = None):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
    if skew_threshold_mb is not None:
        # make AQE's runtime split FIRE at local scale: the hot partition
        # here (~300 MB) sits near the 256 MB default threshold, which is
        # exactly the regime where the split is threshold-sensitive; at
        # 100 TB the hot partition is tens of GB and the DEFAULTS split it
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            f"{skew_threshold_mb}MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            f"{max(skew_threshold_mb // 2, 1)}MB",
        )
    else:
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    fact, dim = build(spark)
    if salted:
        joined = salted_join(fact, dim, on=["k"], buckets=16)
    else:
        joined = fact.join(dim.hint("merge"), "k")
    agg = joined.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    (rows, total), sec = timed(lambda: (agg.count(), agg.agg(F.sum("n")).collect()[0][0]))
    assert rows == N_KEYS and total == N, (rows, total)
    return sec


def main() -> None:
    spark = get_spark(
        "skew-bench",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.ui.showConsoleProgress": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for name, aqe, salted, thresh in (
        ("plain_noaqe", False, False, None),
        ("plain_aqe_default", True, False, None),
        ("plain_aqe_split", True, False, 32),  # threshold lowered → split fires
        ("salted_noaqe", False, True, None),
    ):
        run(spark, aqe, salted, thresh)  # warm (codegen + page cache)
        results[name] = min(
            run(spark, aqe, salted, thresh), run(spark, aqe, salted, thresh)
        )
    print(json.dumps({"n_rows": N, "hot_frac": HOT_FRAC, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
