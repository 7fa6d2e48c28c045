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


def run(
    spark,
    aqe: bool,
    salted: bool,
    skew_threshold_mb: int | None = None,
    validate: bool = False,
):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
    if skew_threshold_mb is not None:
        # make AQE's runtime split FIRE at local scale: skew detection
        # reads COMPRESSED map-output sizes, and this synthetic hot
        # partition (288 MB raw, one repeated key) lz4-compresses well
        # under the 256 MB default threshold — so lower it. At 100 TB a
        # real hot partition is tens of GB even compressed and the
        # DEFAULT threshold catches it. (Separate finding, measured in
        # SCALE.md: when a SAME-KEY groupBy follows the join, the final
        # aggregate plans into the join stage and REQUIRES its hash
        # distribution, so the split never applies — that regime is
        # exactly where the manual salt is the only lever.)
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
    # GLOBAL aggregation over the join output: every leg computes the
    # identical scalars, and no keyed shuffle follows the join (a
    # same-key groupBy would plan its final aggregate INTO the join
    # stage, pinning the hot key to one task and suppressing AQE's
    # split — see the threshold comment above and SCALE.md)
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    if validate:
        # correctness once per leg (untimed): identical join cardinality
        assert agg.collect()[0]["n"] == N
        return 0.0
    # ONE action per timing — a second action re-executes the whole
    # join and doubles every leg, drowning the strategy deltas
    _, sec = timed(agg.collect)
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
        # 8 MB: the ~288 MB-raw hot partition lz4-compresses to ~10-25 MB
        # in the map-output stats the detector reads, so the threshold
        # must sit below THAT, not below the raw size
        ("plain_aqe_split", True, False, 8),
        ("salted_noaqe", False, True, None),
    ):
        # warm pass doubles as the correctness check (codegen + page cache)
        run(spark, aqe, salted, thresh, validate=True)
        results[name] = min(
            run(spark, aqe, salted, thresh), run(spark, aqe, salted, thresh)
        )
    print(json.dumps({"n_rows": N, "hot_frac": HOT_FRAC, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
