"""SparkSession factory with scale-aware defaults.

Local-mode testing (`local[N]`) but configured the way the engine should run
on a real cluster: AQE on (runtime re-plan, skew-join handling, partition
coalescing), Arrow enabled for the few Pandas-UDF paths, shuffle partitions
sized to the parallelism at hand rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "dynamicqueryengine_spark",
    cpus: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = cpus or os.environ.get("SPARK_GRAFT_CPUS") or "*"
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cpus == "*" else max(int(cpus), 4)
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # default-on under AQE, pinned explicitly: runtime splitting of
        # skewed join partitions is a load-bearing 100 TB behavior, not
        # an accident of defaults (operators/skew.py documents when
        # manual salting is still required — aggregation skew and
        # both-sides-huge joins)
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # local mode runs executors, broadcasts, and driver state in ONE
        # JVM heap; 8g measured 2-3× query-time inflation late in a
        # 77-query bench session (GC pressure, not engine cost). On a real
        # cluster this setting is per-daemon and modest heaps are fine.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "32g"))
        # the generated-class cache defaults to 100 entries; a session
        # running ~77 distinct queries × several codegen units each cycles
        # the LRU completely, so every re-run pays janino + JIT again
        # (measured ~3s first-execution vs ~0.5s warm for one window+regex
        # plan). Static conf — must be set before the session exists.
        .config("spark.sql.codegen.cache.maxEntries", "4096")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
