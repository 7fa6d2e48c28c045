#!/usr/bin/env python
"""Deletion-vector read-overhead probe (r11): stage a 2M-row versioned
table OPTIMIZEd into 16 files, then measure the full-scan aggregate
wall time as accumulated DV size grows (0 / 1k / 10k / 100k vectored
positions — 100k is the default ``dv_max_rows`` write cap). The read
applies vectors via a broadcast hash LEFT ANTI join, so the expected
shape is a small constant plus a term linear in |DV| (broadcast build),
NOT in table size. Also reports the DV DELETE commit times themselves.

Prints one JSON line; numbers recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dynamicqueryengine_spark import get_spark  # noqa: E402
from dynamicqueryengine_spark.sources.versioned import (  # noqa: E402
    vt_count,
    vt_delete,
    vt_optimize,
    vt_read,
    vt_write,
)

ROWS = int(os.environ.get("DV_PROBE_ROWS", 2_000_000))
STEPS = (1_000, 9_000, 90_000)  # cumulative: 1k, 10k, 100k


def timed_read(spark, path) -> float:
    start = time.perf_counter()
    vt_read(spark, path).agg(F.sum("x")).collect()
    return round(time.perf_counter() - start, 4)


def main() -> None:
    spark = get_spark(
        "dv-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dvprobe_")
    path = os.path.join(root, "t")
    try:
        df = spark.range(ROWS).selectExpr(
            "id", "CAST(id % 97 AS DOUBLE) AS x"
        )
        vt_write(spark, path, df)
        vt_optimize(spark, path, ["id"], n_partitions=16)
        out = {"rows": ROWS, "files": 16, "read_sec": {}, "delete_sec": {}}
        # warm + baseline (no vectors)
        timed_read(spark, path)
        out["read_sec"]["dv_0"] = min(
            timed_read(spark, path) for _ in range(3)
        )
        total = 0
        lo = 0
        for step in STEPS:
            t0 = time.perf_counter()
            vt_delete(
                spark,
                path,
                [("id", ">=", lo), ("id", "<", lo + step)],
                mode="dv",
                dv_max_rows=200_000,
            )
            out["delete_sec"][f"plus_{step}"] = round(
                time.perf_counter() - t0, 4
            )
            lo += step
            total += step
            out["read_sec"][f"dv_{total}"] = min(
                timed_read(spark, path) for _ in range(3)
            )
        assert vt_count(spark, path) == ROWS - total
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
