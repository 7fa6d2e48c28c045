#!/usr/bin/env python
"""Deletion-vector read-overhead probe (r11): stage a 2M-row versioned
table OPTIMIZEd into 16 files, then measure the full-scan aggregate
wall time as accumulated DV size grows (0 / 1k / 10k / 100k vectored
positions — 100k is the default ``dv_max_rows`` write cap). The read
applies vectors via a broadcast hash LEFT ANTI join, so the expected
shape is a small constant plus a term linear in |DV| (broadcast build),
NOT in table size. Also reports the DV DELETE commit times themselves.

Prints one JSON line; numbers recorded in SCALE.md.

``accumulate`` mode (r12, the r11 verdict's ask #6): instead of three
big deletes, take N successive SINGLE-ROW DV commits spread across the
table's files — the steady GDPR point-delete pattern — and at
milestone commit counts (10 / 100 / 1000) record (a) the number of
live sidecars a scan plan must open, (b) scan-PLAN build wall time
(the driver-side vt_read call: manifest + sidecar loads), (c) full-
scan read wall time, and (d) the same three after
``vt_checkpoint(consolidate_dv=True)``. This is the evidence base for
the two r12 fan-out bounds: the in-commit auto-fold at
``_DV_CONSOLIDATE_REFS`` live refs and the checkpoint roll-up to one —
plan build should stay FLAT in N, not linear.

    python scripts/bench_dv_probe.py accumulate
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


ACC_ROWS = int(os.environ.get("DV_PROBE_ACC_ROWS", 200_000))
ACC_COMMITS = int(os.environ.get("DV_PROBE_ACC_COMMITS", 1_000))
ACC_MILESTONES = (10, 100, 1_000)


def _live_refs(path: str) -> int:
    from dynamicqueryengine_spark.sources.versioned import (
        _read_manifest,
        vt_head,
    )

    dv = _read_manifest(path, vt_head(path)).get("dv") or {}
    return len({e["ref"] for fmap in dv.values() for e in fmap.values()})


def _plan_and_read(spark, path) -> tuple[float, float]:
    plan_sec = []
    read_sec = []
    for _ in range(3):
        t0 = time.perf_counter()
        df = vt_read(spark, path)
        plan_sec.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        df.agg(F.sum("x")).collect()
        read_sec.append(time.perf_counter() - t0)
    return round(min(plan_sec), 4), round(min(read_sec), 4)


def accumulate() -> None:
    from dynamicqueryengine_spark.sources.versioned import vt_checkpoint

    spark = get_spark(
        "dv-accumulate",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="dvacc_")
    path = os.path.join(root, "t")
    try:
        df = spark.range(ACC_ROWS).selectExpr(
            "id", "CAST(id % 97 AS DOUBLE) AS x"
        )
        vt_write(spark, path, df)
        vt_optimize(spark, path, ["id"], n_partitions=16)
        timed_read(spark, path)  # warm
        out = {
            "rows": ACC_ROWS,
            "files": 16,
            "commits": ACC_COMMITS,
            "milestones": {},
        }
        # spread the point-deletes across the 16 range-clustered files
        # (a stride coprime to ROWS visits every id exactly once)
        stride = 77_773  # prime, > ROWS/16 so consecutive ids hop files
        commit_sec = 0.0
        n = 0
        for milestone in ACC_MILESTONES:
            if milestone > ACC_COMMITS:
                break
            while n < milestone:
                target = (n * stride) % ACC_ROWS
                t0 = time.perf_counter()
                vt_delete(spark, path, ("id", "=", target), mode="dv")
                commit_sec += time.perf_counter() - t0
                n += 1
            plan_s, read_s = _plan_and_read(spark, path)
            ms = {
                "live_refs": _live_refs(path),
                "plan_sec": plan_s,
                "read_sec": read_s,
                "mean_commit_sec": round(commit_sec / n, 4),
            }
            t0 = time.perf_counter()
            vt_checkpoint(spark, path, consolidate_dv=True)
            ms["consolidate_sec"] = round(time.perf_counter() - t0, 4)
            plan_s, read_s = _plan_and_read(spark, path)
            ms["after_consolidate"] = {
                "live_refs": _live_refs(path),
                "plan_sec": plan_s,
                "read_sec": read_s,
            }
            out["milestones"][str(n)] = ms
        assert vt_count(spark, path) == ACC_ROWS - n
        print(json.dumps(out), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "accumulate":
        accumulate()
    else:
        main()
