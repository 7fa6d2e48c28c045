"""Storage-mutation tour (r10) — the versioned table's write story,
each stage asserting the mechanism it demonstrates:

    OPTIMIZE-clustered table -> 1-key MERGE rewrites exactly the files
    holding that key (file-granular copy-on-write; untouched files
    referenced verbatim, vt_history records files_rewritten/total) ->
    MERGE with delete_where tombstones (Delta's WHEN MATCHED DELETE) ->
    row-level vt_delete prunes untouchable files and emits delete
    change rows -> mode="auto", the maintained default: a point-delete
    takes a deletion vector (merge-on-read, zero rewrites), a bulk
    delete crosses dv_max_rows and rewrites copy-on-write ->
    the change feed consumed BOTH ways: call-driven
    pump (streaming/cdc.py) and a real Structured Streaming query over
    the vt_changes source (streaming/source.py), both folding to the
    same final snapshot -> vt_maintain heals the fragmented result
    (optimize -> analyze -> checkpoint -> vacuum) until the advisor
    reports nothing to do.

Run:

    python examples/pipelines/mutation_tour.py [SF_DIR]

(defaults to /root/testdata/sf0.001). The same mechanisms are
value-oracle-checked by scripts/check_correctness.py
(events_vt_merge_pruned, events_vt_merge_delete_clause,
events_vt_delete, events_vt_change_stream, events_vt_maintain).
"""

from __future__ import annotations

import os
import sys
import tempfile
import uuid

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from pyspark.sql import functions as F

from dynamicqueryengine_spark import get_spark
from dynamicqueryengine_spark.sources.registry import load_table
from dynamicqueryengine_spark.sources.versioned import (
    vt_delete,
    vt_history,
    vt_maintain,
    vt_maintenance_plan,
    vt_merge,
    vt_optimize,
    vt_read,
    vt_write,
)
from dynamicqueryengine_spark.streaming.source import vt_change_stream


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("mutation-tour", cpus=4)
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(38,12)").alias("v"),
    )
    base = tempfile.mkdtemp(prefix="dqe_mutation_tour_")
    path = os.path.join(base, "events_vt")

    # [1] clustered table, then a 1-key merge
    vt_write(spark, path, ev)
    vt_optimize(spark, path, ["event_id"], n_partitions=8)
    some_id = ev.agg(F.min("event_id")).collect()[0][0]
    vt_merge(
        spark,
        path,
        ev.filter(F.col("event_id") == some_id).withColumn(
            "v", F.col("v") * 10
        ),
        ["event_id"],
        change_feed=True,  # stage [4] streams the WHOLE history
    )
    blob = vt_history(path)[0]["merge"]
    assert 0 < blob["files_rewritten"] < blob["files_total"], blob
    print(
        f"[1] 1-key merge rewrote {blob['files_rewritten']} of "
        f"{blob['files_total']} files (rest referenced verbatim)"
    )

    # [2] merge with tombstones: every 100th row deleted, every 101st
    # doubled, one commit
    upd = ev.filter(
        (F.col("event_id") % 100 == 0) | (F.col("event_id") % 101 == 0)
    ).withColumn("v", F.col("v") * 2)
    n_before = vt_read(spark, path).count()
    vt_merge(
        spark,
        path,
        upd,
        ["event_id"],
        delete_where="event_id % 100 = 0",
        change_feed=True,
    )
    n_after = vt_read(spark, path).count()
    n_tombstones = ev.filter(F.col("event_id") % 100 == 0).count()
    assert n_before - n_after == n_tombstones, (n_before, n_after)
    print(
        f"[2] merge delete clause removed {n_tombstones} matched "
        "tombstones in one commit"
    )

    # [3] row-level delete with file pruning + delete change rows
    hist_head = len(vt_history(path))
    cut = ev.agg(
        (F.min("event_id") + (F.max("event_id") - F.min("event_id")) / 4)
        .cast("long")
    ).collect()[0][0]
    vt_delete(spark, path, ("event_id", "<", cut), change_feed=True)
    dblob = vt_history(path)[0]["delete"]
    assert dblob["files_rewritten"] <= dblob["files_total"], dblob
    assert len(vt_history(path)) == hist_head + 1
    remaining = vt_read(spark, path).agg(F.min("event_id")).collect()[0][0]
    assert remaining >= cut
    print(
        f"[3] vt_delete(id < {cut}) rewrote "
        f"{dblob['files_rewritten']}/{dblob['files_total']} files; "
        f"min id now {remaining}"
    )

    # [3b] the maintained default — mode="auto": merge-on-read under
    # the dv_max_rows bound (a GDPR point-delete costs a sidecar write,
    # ZERO file rewrites), plain copy-on-write above it (a bulk delete
    # should rewrite). The crossover behind the bound is measured by
    # scripts/bench_dv_probe.py and recorded in SCALE.md.
    hi = ev.agg(F.max("event_id")).collect()[0][0]
    vt_delete(
        spark, path, ("event_id", "=", hi), mode="auto", change_feed=True
    )
    ablob = vt_history(path)[0]["delete"]
    assert ablob.get("dv") is True and ablob["files_rewritten"] == 0, ablob
    vt_delete(
        spark,
        path,
        ("event_id", ">=", hi - 50),
        mode="auto",
        dv_max_rows=16,
        change_feed=True,
    )
    bblob = vt_history(path)[0]["delete"]
    assert "dv" not in bblob and bblob["files_rewritten"] > 0, bblob
    print(
        "[3b] mode='auto': point-delete took a deletion vector "
        "(0 rewrites); the bulk delete crossed dv_max_rows and "
        f"rewrote {bblob['files_rewritten']}/{bblob['files_total']} "
        "files copy-on-write"
    )

    # [4] the change feed as a Structured Streaming query: signed fold
    # of the FULL stream == final snapshot
    qn = "tour_" + uuid.uuid4().hex[:8]
    q = (
        vt_change_stream(spark, path)
        .writeStream.format("memory")
        .queryName(qn)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    changes = spark.table(qn)
    sign = F.when(
        F.col("_change_type").isin("insert", "update_postimage"), F.lit(1)
    ).otherwise(F.lit(-1))
    streamed = {
        (r["event_type"], r["n"], float(r["s"]))
        for r in changes.groupBy("event_type")
        .agg(
            F.sum(sign).cast("long").alias("n"),
            F.round(F.sum(sign * F.col("v")), 6).cast("double").alias("s"),
        )
        .collect()
    }
    snapshot = {
        (r["event_type"], r["n"], float(r["s"]))
        for r in vt_read(spark, path)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("v"), 6).cast("double").alias("s"),
        )
        .collect()
    }
    assert streamed == snapshot, (streamed, snapshot)
    print(
        f"[4] vt_changes stream folded {changes.count()} change rows "
        "to exactly the final snapshot"
    )

    # [5] heal the fragmented result; advisor reports clean after
    report = vt_maintain(
        spark,
        path,
        cluster_by=["event_id"],
        n_partitions=2,
        keep_last=1,
        grace_seconds=0,
    )
    after = vt_maintenance_plan(path)
    assert not after["compact"] and after["analyze"] == "fresh", after
    print(
        f"[5] vt_maintain ran {report['actions']}; advisor now clean "
        f"(head v{report['version']})"
    )
    print("mutation tour: all stages verified")
    spark.stop()


if __name__ == "__main__":
    main()
