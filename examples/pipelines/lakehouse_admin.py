"""Lakehouse-administration tour — the metadata-driven operations a
table owner runs WITHOUT scanning data, each stage a tested component:

    fragmented streaming ingest -> maintenance advisor flags compaction
    (vt_maintenance_plan, metadata-only) -> OPTIMIZE compacts + tightens
    per-file stats -> ANALYZE records optimizer statistics (vt_analyze)
    -> the cost-based join advisor picks broadcast from manifest bytes
    (vt_join_plan / vt_join) -> TIMESTAMP AS OF time travel back to the
    fragmented snapshot -> zero-copy shallow CLONE branches the table
    for a what-if merge -> vacuum reclaims exactly what the advisor
    estimated

Run:

    python examples/pipelines/lakehouse_admin.py [SF_DIR]

(defaults to /root/testdata/sf0.01). The advisor decisions, the
stats-driven join, and the clone isolation are value-oracle-checked by
scripts/check_correctness.py (events_vt_maintenance_plan,
join_vt_stats_advisor, events_vt_clone_branch); the vacuum-estimate
equality and plan pins live in tests/test_stats_join.py and
tests/test_versioned.py.
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from pyspark.sql import functions as F

from dynamicqueryengine_spark import get_spark
from dynamicqueryengine_spark.sources.registry import load_table
from dynamicqueryengine_spark.sources.versioned import (
    vt_analyze,
    vt_clone,
    vt_count,
    vt_join,
    vt_join_plan,
    vt_maintenance_plan,
    vt_merge,
    vt_optimize,
    vt_read,
    vt_table_stats,
    vt_vacuum,
    vt_write,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lakehouse-admin", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    root = tempfile.mkdtemp(prefix="lakehouse_admin_")
    facts = os.path.join(root, "facts")
    dim = os.path.join(root, "dim")

    # 0. adopt an existing parquet lake ZERO-COPY: hard-link the files
    #    into a versioned table, harvest footers, one manifest write —
    #    no Spark job reads the data
    from dynamicqueryengine_spark.sources.versioned import vt_convert

    lake = os.path.join(root, "lake_src")
    ev.limit(2000).write.parquet(lake)
    adopted = os.path.join(root, "adopted")
    vt_convert(spark, lake, adopted)
    n_adopted = vt_count(spark, adopted)  # answered from footers
    assert n_adopted == spark.read.parquet(lake).count()
    print(
        f"[0] vt_convert adopted {n_adopted} rows zero-copy "
        "(hard links + footer harvest; vt_count needs no scan)"
    )

    # 1. a streaming-style ingest: four small appends fragment the table
    for i in range(4):
        vt_write(
            spark,
            facts,
            ev.filter(F.col("event_id") % 4 == i),
            mode="append" if i else "overwrite",
        )
    t_fragmented = time.time()
    plan = vt_maintenance_plan(facts)
    print(
        f"[1] after 4 appends: {plan['files_total']} files in "
        f"{plan['dirs']} dirs -> compact={plan['compact']}, "
        f"analyze={plan['analyze']!r}"
    )
    assert plan["compact"] and plan["analyze"] == "missing"

    # 2. run the maintenance it prescribed
    vt_optimize(spark, facts, ["event_id"], n_partitions=1)
    vt_analyze(spark, facts, columns=["event_type"])
    after = vt_maintenance_plan(facts, small_file_bytes=1)
    print(
        f"[2] post OPTIMIZE+ANALYZE: compact={after['compact']}, "
        f"analyze={after['analyze']!r}, rows={vt_count(spark, facts)}"
    )
    assert not after["compact"] and after["analyze"] == "fresh"

    # 3. stats-driven join: the dim table is kilobytes -> broadcast
    vt_write(
        spark,
        dim,
        ev.select("event_type")
        .distinct()
        .withColumn("label", F.upper("event_type")),
    )
    decision = vt_join_plan(facts, dim, ["event_type"])
    st = vt_table_stats(facts)
    print(
        f"[3] join advisor: facts={st['bytes']}B vs "
        f"dim={decision['right_bytes']}B -> {decision['strategy']} "
        f"(build={decision.get('build_side')})"
    )
    assert decision["strategy"] == "broadcast"
    joined = vt_join(spark, facts, dim, ["event_type"])
    agg = (
        joined.groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label")
    )
    print("[3] per-label counts:")
    agg.show(10, truncate=False)

    # 4. TIMESTAMP AS OF: read the table as it was while still fragmented
    frag = vt_read(spark, facts, timestamp=t_fragmented)
    print(f"[4] AS OF pre-OPTIMIZE timestamp: {frag.count()} rows (same)")
    assert frag.count() == vt_count(spark, facts)

    # 5. zero-copy branch: what-if merge on a shallow clone
    branch = os.path.join(root, "branch")
    vt_clone(spark, facts, branch)
    vt_merge(
        spark,
        branch,
        ev.filter(F.col("event_id") % 10 == 3).withColumn(
            "value", F.col("value") * 2
        ),
        ["event_id"],
    )
    src_sum = vt_read(spark, facts).agg(F.sum("value")).collect()[0][0]
    br_sum = vt_read(spark, branch).agg(F.sum("value")).collect()[0][0]
    print(
        f"[5] clone branch diverged: source sum={src_sum:.2f}, "
        f"branch sum={br_sum:.2f} (source untouched)"
    )
    assert br_sum > src_sum

    # 6. vacuum reclaims exactly what the advisor estimated
    est = vt_maintenance_plan(facts, keep_last=2)["vacuum"]
    removed = vt_vacuum(spark, facts, keep_last=2, grace_seconds=0)
    print(
        f"[6] vacuum: advisor estimated {len(est['dirs'])} dirs / "
        f"{est['bytes']}B, removed {len(removed)} dirs"
    )
    assert sorted(removed) == est["dirs"]

    # 7. GDPR one-row delete, merge-on-read: a deletion vector instead
    #    of a file rewrite; OPTIMIZE later materializes it
    from dynamicqueryengine_spark.sources.versioned import (
        vt_delete,
        vt_history,
    )

    victim = vt_read(spark, facts).select("event_id").first()["event_id"]
    n_before = vt_count(spark, facts)
    vt_delete(spark, facts, ("event_id", "=", victim), mode="dv")
    h = vt_history(facts)[0]
    print(
        f"[7] dv delete: files_rewritten={h['delete']['files_rewritten']}, "
        f"vector hides {h['dv']['rows']} row(s) in {h['dv']['files']} "
        f"file(s); metadata count {n_before} -> {vt_count(spark, facts)}"
    )
    assert h["delete"]["files_rewritten"] == 0
    assert vt_count(spark, facts) < n_before
    vt_optimize(spark, facts, ["event_id"], n_partitions=4)
    assert "dv" not in vt_history(facts)[0]
    print("[7] optimize materialized the vector (dv debt back to zero)")

    # 8. schema DDL without touching a byte of data: RENAME COLUMN
    #    (column mapping), TYPE WIDENING, then DESCRIBE DETAIL shows the
    #    evolved state — all metadata-only commits on the same files
    from dynamicqueryengine_spark.sources.versioned import (
        _read_manifest,
        vt_describe,
        vt_head,
        vt_rename_column,
        vt_widen_column,
    )

    from dynamicqueryengine_spark.sources.versioned import vt_add_column

    dirs_before = _read_manifest(facts, vt_head(facts))["dirs"]
    vt_rename_column(facts, "value", "amount")
    vt_add_column(facts, "priority", "int")
    vt_widen_column(facts, "priority", "bigint")
    detail = vt_describe(facts)
    assert _read_manifest(facts, vt_head(facts))["dirs"] == dirs_before
    assert detail["properties"]["column_mapping"]["amount"] == "value"
    ptype = next(
        f["type"]
        for f in detail["schema"]["fields"]
        if f["name"] == "priority"
    )
    assert ptype == "long"
    n_after_ddl = vt_count(spark, facts)
    total = (
        vt_read(spark, facts).agg({"amount": "sum"}).collect()[0][0]
    )
    print(
        f"[8] rename+add+widen were metadata-only (same "
        f"{len(dirs_before)} dirs); reads serve 'amount' + a bigint "
        f"'priority' ({n_after_ddl} rows, sum={total:.2f})"
    )
    # 9. atomic day backfill (replaceWhere): drop the old day's
    #    partition directory METADATA-ONLY and land the recomputed day
    #    — ONE commit, no reader ever sees the day missing
    from dynamicqueryengine_spark.sources.versioned import (
        vt_replace_where,
    )

    days = os.path.join(root, "days")
    by_day = ev.select(
        "event_id",
        F.concat(
            F.lit("d"), (F.col("event_id") % 5).cast("string")
        ).alias("day"),
        "value",
    )
    vt_write(spark, days, by_day, partition_by=["day"])
    recomputed = by_day.filter(F.col("day") == "d3").withColumn(
        "value", F.col("value") * 2
    )
    v = vt_replace_where(spark, days, recomputed, "day = 'd3'")
    blob = _read_manifest(days, v)["replace_where"]
    assert blob["files_rewritten"] == 0 and blob["dirs_dropped"] == 1
    new_d = blob["new_dirs"][0]
    assert _read_manifest(days, v)["partitions"][new_d] == {
        "day": "d3"
    }
    print(
        f"[9] replaceWhere backfill of day d3: dropped "
        f"{blob['files_dropped']} file(s) metadata-only "
        f"(files_rewritten=0), landed the recomputed day as a valued "
        "partition dir — one atomic commit"
    )
    print("lakehouse-admin tour: all stages verified")


if __name__ == "__main__":
    main()
