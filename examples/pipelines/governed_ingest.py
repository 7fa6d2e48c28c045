"""Governed-ingest tour — the pre-flight + commit surface a managed
lakehouse table runs on every load, each stage a tested component:

    data-quality contract (constraints.py, Deequ pattern) gates the
    batch -> versioned commit (versioned.py transaction log) -> CDC
    backfill MERGE as a second version -> time-travel audit of both
    snapshots -> vacuum expired versions

Run:

    python examples/pipelines/governed_ingest.py [SF_DIR]

(defaults to /root/testdata/sf0.01). The contract report and the
merge + time-travel behavior are value-oracle-checked by
scripts/check_correctness.py (quality_constraint_report,
events_upsert_time_travel); commit atomicity and snapshot isolation
are pinned by tests/test_versioned.py.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from pyspark.sql import functions as F

from dynamicqueryengine_spark import get_spark
from dynamicqueryengine_spark.functions.constraints import constraint_report
from dynamicqueryengine_spark.sources.registry import load_table
from dynamicqueryengine_spark.sources.versioned import (
    vt_merge,
    vt_read,
    vt_vacuum,
    vt_versions,
    vt_write,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("governed-ingest", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    print("\n=== 1. data-quality contract gates the batch ===")
    report = constraint_report(
        li,
        [
            {"name": "orderkey_complete", "kind": "not_null", "col": "l_orderkey"},
            {"name": "discount_band", "kind": "range", "col": "l_discount",
             "lo": 0.0, "hi": 0.1},
            {"name": "returnflag_domain", "kind": "accepted_values",
             "col": "l_returnflag", "values": ["A", "N", "R"]},
            {"name": "line_pk_unique", "kind": "unique",
             "cols": ["l_orderkey", "l_linenumber"]},
            {"name": "order_fk", "kind": "foreign_key", "cols": ["l_orderkey"],
             "parent": orders, "parent_cols": ["o_orderkey"]},
        ],
    )
    report.show(truncate=False)
    # the gate WORKS on this synthetic corpus: (l_orderkey, l_linenumber)
    # is genuinely non-unique in the generated lineitem — exactly the
    # kind of defect the contract exists to catch. A production load
    # would abort here; the tour notes it and continues.
    failed = [r["name"] for r in report.filter(~F.col("passed")).collect()]
    if failed:
        print(f"contract violations caught (production would abort): {failed}")

    print("=== 2. versioned commit (v1) ===")
    path = f"{tempfile.mkdtemp(prefix='governed_')}/totals"
    totals = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).alias("revenue"),
    )
    v1 = vt_write(spark, path, totals.filter(F.col("l_orderkey") % 2 == 0))
    print(f"committed version {v1}: {vt_read(spark, path).count()} rows")

    print("\n=== 3. CDC backfill MERGE (v2) ===")
    v2 = vt_merge(
        spark, path, totals.filter(F.col("l_orderkey") % 2 == 1), ["l_orderkey"]
    )
    print(f"committed version {v2}: {vt_read(spark, path).count()} rows")

    print("\n=== 4. time-travel audit ===")
    for v in vt_versions(path):
        n = vt_read(spark, path, version=v).count()
        print(f"  version {v}: {n} rows")

    print("\n=== 5. oops — roll back the backfill (zero-copy RESTORE) ===")
    from dynamicqueryengine_spark.sources.versioned import (
        vt_history,
        vt_restore,
    )

    v3 = vt_restore(spark, path, v1)
    print(
        f"restored v{v1} as new head v{v3}: "
        f"{vt_read(spark, path).count()} rows (no data copied)"
    )
    print("audit log (vt_history):")
    for h in vt_history(path):
        print(f"  v{h['version']}: {h['op']} ({h['n_dirs']} dirs)")

    print("\n=== 6. vacuum (keep last 2) ===")
    print(f"removed: {vt_vacuum(spark, path, keep_last=2)}")
    print(f"versions now: {vt_versions(path)}; head still reads "
          f"{vt_read(spark, path).count()} rows")

    spark.stop()


if __name__ == "__main__":
    main()
