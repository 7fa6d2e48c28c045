"""CDC-subscription tour — the stream-FROM-the-table direction the
round-9 storage layer closes: a source versioned table accumulates
commits (append / CHECK-constrained ingest / keyed merge with change
feed), and a downstream consumer keeps a per-key rollup current by
pumping ONLY the change rows, its cursor committed atomically with
each apply (exactly-once with zero checkpoint files):

    CHECK-constrained versioned source (versioned.py constraints)
      -> commits: write, append, MERGE(change_feed=True)
      -> pump_changes reads (cursor, head] row-level changes
      -> apply_rollup_increment folds signed increments, vt_merge's
         SetTransaction marker advances the cursor in the SAME commit
      -> replayed pumps are no-ops; a late second consumer catches up
         from version 0 and converges to the identical sink

Run:

    python examples/pipelines/cdc_subscription.py [SF_DIR]

(defaults to /root/testdata/sf0.01). The subscription semantics are
value-oracle-checked by scripts/check_correctness.py
(events_vt_cdc_subscription, events_vt_checked_ingest); crash-replay
and multi-consumer convergence are pinned by tests/test_stream_cdc.py.
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
from dynamicqueryengine_spark.sources.registry import load_table
from dynamicqueryengine_spark.sources.versioned import (
    ConstraintViolation,
    vt_head,
    vt_merge,
    vt_read,
    vt_write,
)
from dynamicqueryengine_spark.streaming.cdc import (
    apply_rollup_increment,
    pump_changes,
    pump_until_current,
    subscription_cursor,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("cdc-subscription", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    base = tempfile.mkdtemp(prefix="cdc_sub_")
    src, sink = os.path.join(base, "src"), os.path.join(base, "sink")
    app = "rollup_sub"
    apply = apply_rollup_increment(
        spark, sink, key_cols=["event_type"], sum_cols={"s": "v"}
    )

    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("value").cast("decimal(38,12)").alias("v"),
    )

    print("\n=== 1. constrained source table, first commit ===")
    vt_write(
        spark, src, ev.filter(F.col("event_id") % 2 == 0),
        constraints=[
            {"name": "v_not_null", "kind": "not_null", "col": "v"},
            {"name": "id_nonneg", "kind": "range", "col": "event_id",
             "lo": 0},
        ],
    )
    n = pump_changes(spark, src, sink, app, apply)
    print(f"pumped {n} version(s); cursor={subscription_cursor(sink, app)}")
    vt_read(spark, sink).orderBy("event_type").show()

    print("=== 2. a poisoned append is rejected by the table itself ===")
    try:
        vt_write(
            spark, src,
            ev.limit(10).withColumn(
                "v", F.lit(None).cast("decimal(38,12)")
            ),
            mode="append",
        )
    except ConstraintViolation as e:
        print(f"rejected: {e}")

    print("\n=== 3. clean append + change-feed MERGE, one pump folds both ===")
    vt_write(
        spark, src, ev.filter(F.col("event_id") % 2 == 1), mode="append"
    )
    vt_merge(
        spark, src,
        ev.filter(F.col("event_id") % 10 == 3).withColumn(
            "v", F.col("v") * 2
        ),
        ["event_id"], change_feed=True,
    )
    n = pump_until_current(spark, src, sink, app, apply)
    print(f"pumped {n} version(s); cursor={subscription_cursor(sink, app)}"
          f" == head {vt_head(src)}")

    print("\n=== 4. replayed pump is a no-op; sink == full recompute ===")
    print("replay pumped:", pump_changes(spark, src, sink, app, apply))
    maintained = (
        vt_read(spark, sink)
        .select("event_type", "n", F.col("s").cast("double").alias("s"))
        .orderBy("event_type")
    )
    recomputed = (
        vt_read(spark, src)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("double").alias("s"),
        )
        .orderBy("event_type")
    )
    maintained.show()
    assert [tuple(r) for r in maintained.collect()] == [
        tuple(r) for r in recomputed.collect()
    ], "maintained sink diverged from recompute"
    print("sink matches a full recompute of the source head — exactly-once")

    print("\n=== 5. a second consumer starting late converges ===")
    sink2 = os.path.join(base, "sink2")
    apply2 = apply_rollup_increment(
        spark, sink2, key_cols=["event_type"], sum_cols={"s": "v"}
    )
    pump_until_current(spark, src, sink2, "late_sub", apply2)
    same = sorted(
        (r["event_type"], r["n"], float(r["s"]))
        for r in vt_read(spark, sink2).collect()
    ) == sorted(
        (r["event_type"], r["n"], float(r["s"]))
        for r in vt_read(spark, sink).collect()
    )
    print(f"late consumer sink identical: {same}")

    spark.stop()


if __name__ == "__main__":
    main()
