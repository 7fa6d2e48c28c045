"""CDC subscription (streaming/cdc.py): cursor-on-sink exactly-once,
incremental rollup equals full recompute, replay no-ops."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.sources.versioned import (
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


def _ev(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 10).cast("decimal(38,12)").alias("v"),
    )


@pytest.fixture()
def paths(tmp_path):
    return str(tmp_path / "src"), str(tmp_path / "sink")


def _rollup(spark, sink):
    return {
        r["g"]: (r["n"], int(r["s"]))
        for r in vt_read(spark, sink).collect()
    }


class TestCdcSubscription:
    def test_incremental_equals_recompute(self, spark, paths):
        src, sink = paths
        apply = apply_rollup_increment(spark, sink, ["g"], {"s": "v"})
        vt_write(spark, src, _ev(spark, 0, 30))
        assert pump_until_current(spark, src, sink, "sub", apply) == 1
        vt_write(spark, src, _ev(spark, 30, 60), mode="append")
        vt_merge(
            spark, src,
            _ev(spark, 0, 10).withColumn("v", F.col("v") * 3),
            ["k"], change_feed=True,
        )
        # one pump folds BOTH outstanding versions
        assert pump_until_current(spark, src, sink, "sub", apply) == 2
        assert subscription_cursor(sink, "sub") == vt_head(src) == 3
        want = {
            r["g"]: (r["n"], int(r["s"]))
            for r in vt_read(spark, src)
            .groupBy("g")
            .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
            .collect()
        }
        assert _rollup(spark, sink) == want

    def test_pump_when_current_is_noop(self, spark, paths):
        src, sink = paths
        apply = apply_rollup_increment(spark, sink, ["g"], {"s": "v"})
        vt_write(spark, src, _ev(spark, 0, 12))
        assert pump_changes(spark, src, sink, "sub", apply) == 1
        before = _rollup(spark, sink)
        assert pump_changes(spark, src, sink, "sub", apply) == 0
        assert _rollup(spark, sink) == before

    def test_replayed_apply_is_exactly_once(self, spark, paths):
        """Crash-sim: the apply's merge COMMITTED but the pump caller
        re-runs (at-least-once driver). The sink txn guard makes the
        second apply a no-op — totals must not double."""
        src, sink = paths
        apply = apply_rollup_increment(spark, sink, ["g"], {"s": "v"})
        vt_write(spark, src, _ev(spark, 0, 12))
        from dynamicqueryengine_spark.sources.versioned import (
            vt_read_changes,
        )

        head = vt_head(src)
        changes = vt_read_changes(spark, src, 0, head)
        apply(changes, ("sub", head))
        before = _rollup(spark, sink)
        apply(changes, ("sub", head))  # replay
        assert _rollup(spark, sink) == before
        # and the pump agrees the subscription is current
        assert pump_changes(spark, src, sink, "sub", apply) == 0

    def test_two_independent_consumers(self, spark, paths):
        src, sink = paths
        sink2 = sink + "2"
        a1 = apply_rollup_increment(spark, sink, ["g"], {"s": "v"})
        a2 = apply_rollup_increment(spark, sink2, ["g"], {"s": "v"})
        vt_write(spark, src, _ev(spark, 0, 9))
        pump_until_current(spark, src, sink, "sub_a", a1)
        vt_write(spark, src, _ev(spark, 9, 18), mode="append")
        pump_until_current(spark, src, sink, "sub_a", a1)
        # consumer B starts late and catches up from version 0 in one go
        pump_until_current(spark, src, sink2, "sub_b", a2)
        assert _rollup(spark, sink) == _rollup(spark, sink2)


def _idx(spark, sink):
    return {
        r["token"]: (r["df"], r["tf"])
        for r in vt_read(spark, sink).collect()
    }


class TestIndexIncrement:
    """Incrementally-maintained inverted index (apply_index_increment):
    signed deltas over an EXPLODED projection."""

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_insert_then_update_telescopes(self, spark, paths):
        from dynamicqueryengine_spark.streaming.cdc import (
            apply_index_increment,
        )

        src, sink = paths
        apply = apply_index_increment(spark, sink)
        vt_write(
            spark,
            src,
            self._docs(spark, [(1, "a b a"), (2, "b c")]),
        )
        pump_until_current(spark, src, sink, "idx", apply)
        assert _idx(spark, sink) == {
            "a": (1, 2),
            "b": (2, 2),
            "c": (1, 1),
        }
        # update doc 1: keeps one 'a' (pre-image must cancel the other),
        # drops 'b' entirely from doc 1, introduces 'd'
        vt_merge(
            spark,
            src,
            self._docs(spark, [(1, "a d")]),
            ["doc_id"],
            change_feed=True,
        )
        pump_until_current(spark, src, sink, "idx", apply)
        assert _idx(spark, sink) == {
            "a": (1, 1),
            "b": (1, 1),
            "c": (1, 1),
            "d": (1, 1),
        }

    def test_token_vanishing_leaves_zero_tombstone(self, spark, paths):
        from dynamicqueryengine_spark.streaming.cdc import (
            apply_index_increment,
        )

        src, sink = paths
        apply = apply_index_increment(spark, sink)
        vt_write(spark, src, self._docs(spark, [(1, "x y")]))
        pump_until_current(spark, src, sink, "idx", apply)
        vt_merge(
            spark,
            src,
            self._docs(spark, [(1, "y")]),
            ["doc_id"],
            change_feed=True,
        )
        pump_until_current(spark, src, sink, "idx", apply)
        # 'x' left the corpus: df/tf roll to 0 but the row remains (the
        # rollup-consumer tombstone convention — compaction is OPTIMIZE's
        # job); consumers filter df > 0
        assert _idx(spark, sink) == {"x": (0, 0), "y": (1, 1)}

    def test_multi_commit_pump_and_replay_idempotence(self, spark, paths):
        from dynamicqueryengine_spark.streaming.cdc import (
            apply_index_increment,
        )

        src, sink = paths
        apply = apply_index_increment(spark, sink)
        # two commits folded in ONE pump: same doc inserted then updated
        vt_write(spark, src, self._docs(spark, [(1, "p q")]))
        vt_merge(
            spark,
            src,
            self._docs(spark, [(1, "q r")]),
            ["doc_id"],
            change_feed=True,
        )
        pump_until_current(spark, src, sink, "idx", apply)
        want = {"p": (0, 0), "q": (1, 1), "r": (1, 1)}
        assert _idx(spark, sink) == want
        # replaying the already-applied range is a no-op (cursor guard)
        head = vt_head(src)
        from dynamicqueryengine_spark.sources.versioned import (
            vt_read_changes,
        )

        apply(vt_read_changes(spark, src, 0, head), ("idx", head))
        assert _idx(spark, sink) == want


class TestMetadataCommitsInFeeds:
    """r9 fix: metadata-only commits (ANALYZE) and clone-creation
    commits must not wedge change-feed consumers."""

    def test_pump_over_analyze_commit_yields_no_changes(self, spark, paths):
        from dynamicqueryengine_spark.sources.versioned import vt_analyze

        src, sink = paths
        apply = apply_rollup_increment(spark, sink, ["g"], {"s": "v"})
        vt_write(spark, src, _ev(spark, 0, 12))
        pump_until_current(spark, src, sink, "sub", apply)
        before = _rollup(spark, sink)
        vt_analyze(spark, src, columns=["g"])  # used to raise in pump
        consumed = pump_until_current(spark, src, sink, "sub", apply)
        assert consumed == 1  # the analyze version is consumed...
        assert _rollup(spark, sink) == before  # ...with zero effect
        # and a later real append still flows through
        vt_write(spark, src, _ev(spark, 12, 18), mode="append")
        pump_until_current(spark, src, sink, "sub", apply)
        assert sum(n for n, _ in _rollup(spark, sink).values()) == 18

    def test_read_delta_spans_analyze(self, spark, paths):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_analyze,
            vt_read_delta,
        )

        src, _ = paths
        vt_write(spark, src, _ev(spark, 0, 5))
        vt_analyze(spark, src, columns=["g"])
        vt_write(spark, src, _ev(spark, 5, 9), mode="append")
        delta = vt_read_delta(spark, src, 1, 3)
        assert delta.count() == 4  # only the appended rows

    def test_changes_from_zero_over_clone_is_insert_all(
        self, spark, paths, tmp_path
    ):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_clone,
            vt_read_changes,
        )

        src, _ = paths
        vt_write(spark, src, _ev(spark, 0, 6))
        cpath = str(tmp_path / "clone")
        vt_clone(spark, src, cpath)
        ch = vt_read_changes(spark, cpath, 0, 1)
        assert ch.count() == 6
        assert {r["_change_type"] for r in ch.collect()} == {"insert"}
