"""Table statistics + cost-based join planning (sources/versioned.py
vt_analyze / vt_table_stats / vt_join_plan / vt_join, operators/joins.py
choose_join_strategy).

The reference has no joins and no optimizer (SURVEY.md §2.5/§4); this is
beyond-reference surface: ANALYZE-style statistics recorded in the
versioned table's manifest drive a broadcast / salted / shuffle join
decision from metadata alone — the input Catalyst cannot see behind a
plain parquet scan."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark.operators.joins import choose_join_strategy
from dynamicqueryengine_spark.sources.versioned import (
    vt_analyze,
    vt_history,
    vt_join,
    vt_join_plan,
    vt_read,
    vt_scan_plan,
    vt_table_stats,
    vt_write,
)


def _facts(spark, n=400, hot_share=0.0):
    """n fact rows keyed by k; hot_share of them concentrated on k=0."""
    hot = int(n * hot_share)
    rows = [(0, i, float(i)) for i in range(hot)] + [
        (1 + i % 7, i, float(i)) for i in range(hot, n)
    ]
    return spark.createDataFrame(rows, "k int, fid long, val double")


def _dim(spark):
    return spark.createDataFrame(
        [(i, f"name{i}") for i in range(8)], "k int, name string"
    )


class TestAnalyze:
    def test_analyze_records_exact_and_approx_stats(self, spark, tmp_path):
        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i % 10, f"v{i % 3}" if i % 4 else None) for i in range(200)],
            "k int, s string",
        )
        vt_write(spark, path, df)
        v = vt_analyze(spark, path)
        stats = vt_table_stats(path)
        assert stats["version"] == v
        a = stats["analyze"]
        assert a["rows"] == 200 and a["bytes"] > 0
        assert a["at_version"] == 1
        # nulls exact; NDV is HLL at rsd=0.02 — exact at this cardinality
        assert a["columns"]["s"]["nulls"] == 50
        assert a["columns"]["k"]["ndv"] == 10
        assert a["columns"]["s"]["ndv"] == 3
        # MCV: k ∈ 0..9 uniform → 20 each (ties broken by value)
        assert a["columns"]["k"]["mcv_count"] == 20
        assert stats["analyze_stale"] is False
        # newest-first audit log: the head entry is the analyze commit
        assert vt_history(path)[0]["op"] == "analyze"

    def test_analyze_preserves_data_and_skipping(self, spark, tmp_path):
        """The analyze commit is zero-copy: same rows at the new head and
        the carried file stats still prune (an analyze that dropped
        file_stats would silently disable data skipping)."""
        path = str(tmp_path / "t")
        vt_write(
            spark, path, spark.createDataFrame([(1, "a")], "k int, s string")
        )
        vt_write(
            spark,
            path,
            spark.createDataFrame([(100, "b")], "k int, s string"),
            mode="append",
        )
        vt_analyze(spark, path, columns=["k"])
        assert {r["k"] for r in vt_read(spark, path).collect()} == {1, 100}
        plan = vt_scan_plan(path, None, ("k", ">", 50))
        assert plan["files_kept"] < plan["files_total"]

    def test_stats_go_stale_after_data_commit(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _dim(spark))
        vt_analyze(spark, path, columns=["k"])
        assert vt_table_stats(path)["analyze_stale"] is False
        vt_write(spark, path, _dim(spark), mode="append")
        s = vt_table_stats(path)
        assert s["analyze_stale"] is True
        # metadata row count tracks the head even while analyze is stale
        assert s["rows"] == 16

    def test_table_stats_without_analyze(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _dim(spark))
        s = vt_table_stats(path)
        assert s["rows"] == 8 and s["bytes"] > 0
        assert s["analyze"] is None and s["analyze_stale"] is None


class TestChooseStrategy:
    """Pure-metadata unit tests — no Spark, hand-built stats dicts."""

    def _stats(self, nbytes, rows=1000, mcv=None, nulls=0):
        cols = {}
        if mcv is not None:
            cols["k"] = {"ndv": 10, "nulls": nulls, "mcv_count": mcv}
        return {
            "bytes": nbytes,
            "rows": rows,
            "analyze": {"rows": rows, "columns": cols} if cols else None,
        }

    def test_broadcast_small_side(self):
        d = choose_join_strategy(
            self._stats(10 << 30), self._stats(1 << 20), ["k"]
        )
        assert d["strategy"] == "broadcast" and d["build_side"] == "right"

    def test_salted_on_recorded_skew(self):
        d = choose_join_strategy(
            self._stats(10 << 30, rows=1000, mcv=500),
            self._stats(1 << 30),
            ["k"],
        )
        assert d["strategy"] == "salted" and d["probe_side"] == "left"
        assert d["skew_share"] == pytest.approx(0.5)

    def test_skew_share_uses_nonnull_rows(self):
        # 400 of 500 non-null rows on one key = 0.8 share, not 400/1000
        d = choose_join_strategy(
            self._stats(10 << 30, rows=1000, mcv=400, nulls=500),
            self._stats(1 << 30),
            ["k"],
        )
        assert d["skew_share"] == pytest.approx(0.8)
        assert d["strategy"] == "salted"

    def test_shuffle_without_skew_or_fit(self):
        d = choose_join_strategy(
            self._stats(10 << 30, mcv=50), self._stats(1 << 30), ["k"]
        )
        assert d["strategy"] == "shuffle"

    def test_shuffle_when_no_analyze(self):
        d = choose_join_strategy(
            self._stats(10 << 30), self._stats(1 << 30), ["k"]
        )
        assert d["strategy"] == "shuffle" and d["skew_share"] is None


class TestVtJoin:
    def _plain(self, spark, lp, rp, on, how="inner"):
        return (
            vt_read(spark, lp).join(vt_read(spark, rp), on, how).collect()
        )

    def test_broadcast_decision_and_plan(self, spark, tmp_path):
        lp, rp = str(tmp_path / "facts"), str(tmp_path / "dim")
        vt_write(spark, lp, _facts(spark))
        vt_write(spark, rp, _dim(spark))
        decision: dict = {}
        out = vt_join(spark, lp, rp, ["k"], decision_out=decision)
        assert decision["strategy"] == "broadcast"
        # the hint must reach the physical plan
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, self._plain(spark, lp, rp, ["k"]))
        )

    def test_salted_decision_matches_plain_join(self, spark, tmp_path):
        lp, rp = str(tmp_path / "facts"), str(tmp_path / "dim")
        vt_write(spark, lp, _facts(spark, hot_share=0.6))
        vt_write(spark, rp, _dim(spark))
        vt_analyze(spark, lp, columns=["k"])
        decision: dict = {}
        out = vt_join(
            spark,
            lp,
            rp,
            ["k"],
            broadcast_bytes=0,  # force past the broadcast rung
            skew_share=0.5,
            decision_out=decision,
        )
        assert decision["strategy"] == "salted"
        assert decision["skew_share"] >= 0.5
        assert out.columns == ["k", "fid", "val", "name"]
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, self._plain(spark, lp, rp, ["k"]))
        )

    def test_salted_left_join_preserves_unmatched(self, spark, tmp_path):
        from pyspark.sql import functions as F

        lp, rp = str(tmp_path / "facts"), str(tmp_path / "dim")
        vt_write(spark, lp, _facts(spark, hot_share=0.6))
        vt_write(
            spark,
            rp,
            _dim(spark).where(F.col("k") < 3),  # unmatched fact keys exist
        )
        vt_analyze(spark, lp, columns=["k"])
        decision: dict = {}
        out = vt_join(
            spark, lp, rp, ["k"], how="left",
            broadcast_bytes=0, skew_share=0.5, decision_out=decision,
        )
        assert decision["strategy"] == "salted"
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, self._plain(spark, lp, rp, ["k"], "left"))
        )

    def test_incompatible_how_falls_back_to_shuffle_join(
        self, spark, tmp_path
    ):
        """A salted decision with how='right' (probe side not preserved)
        must still produce the plain join's rows."""
        lp, rp = str(tmp_path / "facts"), str(tmp_path / "dim")
        vt_write(spark, lp, _facts(spark, hot_share=0.6))
        vt_write(spark, rp, _dim(spark))
        vt_analyze(spark, lp, columns=["k"])
        out = vt_join(
            spark, lp, rp, ["k"], how="right",
            broadcast_bytes=0, skew_share=0.5,
        )
        assert sorted(
            map(tuple, out.select("k", "fid", "val", "name").collect())
        ) == sorted(map(tuple, self._plain(spark, lp, rp, ["k"], "right")))

    def test_shuffle_decision_executes(self, spark, tmp_path):
        lp, rp = str(tmp_path / "facts"), str(tmp_path / "dim")
        vt_write(spark, lp, _facts(spark))
        vt_write(spark, rp, _dim(spark))
        decision: dict = {}
        out = vt_join(
            spark, lp, rp, ["k"], broadcast_bytes=0, decision_out=decision
        )
        assert decision["strategy"] == "shuffle"
        assert sorted(map(tuple, out.collect())) == sorted(
            map(tuple, self._plain(spark, lp, rp, ["k"]))
        )


class TestMaintenancePlan:
    def test_fragmented_table_recommends_compaction(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_maintenance_plan,
            vt_optimize,
        )

        path = str(tmp_path / "t")
        for i in range(6):  # six tiny append dirs — the streaming pattern
            vt_write(
                spark,
                path,
                spark.createDataFrame([(i, "x")], "k int, s string"),
                mode="append" if i else "overwrite",
            )
        plan = vt_maintenance_plan(path)
        assert plan["compact"] is True
        assert plan["dirs"] == 6 and plan["files_small"] == plan["files_total"]
        assert plan["analyze"] == "missing"
        vt_optimize(spark, path, ["k"], n_partitions=1)
        after = vt_maintenance_plan(
            path, small_file_bytes=1  # nothing counts as small
        )
        assert after["compact"] is False and after["dirs"] == 1

    def test_analyze_freshness_transitions(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_maintenance_plan,
        )

        path = str(tmp_path / "t")
        vt_write(spark, path, _dim(spark))
        assert vt_maintenance_plan(path)["analyze"] == "missing"
        vt_analyze(spark, path, columns=["k"])
        assert vt_maintenance_plan(path)["analyze"] == "fresh"
        vt_write(spark, path, _dim(spark), mode="append")
        assert vt_maintenance_plan(path)["analyze"] == "stale"

    def test_vacuum_estimate_matches_vacuum(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_maintenance_plan,
            vt_vacuum,
        )

        path = str(tmp_path / "t")
        vt_write(spark, path, _dim(spark))
        vt_write(spark, path, _dim(spark), mode="overwrite")
        vt_write(spark, path, _dim(spark), mode="overwrite")
        plan = vt_maintenance_plan(path, keep_last=2)
        assert len(plan["vacuum"]["dirs"]) == 1  # v1's dir is expired-only
        assert plan["vacuum"]["bytes"] > 0
        removed = vt_vacuum(spark, path, keep_last=2)
        assert sorted(removed) == plan["vacuum"]["dirs"]
        # post-vacuum: nothing left to reclaim
        assert vt_maintenance_plan(path, keep_last=2)["vacuum"]["dirs"] == []


class TestAdminOnClones:
    """The r9 admin surfaces must compose with shallow clones, whose
    manifests reference directories by ABSOLUTE path."""

    def test_analyze_stats_join_and_maintenance_on_clone(
        self, spark, tmp_path
    ):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_clone,
            vt_maintenance_plan,
        )

        src = str(tmp_path / "src")
        clone = str(tmp_path / "clone")
        dim = str(tmp_path / "dim")
        vt_write(spark, src, _facts(spark))
        vt_clone(spark, src, clone)
        vt_write(spark, dim, _dim(spark))
        # ANALYZE the clone: zero-copy commit over absolute dirs
        vt_analyze(spark, clone, columns=["k"])
        st = vt_table_stats(clone)
        assert st["rows"] == 400 and st["bytes"] > 0
        # hot_share=0 facts carry keys 1..7
        assert st["analyze"]["columns"]["k"]["ndv"] == 7
        # the advisor sees the clone's (shared) bytes and broadcasts dim
        decision: dict = {}
        out = vt_join(spark, clone, dim, ["k"], decision_out=decision)
        assert decision["strategy"] == "broadcast"
        assert out.count() == 400
        # maintenance plan: absolute shared dirs are never vacuum bait
        plan = vt_maintenance_plan(clone)
        assert plan["vacuum"]["dirs"] == []
        assert plan["analyze"] == "fresh"
