"""Hand-built micro-cases pinning the INTENT of the round-5 behavioral
queries — the DuckDB oracle proves engine parity on the big tables;
these prove the semantics are the ones a human expects. Each test
patches the workload module's ``load_table`` binding so the contract
callable runs unchanged over a planted event set."""

from __future__ import annotations

import datetime as dt

import dynamicqueryengine_spark.workloads.temporal as temporal_mod
import dynamicqueryengine_spark.workloads.trends as trends_mod


def _ts(h, m=0, d=1):
    return dt.datetime(2024, 1, d, h, m)


def _events(spark, rows):
    # (event_id, ts, user_id, event_type, value)
    return spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double",
    )


def _run(spark, monkeypatch, mod, fn_name, rows):
    import dynamicqueryengine_spark.sources.registry as registry_mod

    df = _events(spark, rows)
    fake = lambda s, sf, name: df  # noqa: E731
    # cover both binding styles: module-level `from registry import
    # load_table` (trends) and function-local imports (temporal)
    monkeypatch.setattr(registry_mod, "load_table", fake)
    if hasattr(mod, "load_table"):
        monkeypatch.setattr(mod, "load_table", fake)
    return getattr(mod, fn_name)(spark, "planted").collect()


class TestLastTouchAttribution:
    def test_most_recent_touch_wins_and_direct_fallbacks(self, spark, monkeypatch):
        rows = [
            # user 1: view then click then purchase -> credited to click
            (1, _ts(10, 0), 1, "view", 0.0),
            (2, _ts(10, 5), 1, "click", 0.0),
            (3, _ts(10, 10), 1, "purchase", 50.0),
            # user 2: purchase with NO prior event -> direct
            (4, _ts(11, 0), 2, "purchase", 10.0),
            # user 3: touch 8 days before the purchase -> outside lookback
            (5, _ts(9, 0, d=1), 3, "view", 0.0),
            (6, _ts(9, 0, d=9), 3, "purchase", 20.0),
        ]
        got = {
            r["channel"]: (r["n_conversions"], r["attributed_value"])
            for r in _run(
                spark, monkeypatch, trends_mod,
                "_events_attribution_last_touch", rows,
            )
        }
        assert got["click"] == (1, 50.0)
        assert got["direct"] == (2, 30.0)
        assert "view" not in got  # superseded by the later click

    def test_prior_purchase_is_not_a_touch(self, spark, monkeypatch):
        rows = [
            (1, _ts(10, 0), 1, "purchase", 5.0),   # direct
            (2, _ts(10, 30), 1, "purchase", 7.0),  # still direct: purchases
        ]                                           # never attribute
        got = {
            r["channel"]: (r["n_conversions"], r["attributed_value"])
            for r in _run(
                spark, monkeypatch, trends_mod,
                "_events_attribution_last_touch", rows,
            )
        }
        assert got == {"direct": (2, 12.0)}


class TestPeakConcurrency:
    def _peak(self, spark, monkeypatch, rows):
        return {
            r["day"]: r["peak_concurrency"]
            for r in _run(
                spark, monkeypatch, temporal_mod,
                "_events_peak_concurrency", rows,
            )
        }

    def test_overlapping_sessions_stack(self, spark, monkeypatch):
        rows = [
            # users 1 and 2 both active 10:00-10:10 -> peak 2
            (1, _ts(10, 0), 1, "view", 0.0),
            (2, _ts(10, 10), 1, "view", 0.0),
            (3, _ts(10, 5), 2, "view", 0.0),
            (4, _ts(10, 9), 2, "view", 0.0),
            # user 3 alone at 15:00 (disjoint) -> does not raise the peak
            (5, _ts(15, 0), 3, "view", 0.0),
        ]
        got = self._peak(spark, monkeypatch, rows)
        assert got[dt.datetime(2024, 1, 1)] == 2

    def test_disjoint_sessions_do_not_stack(self, spark, monkeypatch):
        rows = [
            (1, _ts(10, 0), 1, "view", 0.0),
            (2, _ts(15, 0), 2, "view", 0.0),  # hours apart, other user
        ]
        got = self._peak(spark, monkeypatch, rows)
        assert got[dt.datetime(2024, 1, 1)] == 1


class TestSessionFunnel:
    def test_steps_chain_within_but_not_across_sessions(self, spark, monkeypatch):
        rows = [
            # session A (user 1): full chain -> level 3
            (1, _ts(10, 0), 1, "view", 0.0),
            (2, _ts(10, 5), 1, "click", 0.0),
            (3, _ts(10, 10), 1, "purchase", 0.0),
            # session B (user 1, after >30min gap): view only -> level 1;
            # session A's click/purchase must NOT chain into it
            (4, _ts(12, 0), 1, "view", 0.0),
            # user 2, one session: click BEFORE view -> view-only level 1
            (5, _ts(10, 0), 2, "click", 0.0),
            (6, _ts(10, 1), 2, "view", 0.0),
        ]
        got = {
            r["steps_completed"]: r["n_sessions"]
            for r in _run(
                spark, monkeypatch, temporal_mod,
                "_events_session_funnel", rows,
            )
        }
        assert got == {3: 1, 1: 2}
