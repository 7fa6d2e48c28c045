"""Unit semantics for the K-step funnel fold (workloads/temporal.py
funnel_ksteps): greedy-earliest chaining, strict ordering, horizon
cutoff, and K-generality on hand-built event streams."""

from __future__ import annotations

import datetime as dt

from dynamicqueryengine_spark.workloads.temporal import funnel_ksteps

BASE = dt.datetime(2026, 1, 1, 12, 0, 0)


def _events(spark, rows):
    """rows: (user_id, event_type, seconds_after_base)"""
    data = [
        (u, t, BASE + dt.timedelta(seconds=s))
        for (u, t, s) in rows
    ]
    return spark.createDataFrame(
        data, "user_id long, event_type string, ts timestamp"
    )


def _chains(df):
    return {
        r["user_id"]: (
            r["step1_ts"],
            r["step2_ts"],
            r["step3_ts"] if "step3_ts" in r.asDict() else None,
            r["steps_completed"],
        )
        for r in df.collect()
    }


class TestFunnelKsteps:
    def test_full_chain_greedy_earliest(self, spark):
        ev = _events(
            spark,
            [
                (1, "view", 0),
                (1, "view", 10),     # later view ignored (greedy first)
                (1, "click", 20),
                (1, "click", 30),    # later click ignored
                (1, "purchase", 40),
            ],
        )
        out = funnel_ksteps(ev, ["view", "click", "purchase"], horizon_us=10**9)
        got = _chains(out)
        t = lambda s: BASE + dt.timedelta(seconds=s)
        assert got[1] == (t(0), t(20), t(40), 3)

    def test_strictly_after_previous_step(self, spark):
        # click at the SAME microsecond as the view must not match
        ev = _events(spark, [(1, "view", 0), (1, "click", 0)])
        got = _chains(funnel_ksteps(ev, ["view", "click", "purchase"]))
        assert got[1][3] == 1  # only the view matched

    def test_horizon_cutoff_per_consecutive_step(self, spark):
        ev = _events(
            spark,
            [
                (1, "view", 0),
                (1, "click", 2_000),     # beyond the 1800s horizon
                (2, "view", 0),
                (2, "click", 1_700),
                (2, "purchase", 1_700 + 2_000),  # beyond horizon FROM CLICK
            ],
        )
        got = _chains(funnel_ksteps(ev, ["view", "click", "purchase"]))
        assert got[1][3] == 1
        assert got[2][3] == 2

    def test_out_of_order_steps_do_not_match(self, spark):
        # purchase before the click cannot complete the chain
        ev = _events(
            spark,
            [(1, "view", 0), (1, "purchase", 10), (1, "click", 20)],
        )
        got = _chains(funnel_ksteps(ev, ["view", "click", "purchase"]))
        assert got[1][3] == 2  # view + click; no purchase after the click

    def test_users_without_step1_are_absent(self, spark):
        ev = _events(spark, [(1, "click", 0), (2, "view", 0)])
        got = _chains(funnel_ksteps(ev, ["view", "click", "purchase"]))
        assert set(got) == {2}

    def test_k2_matches_range_window_funnel_semantics(self, spark):
        """K=2 fold must agree with the chained-min definition the 2-step
        range-window funnel implements (earliest view, first purchase
        within the horizon strictly after it)."""
        ev = _events(
            spark,
            [
                (1, "view", 0),
                (1, "purchase", 100),
                (1, "purchase", 200),
                (2, "view", 0),
            ],
        )
        out = funnel_ksteps(ev, ["view", "purchase"], horizon_us=10**9)
        rows = {r["user_id"]: r for r in out.collect()}
        t = lambda s: BASE + dt.timedelta(seconds=s)
        assert rows[1]["step2_ts"] == t(100)
        assert rows[2]["steps_completed"] == 1

    def test_single_shuffle_plan(self, spark):
        ev = _events(spark, [(1, "view", 0)])
        plan = funnel_ksteps(
            ev, ["view", "click", "purchase"]
        )._jdf.queryExecution().executedPlan().toString()
        # one aggregate over user_id; no join, no window over raw events
        assert "Join" not in plan and "Window" not in plan
