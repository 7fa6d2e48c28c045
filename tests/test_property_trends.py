"""Property-based tests for the trend workloads: EWMA and the
transition matrix are checked against independent pure-Python
references on randomized event streams (workload fns read parquet, so
each example writes a tmp table — examples kept small)."""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

BASE = dt.datetime(2024, 1, 1)

_EV = st.tuples(
    st.integers(0, 3),                      # user
    st.sampled_from(["a", "b", "c"]),       # type
    st.integers(0, 5000),                   # seconds offset
    st.floats(0.0, 100.0, allow_nan=False, width=32),
)


def _write(spark, tmp_path, rows, name):
    data = [
        (i, u, t, BASE + dt.timedelta(seconds=s), float(v))
        for i, (u, t, s, v) in enumerate(rows)
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, user_id long, event_type string,"
        " ts timestamp, value double",
    )
    d = tmp_path / name
    df.write.mode("overwrite").parquet(str(d / "events.parquet"))
    return str(d), data


class TestEwmaProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(_EV, min_size=1, max_size=30), n=st.integers(0, 10**6))
    def test_matches_python_fold(self, spark, tmp_path_factory, rows, n):
        from dynamicqueryengine_spark.workloads.trends import _events_ewma

        tmp = tmp_path_factory.mktemp("ewma")
        sf, data = _write(spark, tmp, rows, f"t{n}")
        got = {r["user_id"]: r["ewma"] for r in _events_ewma(spark, sf).collect()}
        by_user = {}
        for eid, u, t, ts, v in sorted(data, key=lambda r: (r[3], r[0])):
            if u not in by_user:
                by_user[u] = v
            else:
                by_user[u] = by_user[u] * 0.75 + v * 0.25
        assert set(got) == set(by_user)
        for u in by_user:
            assert got[u] == pytest.approx(by_user[u], rel=1e-12), u


class TestTransitionProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(_EV, min_size=2, max_size=30), n=st.integers(0, 10**6))
    def test_matches_python_counts(self, spark, tmp_path_factory, rows, n):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_transition_matrix,
        )

        tmp = tmp_path_factory.mktemp("trans")
        sf, data = _write(spark, tmp, rows, f"t{n}")
        got = {
            (r["src_type"], r["dst_type"]): r["n_pairs"]
            for r in _events_transition_matrix(spark, sf).collect()
        }
        want: dict = {}
        seq: dict = {}
        for eid, u, t, ts, v in sorted(data, key=lambda r: (r[3], r[0])):
            if u in seq:
                want[(seq[u], t)] = want.get((seq[u], t), 0) + 1
            seq[u] = t
        assert got == want


class TestGapfillProperty:
    @settings(
        max_examples=6,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(rows=st.lists(_EV, min_size=1, max_size=25), n=st.integers(0, 10**6))
    def test_grid_contiguous_and_ffill_correct(
        self, spark, tmp_path_factory, rows, n
    ):
        from dynamicqueryengine_spark.workloads.trends import _events_gapfill

        tmp = tmp_path_factory.mktemp("gap")
        sf, data = _write(spark, tmp, rows, f"t{n}")
        out = _events_gapfill(spark, sf).collect()
        by_user: dict = {}
        for r in out:
            by_user.setdefault(r["user_id"], []).append(r)
        # python reference: last observed value per (user, hour)
        obs: dict = {}
        for eid, u, t, ts, v in sorted(data, key=lambda r: (r[3], r[0])):
            hour = ts.replace(minute=0, second=0, microsecond=0)
            obs[(u, hour)] = v
        for u, rs in by_user.items():
            rs.sort(key=lambda r: r["hour"])
            hours = [r["hour"] for r in rs]
            # contiguous hourly grid spanning min..max observed hour
            for a, b in zip(hours, hours[1:]):
                assert (b - a).total_seconds() == 3600
            last = None
            for r in rs:
                key = (u, r["hour"])
                if key in obs:
                    last = obs[key]
                    assert r["is_observed"]
                else:
                    assert not r["is_observed"]
                assert r["value_ffill"] == last
