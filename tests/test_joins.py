"""Differential tests for the temporal join operators (operators/joins.py):
the scale-shaped plans (tagged-union as-of, bucketed range join) must
agree row-for-row with naive Python reference computations on fixtures
that hit the edge cases — ts ties, no-prior-match NULLs, interval
boundaries (half-open), and intervals spanning multiple buckets."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.operators.joins import asof_join, range_join

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _ts(minutes: float) -> dt.datetime:
    return T0 + dt.timedelta(minutes=minutes)


@pytest.fixture(scope="module")
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [
            # (qid, key, ts, px)
            (1, "A", _ts(0), 10.0),
            (2, "A", _ts(5), 11.0),
            (3, "A", _ts(5), 12.0),  # tie on ts with qid 2 → qid 3 wins
            (4, "B", _ts(3), 20.0),
            (5, "C", _ts(9), 30.0),  # key with no trades
        ],
        "qid long, key string, ts timestamp, px double",
    )
    trades = spark.createDataFrame(
        [
            # (tid, key, ts)
            (100, "A", _ts(4)),   # latest quote: qid 1 (ts 0)
            (101, "A", _ts(5)),   # tie-inclusive: qid 3 (ts 5, max qid)
            (102, "A", _ts(99)),  # qid 3 still latest
            (103, "B", _ts(2)),   # before any B quote → NULL
            (104, "B", _ts(3)),   # exact tie → qid 4
            (105, "D", _ts(1)),   # key never quoted → NULL
        ],
        "tid long, key string, ts timestamp",
    )
    return quotes, trades


class TestAsofJoin:
    def test_matches_naive(self, spark, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(
            trades,
            quotes,
            on=["key"],
            right_payload=["qid", "px"],
            right_tiebreak="qid",
        )
        got = {r["tid"]: (r["qid_asof"], r["px_asof"]) for r in out.collect()}
        assert got == {
            100: (1, 10.0),
            101: (3, 12.0),
            102: (3, 12.0),
            103: (None, None),
            104: (4, 20.0),
            105: (None, None),
        }

    def test_left_rows_preserved(self, spark, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(trades, quotes, on=["key"], right_payload=["qid"])
        assert out.count() == trades.count()
        assert set(out.columns) == {"tid", "key", "ts", "qid_asof"}

    def test_default_payload_is_all_right_columns(self, spark, quotes_trades):
        quotes, trades = quotes_trades
        out = asof_join(trades, quotes, on=["key"], right_tiebreak="qid")
        assert {"qid_asof", "key_asof", "ts_asof", "px_asof"} <= set(out.columns)


class TestRangeJoin:
    @pytest.fixture(scope="class")
    def facts_intervals(self, spark):
        facts = spark.createDataFrame(
            [(i, _ts(i * 7)) for i in range(40)],  # every 7 min over ~4.5h
            "fid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [
                (1, _ts(0), _ts(30)),     # within one hour bucket
                (2, _ts(50), _ts(130)),   # spans 3 hour buckets
                (3, _ts(30), _ts(30)),    # empty (start == end)
                (4, _ts(28), _ts(36)),    # overlaps interval 1's tail
            ],
            "iid long, lo timestamp, hi timestamp",
        )
        return facts, intervals

    def _naive(self, facts, intervals):
        f = [(r["fid"], r["ts"]) for r in facts.collect()]
        iv = [(r["iid"], r["lo"], r["hi"]) for r in intervals.collect()]
        return sorted(
            (fid, iid) for fid, ts in f for iid, lo, hi in iv if lo <= ts < hi
        )

    @pytest.mark.parametrize("strategy", ["bucket", "broadcast"])
    def test_matches_naive(self, spark, facts_intervals, strategy):
        facts, intervals = facts_intervals
        out = range_join(
            facts, intervals, "ts", "lo", "hi",
            strategy=strategy, bucket_seconds=3600,
        )
        got = sorted((r["fid"], r["iid"]) for r in out.collect())
        assert got == self._naive(facts, intervals)
        assert len(got) > 0

    def test_half_open_boundaries(self, spark):
        facts = spark.createDataFrame(
            [(1, _ts(0)), (2, _ts(10)), (3, _ts(20))],
            "fid long, ts timestamp",
        )
        intervals = spark.createDataFrame(
            [(1, _ts(0), _ts(20))], "iid long, lo timestamp, hi timestamp"
        )
        out = range_join(facts, intervals, "ts", "lo", "hi", strategy="bucket")
        assert sorted(r["fid"] for r in out.collect()) == [1, 2]  # hi excluded

    def test_unknown_strategy_raises(self, spark, facts_intervals):
        facts, intervals = facts_intervals
        with pytest.raises(ValueError, match="strategy"):
            range_join(facts, intervals, "ts", "lo", "hi", strategy="sort")
