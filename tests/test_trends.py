"""Unit semantics for the trend workloads (workloads/trends.py) and the
inverted-index / salted-skew contract queries, on hand-built frames —
the value oracles at sf0.01 are covered by scripts/check_correctness.py;
these pin the operator semantics on adversarial shapes."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F


BASE = dt.datetime(2024, 1, 1, 0, 0, 0)


def _events(spark, rows):
    """rows: (event_id, user_id, event_type, seconds_after_base, value)"""
    data = [
        (eid, u, t, BASE + dt.timedelta(seconds=s), float(v))
        for (eid, u, t, s, v) in rows
    ]
    return spark.createDataFrame(
        data,
        "event_id long, user_id long, event_type string,"
        " ts timestamp, value double",
    )


@pytest.fixture()
def events_dir(spark, tmp_path):
    def write(rows):
        d = tmp_path / "sf"
        _events(spark, rows).write.mode("overwrite").parquet(
            str(d / "events.parquet")
        )
        return str(d)

    return write


class TestTransitionMatrix:
    def test_known_chain(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_transition_matrix,
        )

        # user 1: a->b->a->b ; user 2: a->a
        sf = events_dir(
            [
                (1, 1, "a", 0, 1),
                (2, 1, "b", 10, 1),
                (3, 1, "a", 20, 1),
                (4, 1, "b", 30, 1),
                (5, 2, "a", 0, 1),
                (6, 2, "a", 10, 1),
            ]
        )
        rows = {
            (r["src_type"], r["dst_type"]): r
            for r in _events_transition_matrix(spark, sf).collect()
        }
        assert rows[("a", "b")]["n_pairs"] == 2
        assert rows[("a", "a")]["n_pairs"] == 1
        assert rows[("b", "a")]["n_pairs"] == 1
        assert rows[("a", "b")]["total_from_src"] == 3
        assert rows[("a", "b")]["prob"] == pytest.approx(2 / 3)
        # probabilities are conditional: sum to 1 per source
        by_src = {}
        for (src, _), r in rows.items():
            by_src[src] = by_src.get(src, 0.0) + r["prob"]
        for total in by_src.values():
            assert total == pytest.approx(1.0)

    def test_ties_break_on_event_id(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_transition_matrix,
        )

        # same ts: order by event_id -> a(1) -> b(2)
        sf = events_dir([(1, 1, "a", 0, 1), (2, 1, "b", 0, 1)])
        rows = _events_transition_matrix(spark, sf).collect()
        assert len(rows) == 1
        assert (rows[0]["src_type"], rows[0]["dst_type"]) == ("a", "b")


class TestValueTrend:
    def test_recovers_exact_line(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_value_trend,
        )

        # y = 2 + 0.5 * (x - x0) with x-offsets 0, 60, 120, 180 seconds;
        # ts epoch offsets cancel inside the slope formula.
        sf = events_dir(
            [
                (i, 1, "a", i * 60, 2.0 + 0.5 * (i * 60))
                for i in range(4)
            ]
        )
        r = _events_value_trend(spark, sf).collect()[0]
        assert r["n"] == 4
        assert r["slope"] == pytest.approx(0.5, rel=1e-9)

    def test_per_group_fit(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_value_trend,
        )

        rows = [(i, 1, "up", i * 60, 1.0 * i) for i in range(5)]
        rows += [(100 + i, 1, "flat", i * 60, 7.0) for i in range(5)]
        sf = events_dir(rows)
        fits = {
            r["event_type"]: r
            for r in _events_value_trend(spark, sf).collect()
        }
        assert fits["up"]["slope"] == pytest.approx(1.0 / 60.0, rel=1e-9)
        assert fits["flat"]["slope"] == pytest.approx(0.0, abs=1e-12)
        assert fits["flat"]["intercept"] == pytest.approx(7.0, rel=1e-9)


class TestZscoreOutliers:
    def test_flags_only_the_outlier(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_zscore_outliers,
        )

        rows = [(i, 1, "a", i, 10.0 + (i % 2)) for i in range(20)]
        rows.append((99, 1, "a", 99, 1000.0))
        sf = events_dir(rows)
        out = _events_zscore_outliers(spark, sf).collect()
        assert [r["event_id"] for r in out] == [99]
        assert out[0]["z"] > 2.5

    def test_z_is_standardized(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_zscore_outliers,
        )

        vals = [0.0] * 9 + [100.0]
        rows = [(i, 1, "a", i, v) for i, v in enumerate(vals)]
        sf = events_dir(rows)
        out = _events_zscore_outliers(spark, sf).collect()
        # mean 10, sample var (9*100 + 90^2)/9 = 1000, z = 90/sqrt(1000)
        assert len(out) == 1
        assert out[0]["z"] == pytest.approx(90 / math.sqrt(1000), rel=1e-12)


class TestGapfill:
    def test_fills_gap_hours(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_gapfill

        # user 1 observed at hours 0 and 3 -> grid 0..3, hours 1-2 filled
        sf = events_dir(
            [(1, 1, "a", 0, 5.0), (2, 1, "a", 3 * 3600, 9.0)]
        )
        rows = sorted(
            _events_gapfill(spark, sf).collect(), key=lambda r: r["hour"]
        )
        assert len(rows) == 4
        assert [r["value_ffill"] for r in rows] == [5.0, 5.0, 5.0, 9.0]
        assert [r["is_observed"] for r in rows] == [True, False, False, True]

    def test_last_observation_in_hour_wins(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_gapfill

        sf = events_dir(
            [(1, 1, "a", 0, 5.0), (2, 1, "a", 30, 6.0), (3, 1, "a", 30, 7.0)]
        )
        rows = _events_gapfill(spark, sf).collect()
        # latest ts wins; tie on ts -> greatest event_id
        assert len(rows) == 1
        assert rows[0]["value_ffill"] == 7.0


class TestInvertedIndex:
    def test_cap_and_df(self, spark, tmp_path):
        from dynamicqueryengine_spark.workloads.llm import (
            _corpus_inverted_index,
        )

        # 25 docs share the bigram "x y"; postings must cap at 20 while
        # df keeps the full count.
        docs = spark.createDataFrame(
            [(i, "x y", "en", "s", 3) for i in range(25)]
            + [(100, "a b", "en", "s", 3)],
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        )
        d = tmp_path / "sf"
        docs.write.mode("overwrite").parquet(str(d / "documents.parquet"))
        rows = _corpus_inverted_index(spark, str(d)).collect()
        xy = [r for r in rows if r["token"] == "x y"]
        assert len(xy) == 20  # capped postings
        assert all(r["df"] == 25 for r in xy)
        assert [r["doc_id"] for r in sorted(xy, key=lambda r: r["pos"])] == list(
            range(20)
        )
        ab = [r for r in rows if r["token"] == "a b"]
        assert len(ab) == 1 and ab[0]["df"] == 1


class TestSaltedSkewJoin:
    def test_matches_plain_join(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.analytics import (
            _join_salted_skew,
        )

        rows = [(i, i % 7, "hot" if i % 10 else "cold", i, i * 0.5)
                for i in range(200)]
        sf = events_dir(rows)
        got = {
            r["user_id"]: (r["n_events"], r["sum_dev"])
            for r in _join_salted_skew(spark, sf).collect()
        }
        from dynamicqueryengine_spark.sources.registry import load_table

        ev = load_table(spark, sf, "events")
        dim = ev.groupBy("event_type").agg(
            (
                F.sum(F.col("value").cast("decimal(38,12)")).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_v")
        )
        plain = (
            ev.join(dim, "event_type")
            .groupBy("user_id")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(
                    F.sum(
                        (F.col("value") - F.col("avg_v")).cast(
                            "decimal(38,12)"
                        )
                    ).cast("double"),
                    6,
                ).alias("s"),
            )
        )
        want = {r["user_id"]: (r["n"], r["s"]) for r in plain.collect()}
        assert got == want


class TestEwma:
    def test_known_sequence(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_ewma

        # values 8, 4, 0 in time order: seed 8 -> 8*.75+4*.25=7 -> 7*.75+0*.25=5.25
        sf = events_dir([(1, 1, "a", 0, 8.0), (2, 1, "a", 10, 4.0), (3, 1, "a", 20, 0.0)])
        r = _events_ewma(spark, sf).collect()[0]
        assert r["n_events"] == 3
        assert r["ewma"] == 5.25

    def test_single_event_is_seed(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_ewma

        sf = events_dir([(1, 7, "a", 0, 42.0)])
        r = _events_ewma(spark, sf).collect()[0]
        assert r["user_id"] == 7 and r["ewma"] == 42.0

    def test_order_is_by_ts_then_event_id(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_ewma

        # same ts: event_id order decides the fold sequence
        sf = events_dir([(2, 1, "a", 0, 0.0), (1, 1, "a", 0, 8.0)])
        r = _events_ewma(spark, sf).collect()[0]
        assert r["ewma"] == 8.0 * 0.75 + 0.0 * 0.25


class TestJsonKstats:
    def test_malformed_json_counts_as_null(self, spark, tmp_path):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_json_kstats,
        )
        import datetime as dt

        data = [
            (1, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": 10}'),
            (2, dt.datetime(2024, 1, 1), 1, "a", 1.0, "not json"),
            (3, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"other": 1}'),
            (4, dt.datetime(2024, 1, 1), 1, "a", 1.0, '{"k": 30}'),
        ]
        df = spark.createDataFrame(
            data,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        )
        d = tmp_path / "sf"
        df.write.mode("overwrite").parquet(str(d / "events.parquet"))
        r = _events_json_kstats(spark, str(d)).collect()[0]
        assert r["n"] == 4
        assert r["n_null_k"] == 2
        assert r["sum_k"] == 40
        assert (r["min_k"], r["max_k"]) == (10, 30)
        assert r["avg_k"] == 20.0


class TestMadOutliers:
    def test_robust_to_the_outlier_itself(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_mad_outliers,
        )

        # ten 9s + ten 11s + one extreme: n=21 -> median 11, deviations
        # [0 x10, 2 x10, 989] -> MAD = 2; only the extreme passes 6*MAD
        rows = [(i, 1, "a", i, 9.0 if i % 2 else 11.0) for i in range(20)]
        rows.append((99, 1, "a", 99, 1000.0))
        sf = events_dir(rows)
        out = _events_mad_outliers(spark, sf).collect()
        assert [r["event_id"] for r in out] == [99]
        assert out[0]["mad_v"] == 2.0
        assert out[0]["med_v"] == 11.0

    def test_zero_mad_group_flags_any_deviation(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import (
            _events_mad_outliers,
        )

        # constant group -> MAD 0 -> any deviating value flags
        rows = [(i, 1, "a", i, 5.0) for i in range(9)]
        rows.append((99, 1, "a", 99, 5.1))
        sf = events_dir(rows)
        out = _events_mad_outliers(spark, sf).collect()
        assert [r["event_id"] for r in out] == [99]


class TestDauWau:
    def test_trailing_week_distinct(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_dau_wau

        # user 1 active day 0; user 2 active day 5; user 3 active day 10
        rows = [
            (1, 1, "a", 0, 1.0),
            (2, 2, "a", 5 * 86400, 1.0),
            (3, 3, "a", 10 * 86400, 1.0),
        ]
        sf = events_dir(rows)
        got = {r["day"].day: (r["dau"], r["wau"], r["stickiness"])
               for r in _events_dau_wau(spark, sf).collect()}
        # day 1 (Jan 1): only user1 -> dau 1, wau 1
        assert got[1] == (1, 1, 1.0)
        # day 6 (Jan 6): user2 active; user1 was 5 days ago -> wau 2
        assert got[6] == (1, 2, 0.5)
        # day 11 (Jan 11): user3; user2 was 5 days earlier -> wau 2
        assert got[11] == (1, 2, 0.5)

    def test_same_user_multiple_events_counts_once(self, spark, events_dir):
        from dynamicqueryengine_spark.workloads.trends import _events_dau_wau

        rows = [(i, 1, "a", i * 60, 1.0) for i in range(10)]
        sf = events_dir(rows)
        out = _events_dau_wau(spark, sf).collect()
        assert len(out) == 1
        assert (out[0]["dau"], out[0]["wau"]) == (1, 1)
