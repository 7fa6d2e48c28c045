"""Tests for exact nearest-rank grouped quantiles (functions/quantiles.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.quantiles import group_quantiles


def _vals(spark, rows):
    return spark.createDataFrame(rows, "g string, v long")


def _got(df):
    return {(r["g"], r["p"]): (r["quantile"], r["n"]) for r in df.collect()}


class TestGroupQuantiles:
    def test_nearest_rank_definition(self, spark):
        # n=4, values 10..40: p=0.25→rank 1→10; p=0.5→rank 2→20;
        # p=0.75→rank 3→30; p=0.9→rank ceil(3.6)=4→40; p=0.99→rank 4→40
        df = _vals(spark, [("a", 10), ("a", 20), ("a", 30), ("a", 40)])
        got = _got(group_quantiles(df, "v", "g"))
        assert got[("a", 0.25)] == (10, 4)
        assert got[("a", 0.5)] == (20, 4)
        assert got[("a", 0.75)] == (30, 4)
        assert got[("a", 0.9)] == (40, 4)
        assert got[("a", 0.99)] == (40, 4)

    def test_groups_independent(self, spark):
        df = _vals(spark, [("a", 1), ("a", 100), ("b", 7)])
        got = _got(group_quantiles(df, "v", "g", ps=(0.5,)))
        assert got[("a", 0.5)] == (1, 2)   # ceil(0.5*2)=1
        assert got[("b", 0.5)] == (7, 1)

    def test_ties_pick_the_value(self, spark):
        df = _vals(spark, [("a", 5), ("a", 5), ("a", 5), ("a", 9)])
        got = _got(group_quantiles(df, "v", "g", ps=(0.5, 0.99)))
        assert got[("a", 0.5)] == (5, 4)
        assert got[("a", 0.99)] == (9, 4)

    def test_row_count(self, spark):
        df = _vals(spark, [("a", i) for i in range(100)] + [("b", 1)])
        assert group_quantiles(df, "v", "g").count() == 10

    def test_nulls_excluded_from_rank_and_n(self, spark):
        # NULLs must neither occupy a rank nor inflate n — Spark sorts
        # NULLS FIRST on ASC while DuckDB defaults to NULLS LAST, so
        # admitting them would diverge across engines.
        df = _vals(spark, [("a", None), ("a", 10), ("a", None), ("a", 20)])
        got = _got(group_quantiles(df, "v", "g", ps=(0.5, 0.99)))
        assert got[("a", 0.5)] == (10, 2)
        assert got[("a", 0.99)] == (20, 2)

    def test_all_null_group_vanishes(self, spark):
        df = _vals(spark, [("a", None), ("b", 3)])
        got = _got(group_quantiles(df, "v", "g", ps=(0.5,)))
        assert ("a", 0.5) not in got
        assert got[("b", 0.5)] == (3, 1)


class TestApproxQuantileCheck:
    def test_exact_columns_and_guarantee_hold(self, spark):
        from dynamicqueryengine_spark.functions.quantiles import (
            group_quantiles_approx_check,
        )

        df = _vals(spark, [("a", i) for i in range(200)] + [("b", 7), ("b", 9)])
        rows = group_quantiles_approx_check(df, "v", "g", accuracy=50).collect()
        assert len(rows) == 10  # 2 groups x 5 default ps
        assert all(r["approx_ok"] for r in rows)
        got = {(r["g"], r["p"]): (r["quantile"], r["n"]) for r in rows}
        assert got[("a", 0.5)] == (99, 200)  # ceil(0.5*200)=100 -> value 99
        assert got[("b", 0.5)] == (7, 2)

    def test_low_accuracy_still_within_bound(self, spark):
        from dynamicqueryengine_spark.functions.quantiles import (
            group_quantiles_approx_check,
        )

        df = _vals(spark, [("a", i) for i in range(1000)])
        rows = group_quantiles_approx_check(df, "v", "g", accuracy=10).collect()
        assert rows and all(r["approx_ok"] for r in rows)


class TestHistogramAndDrift:
    """Unit checks for the two temporal-analytics additions (the oracle
    covers values; these pin semantics edge cases)."""

    def test_histogram_clamps_out_of_range(self, spark):
        import __spark_entry__ as entry_mod

        rows = entry_mod.queries()["events_value_histogram"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows
        for r in rows:
            assert 0 <= r["bin"] <= 19
            assert r["bin_hi"] - r["bin_lo"] == 5.0

    def test_drift_mass_conservation(self, spark):
        import __spark_entry__ as entry_mod

        from dynamicqueryengine_spark.sources.registry import load_table

        sf = "/root/testdata/sf0.001"
        rows = entry_mod.queries()["corpus_drift_chisq"](spark, sf).collect()
        total = load_table(spark, sf, "documents").count()
        assert sum(r["n_base"] + r["n_cand"] for r in rows) == total
        assert all(r["chisq_contrib"] >= 0 for r in rows)
