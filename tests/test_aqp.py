"""Approximate query processing (functions/aqp.py): Horvitz-Thompson
estimates from the deterministic hash sample, with error bounds."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions.aqp import (
    _inv,
    approx_groupby,
)
from dynamicqueryengine_spark.functions.sampling import hash_fraction


def _pop(spark, n=4000):
    return spark.createDataFrame(
        [(i, "g%d" % (i % 2), float(i % 100)) for i in range(n)],
        "id long, g string, v double",
    )


class TestApproxGroupby:
    def test_estimates_near_truth_with_honest_se(self, spark):
        df = _pop(spark)
        out = {
            r["g"]: r
            for r in approx_groupby(
                df, "id", "v", ["g"], fraction=0.25
            ).collect()
        }
        truth = {
            r["g"]: r
            for r in df.groupBy("g")
            .agg(
                F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
            )
            .collect()
        }
        for g, r in out.items():
            # HT is unbiased; at n≈2000/group the estimate should land
            # within 4 standard errors of the truth (deterministic
            # sample — this is a fixed fact, not a flaky bound)
            assert abs(r["est_count"] - truth[g]["n"]) <= 4 * r["se_count"]
            assert abs(r["est_sum"] - truth[g]["s"]) <= 4 * r["se_sum"]
            assert r["n_sampled"] * 4 == r["est_count"]

    def test_estimator_arithmetic_exact(self, spark):
        """est/se recomputed from the sample rows themselves — pins the
        HT formulas (k·n, k·sum, sqrt((k²−k)·Σx²))."""
        df = _pop(spark, 1000)
        k = 4
        sample = (
            df.filter(hash_fraction(F.col("id")) < F.lit(1 / k))
            .collect()
        )
        by_g: dict = {}
        for r in sample:
            a = by_g.setdefault(r["g"], [0, 0.0, 0.0])
            a[0] += 1
            a[1] += r["v"]
            a[2] += r["v"] * r["v"]
        out = {
            r["g"]: r
            for r in approx_groupby(
                df, "id", "v", ["g"], fraction=0.25
            ).collect()
        }
        vm = k * k - k
        for g, (n, s, ss) in by_g.items():
            r = out[g]
            assert r["n_sampled"] == n
            assert r["est_count"] == n * k
            assert r["est_sum"] == pytest.approx(s * k, abs=1e-6)
            assert r["se_count"] == pytest.approx(
                round(math.sqrt(n * vm), 6), abs=1e-9
            )
            assert r["se_sum"] == pytest.approx(
                round(math.sqrt(ss * vm), 6), abs=1e-4
            )

    def test_non_unit_fraction_rejected(self, spark):
        with pytest.raises(ValueError, match="1/k"):
            approx_groupby(_pop(spark, 10), "id", "v", ["g"], 0.3)
        assert _inv(0.125) == 8

    def test_sample_filter_reaches_scan(self, spark, tmp_path):
        """The hash cut must prune at the source — a sampled aggregate
        that still scans every row has no AQP story. The md5 filter is
        not a parquet-pushable predicate, but it must at least sit
        directly on the scan (no shuffle of unsampled rows)."""
        p = str(tmp_path / "t")
        _pop(spark).write.parquet(p)
        out = approx_groupby(
            spark.read.parquet(p), "id", "v", ["g"], fraction=0.25
        )
        plan = out._jdf.queryExecution().executedPlan().toString()
        # exactly one exchange (the groupBy) — the filter runs map-side
        assert plan.count("Exchange") == 1


class TestStratified:
    def test_per_stratum_rates_and_estimates(self, spark):
        from dynamicqueryengine_spark.functions.aqp import (
            approx_groupby_stratified,
        )

        df = _pop(spark, 4000)  # strata g0/g1, 2000 each
        out = {
            r["g"]: r
            for r in approx_groupby_stratified(
                df, "id", "v", "g", {"g0": 0.5}, default_fraction=0.125
            ).collect()
        }
        # the rare-class stratum (g0 at 1/2) samples ~4x the default
        assert out["g0"]["n_sampled"] > 2.5 * out["g1"]["n_sampled"]
        # per-stratum k applied: est_count = n_sampled * k_s
        assert out["g0"]["est_count"] == out["g0"]["n_sampled"] * 2
        assert out["g1"]["est_count"] == out["g1"]["n_sampled"] * 8
        # both estimates still land near the 2000-row truth
        for g, r in out.items():
            assert abs(r["est_count"] - 2000) <= 4 * r["se_count"]
        # tighter rate => tighter relative error bound
        assert (
            out["g0"]["se_count"] / out["g0"]["est_count"]
            < out["g1"]["se_count"] / out["g1"]["est_count"]
        )

    def test_stratified_fraction_validation(self, spark):
        from dynamicqueryengine_spark.functions.aqp import (
            approx_groupby_stratified,
        )

        with pytest.raises(ValueError, match="1/k"):
            approx_groupby_stratified(
                _pop(spark, 10), "id", "v", "g", {"g0": 0.3}
            )
