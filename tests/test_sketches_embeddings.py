"""Tests for the KMV distinct sketch (functions/sketches.py) and int8
embedding quantization (functions/embeddings.py): estimator accuracy and
exact-below-k behavior for KMV; round-trip bounds and DuckDB parity for
the quantizer."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions.embeddings import (
    quantize_int8,
    quantize_int8_sql,
)
from dynamicqueryengine_spark.functions.sketches import kmv_distinct


class TestKmvDistinct:
    def test_exact_below_k(self, spark):
        # 10 distinct keys < k=64 → estimate must be exactly 10
        df = spark.createDataFrame(
            [("g", i % 10) for i in range(100)], "g string, key long"
        )
        row = kmv_distinct(df, "key", ["g"], k=64).collect()[0]
        assert row["n_kept"] == 10
        assert row["est_distinct"] == 10.0

    def test_estimate_within_error_bound(self, spark):
        # 5000 distinct keys, k=256 → stderr ≈ 1/√254 ≈ 6.3%; assert 4σ
        df = spark.range(5000).select(
            F.lit("g").alias("g"), F.col("id").alias("key")
        )
        row = kmv_distinct(df, "key", ["g"], k=256).collect()[0]
        assert row["n_kept"] == 256
        assert abs(row["est_distinct"] - 5000) / 5000 < 0.25

    def test_duplicates_do_not_inflate(self, spark):
        once = spark.range(1000).select(F.lit("g").alias("g"), F.col("id").alias("key"))
        thrice = once.union(once).union(once)
        r1 = kmv_distinct(once, "key", ["g"], k=64).collect()[0]
        r3 = kmv_distinct(thrice, "key", ["g"], k=64).collect()[0]
        assert r1["kth_hash"] == r3["kth_hash"]
        assert r1["est_distinct"] == r3["est_distinct"]

    def test_per_group_independence(self, spark):
        df = spark.createDataFrame(
            [("a", i) for i in range(10)] + [("b", i) for i in range(30)],
            "g string, key long",
        )
        got = {
            r["g"]: r["est_distinct"]
            for r in kmv_distinct(df, "key", ["g"], k=64).collect()
        }
        assert got == {"a": 10.0, "b": 30.0}


class TestQuantizeInt8:
    @pytest.fixture(scope="class")
    def vecs(self, spark):
        return spark.createDataFrame(
            [
                (1, [1.0, -2.0, 0.5]),
                (2, [0.0, 0.0, 0.0]),     # all-zero → scale 0, code 0
                (3, [127.0]),
                (4, [-0.001, 0.001, 1000.0]),  # huge dynamic range
            ],
            "vec_id long, embedding array<float>",
        )

    def test_code_range_and_zero_vector(self, spark, vecs):
        rows = {r["vec_id"]: r for r in quantize_int8(vecs).collect()}
        for r in rows.values():
            assert all(-127 <= q <= 127 for q in r["qvec"])
        assert rows[2]["scale"] == 0.0
        assert rows[2]["qvec"] == [0, 0, 0]
        assert rows[2]["q_l1"] == 0
        # max-magnitude element always quantizes to ±127
        assert max(abs(q) for q in rows[1]["qvec"]) == 127
        assert rows[3]["qvec"] == [127]
        assert rows[4]["qvec"][2] == 127

    def test_round_trip_error_bounded(self, spark, vecs):
        # |x - q/scale| ≤ 0.5/scale = maxabs/254 per element
        for r in quantize_int8(vecs).collect():
            if r["scale"] == 0.0:
                continue
            orig = {1: [1.0, -2.0, 0.5], 3: [127.0],
                    4: [-0.001, 0.001, 1000.0]}[r["vec_id"]]
            for x, q in zip(orig, r["qvec"]):
                assert abs(x - q / r["scale"]) <= 0.5 / r["scale"] + 1e-9

    def test_matches_duckdb_oracle(self, spark, vecs):
        import pandas as pd

        pdf = vecs.toPandas()
        con = duckdb.connect()
        con.register("embeddings", pdf)
        got = {
            r["vec_id"]: r for r in quantize_int8(vecs).collect()
        }
        for vid, scale, qvec, q_l1 in con.execute(
            quantize_int8_sql("embeddings")
        ).fetchall():
            assert got[vid]["scale"] == scale
            assert got[vid]["qvec"] == qvec
            assert got[vid]["q_l1"] == q_l1


class TestGroupCentroids:
    def test_known_means_and_partition_invariance(self, spark):
        from dynamicqueryengine_spark.functions.embeddings import group_centroids

        rows = [
            ("a", [1.0, 2.0]),
            ("a", [3.0, 6.0]),
            ("b", [10.0, 0.0]),
        ]
        df = spark.createDataFrame(rows, "label string, embedding array<float>")
        got = {
            (r["label"], r["dim"]): (r["centroid"], r["n"])
            for r in group_centroids(df).collect()
        }
        assert got == {
            ("a", 1): (2.0, 2),
            ("a", 2): (4.0, 2),
            ("b", 1): (10.0, 1),
            ("b", 2): (0.0, 1),
        }
        # decimal-exact sum: identical result under any partitioning
        got2 = {
            (r["label"], r["dim"]): (r["centroid"], r["n"])
            for r in group_centroids(df.repartition(5)).collect()
        }
        assert got == got2


class TestKmvSetEstimates:
    def test_overlapping_groups(self, spark):
        from dynamicqueryengine_spark.functions.sketches import (
            kmv_set_estimates,
        )

        # group A: keys 0..999; group B: keys 500..1499 -> union 1500,
        # intersection 500
        rows = [("A", i) for i in range(1000)] + [
            ("B", i) for i in range(500, 1500)
        ]
        df = spark.createDataFrame(rows, "g string, key long")
        r = kmv_set_estimates(df, "key", "g", k=64).collect()[0]
        assert (r["group_a"], r["group_b"]) == ("A", "B")
        assert r["union_exact"] == 1500
        assert r["inter_exact"] == 500
        # k=64 -> stderr ~ 1/sqrt(62) ~ 12.7%; allow 4 sigma
        assert abs(r["union_est"] - 1500) < 1500 * 0.51
        assert abs(r["inter_est"] - 500) < 500 * 1.0
        assert r["inter_est"] <= r["union_est"]

    def test_disjoint_groups_estimate_zero_intersection(self, spark):
        from dynamicqueryengine_spark.functions.sketches import (
            kmv_set_estimates,
        )

        rows = [("A", i) for i in range(300)] + [
            ("B", i) for i in range(1000, 1300)
        ]
        df = spark.createDataFrame(rows, "g string, key long")
        r = kmv_set_estimates(df, "key", "g", k=64).collect()[0]
        assert r["inter_exact"] == 0
        assert r["inter_est"] == 0.0
        assert r["union_exact"] == 600

    def test_small_groups_are_exact(self, spark):
        from dynamicqueryengine_spark.functions.sketches import (
            kmv_set_estimates,
        )

        rows = [("A", i) for i in range(20)] + [("B", i) for i in range(10, 40)]
        df = spark.createDataFrame(rows, "g string, key long")
        r = kmv_set_estimates(df, "key", "g", k=64).collect()[0]
        # both groups under k -> union sketch is exact, and so is the
        # intersection estimate (|L| denominator, not k)
        assert r["union_est"] == r["union_exact"] == 40
        assert r["inter_exact"] == 10
        assert r["inter_est"] == 10.0
