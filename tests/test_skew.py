"""Skew-utility equivalence tests: the skew-safe reformulations must produce
exactly the same results as the naive aggregations on skewed data."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.operators.skew import (
    count_distinct_unskewed,
    salted_collect_set,
)


@pytest.fixture(scope="module")
def skewed(spark):
    """One hot key holding ~90% of rows, plus a long tail."""
    hot = [("hot", f"v{i % 500}") for i in range(9000)]
    tail = [(f"k{i % 50}", f"v{i}") for i in range(1000)]
    return spark.createDataFrame(hot + tail, "k STRING, v STRING")


def test_count_distinct_matches_naive(skewed):
    safe = {
        r["k"]: r["n_distinct"]
        for r in count_distinct_unskewed(skewed, ["k"], "v").collect()
    }
    naive = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert safe == naive
    assert safe["hot"] == 500


def test_collect_set_matches_naive(skewed):
    safe = {
        r["k"]: sorted(r["values"])
        for r in salted_collect_set(skewed, ["k"], "v").collect()
    }
    naive = {
        r["k"]: sorted(r["s"])
        for r in skewed.groupBy("k").agg(F.collect_set("v").alias("s")).collect()
    }
    assert safe == naive


def test_null_group_keys_counted(spark):
    """NULL is a legal grouping value: the join back from the deduped count
    table must be null-safe or NULL-keyed groups silently report 0."""
    df = spark.createDataFrame(
        [(None, "x"), (None, "y"), (None, None), ("a", "x"), (None, "x")],
        "k STRING, v STRING",
    )
    out = {
        r["k"]: r["n_distinct"]
        for r in count_distinct_unskewed(df, ["k"], "v").collect()
    }
    naive = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert out == naive == {None: 2, "a": 1}


def test_null_multi_key_groups(spark):
    df = spark.createDataFrame(
        [(None, "g", "x"), (None, "g", "y"), ("a", None, "x"), (None, None, None)],
        "k1 STRING, k2 STRING, v STRING",
    )
    out = {
        (r["k1"], r["k2"]): r["n_distinct"]
        for r in count_distinct_unskewed(df, ["k1", "k2"], "v").collect()
    }
    assert out == {(None, "g"): 2, ("a", None): 1, (None, None): 0}


def test_null_values_excluded(spark):
    df = spark.createDataFrame(
        [("a", "x"), ("a", None), ("a", "y"), ("b", None)], "k STRING, v STRING"
    )
    out = {r["k"]: r["n_distinct"] for r in count_distinct_unskewed(df, ["k"], "v").collect()}
    naive = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.countDistinct("v").alias("n")).collect()
    }
    assert out == naive == {"a": 2, "b": 0}  # all-null group keeps its 0 row


class TestSaltedJoin:
    def test_inner_matches_plain_join(self, spark, skewed):
        from dynamicqueryengine_spark.operators.skew import salted_join

        dim = spark.createDataFrame(
            [("hot", 1), ("k1", 2), ("k2", 3), ("missing", 9)], "k STRING, tag INT"
        )
        got = sorted(
            (r["k"], r["v"], r["tag"])
            for r in salted_join(skewed, dim, ["k"], buckets=8).collect()
        )
        want = sorted(
            (r["k"], r["v"], r["tag"]) for r in skewed.join(dim, "k").collect()
        )
        assert got == want and len(got) > 0

    def test_left_keeps_unmatched_rows(self, spark, skewed):
        from dynamicqueryengine_spark.operators.skew import salted_join

        dim = spark.createDataFrame([("k1", 2)], "k STRING, tag INT")
        got = salted_join(skewed, dim, ["k"], buckets=4, how="left")
        assert got.count() == skewed.count()
        assert got.filter(F.col("tag").isNull()).count() == skewed.filter(
            F.col("k") != "k1"
        ).count()

    def test_null_keys_never_match(self, spark):
        from dynamicqueryengine_spark.operators.skew import salted_join

        big = spark.createDataFrame([("a", 1), (None, 2)], "k STRING, x INT")
        dim = spark.createDataFrame([("a", 10), (None, 20)], "k STRING, tag INT")
        got = sorted(
            (r["k"], r["x"], r["tag"])
            for r in salted_join(big, dim, ["k"], buckets=2).collect()
        )
        assert got == [("a", 1, 10)]

    def test_rejects_outer_joins(self, spark, skewed):
        from dynamicqueryengine_spark.operators.skew import salted_join

        with pytest.raises(ValueError):
            salted_join(skewed, skewed, ["k"], how="full")
