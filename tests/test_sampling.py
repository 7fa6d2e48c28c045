"""Deterministic-sampling invariants: reproducibility, stratum cuts, and
partitioning-independence (the property rand()-based sampling lacks)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.sampling import (
    sample_stratified,
    sample_uniform,
)


def _ids(df):
    return sorted(r["doc_id"] for r in df.collect())


def test_uniform_sample_reproducible_and_partition_invariant(spark):
    df = spark.range(0, 2000).withColumnRenamed("id", "doc_id")
    a = _ids(sample_uniform(df, 0.3))
    b = _ids(sample_uniform(df.repartition(7), 0.3))
    assert a == b  # same rows regardless of partitioning or rerun
    assert 0.2 < len(a) / 2000 < 0.4  # roughly the asked fraction


def test_uniform_sample_monotone_in_fraction(spark):
    df = spark.range(0, 1000).withColumnRenamed("id", "doc_id")
    small = set(_ids(sample_uniform(df, 0.1)))
    big = set(_ids(sample_uniform(df, 0.5)))
    assert small <= big  # nested samples: raising the fraction only adds rows


def test_stratified_cuts_differ_by_stratum(spark):
    rows = [(i, "en" if i % 2 == 0 else "rare") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_stratified(df, {"en": 0.1, "rare": 0.9}).collect()
    en = sum(1 for r in out if r["lang"] == "en")
    rare = sum(1 for r in out if r["lang"] == "rare")
    assert en < 1000 * 0.25 and rare > 1000 * 0.7


def test_stratified_default_fraction_drops_unknown(spark):
    df = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "xx")], "doc_id long, lang string"
    )
    out = sample_stratified(df, {"en": 1.0}).collect()
    assert all(r["lang"] == "en" for r in out)


def test_temperature_squashes_big_strata_keeps_small(spark):
    from dynamicqueryengine_spark.functions.sampling import sample_temperature

    rows = [(i, "en" if i < 1800 else "rare") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = sample_temperature(df).collect()
    en = sum(1 for r in out if r["lang"] == "en")
    rare = sum(1 for r in out if r["lang"] == "rare")
    # smallest stratum rate is exactly 1.0 -> all 200 rare rows kept
    assert rare == 200
    # en rate = sqrt(200/1800) = 1/3 -> about 600 of 1800
    assert 450 < en < 750


def test_temperature_reproducible_and_partition_invariant(spark):
    from dynamicqueryengine_spark.functions.sampling import sample_temperature

    rows = [(i, "a" if i % 3 else "b") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    a = _ids(sample_temperature(df))
    b = _ids(sample_temperature(df.repartition(11)))
    assert a == b


def test_leakage_safe_split_keeps_clusters_together(spark):
    from pyspark.sql import functions as F

    from dynamicqueryengine_spark.functions.sampling import (
        split_leakage_safe,
    )

    docs = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    # two chains (0-1-2, 10-11) plus isolated docs
    pairs = spark.createDataFrame(
        [(0, 1, 0.9), (1, 2, 0.8), (10, 11, 0.95)],
        "id_a long, id_b long, jaccard double",
    )
    split = split_leakage_safe(docs, pairs, 0.2)
    rows = {r["doc_id"]: r for r in split.collect()}
    assert len(rows) == 500
    # every cluster member shares its exemplar's side
    assert {rows[i]["split"] for i in (0, 1, 2)} == {rows[0]["split"]}
    assert rows[10]["split"] == rows[11]["split"]
    assert rows[0]["cluster_size"] == 3 and rows[10]["cluster_size"] == 2
    # no near-dup pair straddles the split (the property under test)
    sides = split.select("doc_id", "split")
    straddle = (
        pairs.join(sides.withColumnRenamed("doc_id", "id_a"), "id_a")
        .withColumnRenamed("split", "sa")
        .join(
            sides.withColumnRenamed("doc_id", "id_b").withColumnRenamed(
                "split", "sb"
            ),
            "id_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0
    # deterministic + partition-invariant, and roughly the asked share
    again = split_leakage_safe(docs.repartition(7), pairs, 0.2)
    assert {(r["doc_id"], r["split"]) for r in again.collect()} == {
        (r["doc_id"], r["split"]) for r in split.collect()
    }
    n_test = sum(1 for r in rows.values() if r["split"] == "test")
    assert 0.1 < n_test / 500 < 0.3


class TestEpochOrder:
    """r14: deterministic epoch shuffle — reproducible global
    permutation keyed by md5(seed:id), seed-decorrelated, and the
    LIMIT form plans as TakeOrdered (no full sort materialized)."""

    def _docs(self, spark, n=50):
        return spark.createDataFrame(
            [(i, f"t{i}") for i in range(n)], "doc_id long, text string"
        )

    def test_reproducible_and_total(self, spark):
        from dynamicqueryengine_spark.functions.sampling import (
            epoch_order,
        )

        df = self._docs(spark)
        a = [r["doc_id"] for r in epoch_order(df, 7).collect()]
        b = [r["doc_id"] for r in epoch_order(df, 7).collect()]
        assert a == b
        assert sorted(a) == list(range(50))  # a true permutation

    def test_seeds_decorrelated(self, spark):
        from dynamicqueryengine_spark.functions.sampling import (
            epoch_order,
        )

        df = self._docs(spark)
        a = [r["doc_id"] for r in epoch_order(df, 1).collect()]
        b = [r["doc_id"] for r in epoch_order(df, 2).collect()]
        assert a != b
        # positional agreement should be near-chance, not near-total
        agree = sum(1 for x, y in zip(a, b) if x == y)
        assert agree < 10

    def test_limit_plans_take_ordered(self, spark):
        from dynamicqueryengine_spark.functions.sampling import (
            epoch_order,
        )

        plan = (
            epoch_order(self._docs(spark), 1)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Sort" in plan  # the write path is a global sort
        lplan = (
            epoch_order(self._docs(spark), 1)
            .limit(5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrdered" in lplan
