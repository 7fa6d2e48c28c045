"""Token-budget mixture sampling: the kept set must be an exact prefix of
the per-stratum hash order, the budget-crossing document must be included,
the bucketed plan must equal the naive one-window formulation, and the
DuckDB oracle must agree value-for-value."""

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dynamicqueryengine_spark.functions.sampling import (
    hash_fraction,
    sample_token_budget,
    sample_token_budget_sql,
)
from dynamicqueryengine_spark.functions.text import token_count_ws


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "s" + str(i % 3), " ".join(["w"] * (3 + i % 7))) for i in range(60)
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def naive(df, budget):
    w = (
        Window.partitionBy("source")
        .orderBy(hash_fraction(F.col("doc_id")).asc(), F.col("doc_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        df.select(
            "doc_id",
            "source",
            token_count_ws(F.col("text")).cast("long").alias("tok_ws"),
        )
        .withColumn("cum_before", F.coalesce(F.sum("tok_ws").over(w), F.lit(0)))
        .filter(F.col("cum_before") < budget)
    )


class TestTokenBudget:
    def test_matches_naive_window(self, docs):
        for budget in (1, 25, 60, 10_000):
            got = {
                (r["doc_id"], r["cum_before"])
                for r in sample_token_budget(docs, budget, buckets=4).collect()
            }
            want = {
                (r["doc_id"], r["cum_before"]) for r in naive(docs, budget).collect()
            }
            assert got == want, budget

    def test_prefix_property_and_crossing_doc(self, docs):
        out = sample_token_budget(docs, 30, buckets=4).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r["source"], []).append(r)
        for src, rows in by_src.items():
            rows.sort(key=lambda r: r["cum_before"])
            # contiguous prefix: each cum_before = previous cum + previous tok
            acc = 0
            for r in rows:
                assert r["cum_before"] == acc
                acc += r["tok_ws"]
            # the crossing doc is included: last kept row straddles the budget
            assert rows[-1]["cum_before"] < 30 <= acc

    def test_per_stratum_budgets(self, docs):
        out = sample_token_budget(docs, {"s0": 10, "s1": 10_000}, buckets=4)
        rows = out.collect()
        assert {r["source"] for r in rows} == {"s0", "s1"}  # s2 unbudgeted: dropped
        s1 = [r for r in rows if r["source"] == "s1"]
        assert len(s1) == 20  # unlimited budget keeps the whole stratum

    def test_oracle_parity(self, docs):
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        oracle = con.execute(sample_token_budget_sql("documents", 25)).fetchall()
        got = {
            (r["doc_id"], r["source"], r["tok_ws"], r["cum_before"])
            for r in sample_token_budget(docs, 25, buckets=4).collect()
        }
        assert got == {(a, b, c, d) for a, b, c, d in oracle}
