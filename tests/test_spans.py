"""Repeated-span detection: planted boilerplate must dominate the
repeated fraction; unique prose must not."""

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions.spans import (
    flag_repeated_spans,
    repeated_span_profile,
)

BOILER = "this content is provided as is without warranty of any kind"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # two docs sharing an 11-token boilerplate block + unique tails
        (1, BOILER + " alpha beta gamma delta epsilon zeta eta theta"),
        (2, BOILER + " one two three four five six seven eight nine"),
        # fully unique doc
        (3, "completely original sentence with no shared spans anywhere at all ever"),
        # too short for a 5-gram
        (4, "tiny doc"),
        # empty
        (5, ""),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepeatedSpans:
    def test_profile_values(self, corpus):
        out = {r["doc_id"]: r for r in repeated_span_profile(corpus, n=5).collect()}
        assert set(out) == {1, 2, 3, 4, 5}
        # the 11-token boilerplate contributes 7 shared 5-grams to each doc
        assert out[1]["n_repeated"] == 7 and out[2]["n_repeated"] == 7
        # doc 1: 19 tokens → 15 5-grams, all distinct
        assert out[1]["n_spans"] == 15
        assert out[1]["repeated_frac"] == pytest.approx(7 / 15)
        assert out[3]["n_repeated"] == 0 and out[3]["repeated_frac"] == 0.0
        assert out[4]["n_spans"] == 0 and out[4]["repeated_frac"] == 0.0
        assert out[5]["n_spans"] == 0 and out[5]["repeated_frac"] == 0.0

    def test_flag_threshold(self, corpus):
        flagged = {r["doc_id"] for r in flag_repeated_spans(corpus, n=5, max_frac=0.4).collect()}
        assert flagged == {1, 2}
        none = flag_repeated_spans(corpus, n=5, max_frac=0.99).collect()
        assert none == []

    def test_duplicate_grams_within_doc_counted_once(self, spark):
        # "a b c d e" appears twice inside doc 10 — distinct grams only
        df = spark.createDataFrame(
            [(10, "a b c d e x a b c d e"), (11, "a b c d e unrelated tail here")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in repeated_span_profile(df, n=5).collect()}
        # doc 10: 11 tokens → 7 positions but "a b c d e" duplicated → 6 distinct
        assert out[10]["n_spans"] == 6
        # shared gram with doc 11: exactly "a b c d e"
        assert out[10]["n_repeated"] >= 1

    def test_oracle_parity_small(self, spark, corpus, tmp_path):
        import duckdb

        from dynamicqueryengine_spark.functions.spans import (
            repeated_span_profile_sql,
        )

        pdf = corpus.toPandas()
        con = duckdb.connect()
        con.register("documents", pdf)
        oracle = con.execute(
            repeated_span_profile_sql("documents", n=5, min_df=2)
        ).fetch_df()
        spark_rows = {
            r["doc_id"]: (r["n_spans"], r["n_repeated"], r["repeated_frac"])
            for r in repeated_span_profile(corpus, n=5).collect()
        }
        for _, row in oracle.iterrows():
            assert spark_rows[row["doc_id"]] == (
                row["n_spans"],
                row["n_repeated"],
                pytest.approx(row["repeated_frac"]),
            )
