"""Tests for benchmark decontamination (functions/decontaminate.py):
n-gram generation parity cases, contamination flagging, anti-join
removal, and short-document edge cases."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.decontaminate import (
    contamination_flags,
    decontaminate,
    word_ngrams,
)


def _docs_df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestWordNgrams:
    def test_basic_trigrams(self, spark):
        df = _docs_df(spark, [(1, "the quick brown fox jumps")])
        got = sorted(
            r["ngram"] for r in word_ngrams(df, 3).collect()
        )
        assert got == sorted(
            ["the quick brown", "quick brown fox", "brown fox jumps"]
        )

    def test_normalization_collapses_punct_and_case(self, spark):
        df = _docs_df(spark, [(1, "The,QUICK...brown")])
        got = [r["ngram"] for r in word_ngrams(df, 3).collect()]
        assert got == ["the quick brown"]

    def test_short_doc_yields_nothing(self, spark):
        df = _docs_df(spark, [(1, "too short"), (2, ""), (3, None)])
        assert word_ngrams(df, 3).count() == 0


class TestContamination:
    def test_flags_and_removal(self, spark):
        docs = _docs_df(
            spark,
            [
                (1, "alpha beta gamma delta epsilon"),
                (2, "zeta eta theta iota kappa"),
                (3, "unrelated words entirely different here"),
            ],
        )
        bench = _docs_df(spark, [(100, "beta gamma delta")])
        flags = {
            r["doc_id"]: r["contaminated"]
            for r in contamination_flags(docs, bench, n=3).collect()
        }
        assert flags == {1: True, 2: False, 3: False}

        kept = sorted(
            r["doc_id"] for r in decontaminate(docs, bench, n=3).collect()
        )
        assert kept == [2, 3]

    def test_benchmark_contaminates_itself_when_subset(self, spark):
        docs = _docs_df(
            spark,
            [
                (1, "one two three four five six"),
                (2, "seven eight nine ten eleven twelve"),
            ],
        )
        bench = docs.filter("doc_id = 1")
        flags = {
            r["doc_id"]: r["contaminated"]
            for r in contamination_flags(docs, bench, n=5).collect()
        }
        assert flags == {1: True, 2: False}
