"""Tests for Gopher-style repetition filtering (functions/repetition.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.repetition import repetition_profile


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRepetitionProfile:
    def test_clean_doc_kept(self, spark):
        df = _docs(spark, [(1, "alpha beta gamma delta epsilon zeta")])
        r = repetition_profile(df).collect()[0]
        assert r["n_words"] == 6 and r["n_distinct_words"] == 6
        assert r["dup_word_fraction"] == 0.0
        assert r["keep"] is True

    def test_phrase_loop_flagged(self, spark):
        df = _docs(spark, [(1, "click here " * 20)])
        r = repetition_profile(df).collect()[0]
        assert r["n_words"] == 40 and r["n_distinct_words"] == 2
        assert r["dup_word_fraction"] > 0.9
        # "click here"/"here click" dominate the bigram stream
        assert r["top_bigram_fraction"] > 0.4
        assert r["keep"] is False

    def test_mean_word_len(self, spark):
        df = _docs(spark, [(1, "aa bbbb")])
        r = repetition_profile(df).collect()[0]
        assert r["mean_word_len"] == 3.0
