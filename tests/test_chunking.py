"""Tests for document chunking / sequence packing (functions/chunking.py)."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark.functions.chunking import chunk_documents


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestChunkDocuments:
    def test_non_overlapping_with_tail(self, spark):
        df = _docs(spark, [(1, "a1 b2 c3 d4 e5")])
        rows = sorted(
            (r["chunk_idx"], r["n_tokens"], r["chunk_text"])
            for r in chunk_documents(df, chunk_tokens=2).collect()
        )
        assert rows == [
            (0, 2, "a1 b2"),
            (1, 2, "c3 d4"),
            (2, 1, "e5"),  # partial tail kept
        ]

    def test_overlapping_stride(self, spark):
        df = _docs(spark, [(1, "w1 w2 w3 w4 w5 w6")])
        rows = sorted(
            (r["chunk_idx"], r["chunk_text"])
            for r in chunk_documents(df, chunk_tokens=4, stride=2).collect()
        )
        assert rows == [
            (0, "w1 w2 w3 w4"),
            (1, "w3 w4 w5 w6"),
            (2, "w5 w6"),
        ]

    def test_empty_and_null_docs_yield_no_chunks(self, spark):
        df = _docs(spark, [(1, ""), (2, None), (3, "  ,,  ")])
        assert chunk_documents(df, chunk_tokens=4).count() == 0

    def test_bad_params_raise(self, spark):
        df = _docs(spark, [(1, "x")])
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=0)
        with pytest.raises(ValueError):
            chunk_documents(df, chunk_tokens=4, stride=-1)
