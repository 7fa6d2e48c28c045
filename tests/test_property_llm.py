"""Property-based tests for the round-2 LLM-pipeline operators: each op
is checked against an independent pure-Python reference on randomized
inputs (hypothesis), partition-invariance included."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings, strategies as st

from dynamicqueryengine_spark.functions.chunking import chunk_documents
from dynamicqueryengine_spark.functions.repetition import repetition_profile

_WORD = st.text(alphabet="abc12XY.,!", min_size=1, max_size=6)
_DOC = st.lists(_WORD, min_size=0, max_size=40).map(" ".join)


def _norm_words(text):
    return [w for w in re.sub(r"[^a-z0-9]+", " ", text.lower()).strip().split(" ") if w]


class TestChunkingProperties:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=st.lists(_DOC, min_size=1, max_size=6), chunk=st.integers(2, 7))
    def test_chunks_reassemble_to_normalized_text(self, spark, docs, chunk):
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        rows = chunk_documents(df, chunk_tokens=chunk).collect()
        got = {}
        for r in sorted(rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
            got.setdefault(r["doc_id"], []).append(r["chunk_text"])
            assert 1 <= r["n_tokens"] <= chunk
        for i, text in enumerate(docs):
            words = _norm_words(text)
            if not words:
                assert i not in got
            else:
                assert " ".join(got[i]).split(" ") == words


class TestRepetitionProperties:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(docs=st.lists(_DOC, min_size=1, max_size=6))
    def test_counts_match_python_reference(self, spark, docs):
        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        rows = {r["doc_id"]: r for r in repetition_profile(df).collect()}
        for i, text in enumerate(docs):
            words = _norm_words(text)
            bigrams = list(zip(words, words[1:]))
            if not bigrams:
                assert i not in rows  # needs >= 2 words to be profiled
                continue
            r = rows[i]
            assert r["n_words"] == len(words)
            assert r["n_distinct_words"] == len(set(words))
            top = max(bigrams.count(b) for b in set(bigrams))
            assert r["top_bigram_fraction"] == top / len(bigrams)
