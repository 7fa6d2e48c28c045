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


class TestPackingProperties:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(_DOC, min_size=1, max_size=12),
        seq_len=st.integers(2, 9),
        buckets=st.integers(1, 7),
    )
    def test_matches_python_prefix_sum(self, spark, docs, seq_len, buckets):
        from dynamicqueryengine_spark.functions.packing import pack_sequences

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["start_offset"], r["seq_idx"], r["n_seqs"])
            for r in pack_sequences(
                df, seq_len=seq_len, buckets=buckets
            ).collect()
        }
        # independent reference: ws token counts in id order
        start = 0
        expect = {}
        for i, text in enumerate(docs):
            tok = len(text.split()) if text.strip() else 0
            if tok > 0:
                expect[i] = (
                    start,
                    start // seq_len,
                    (start + tok - 1) // seq_len - start // seq_len + 1,
                )
                start += tok
        assert got == expect


class TestCmsProperties:
    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    @given(
        docs=st.lists(_DOC, min_size=1, max_size=8),
        width=st.sampled_from([8, 32, 512]),
    )
    def test_one_sided_error_and_mass(self, spark, docs, width):
        from collections import Counter

        from dynamicqueryengine_spark.functions.cms import (
            _words,
            cms_build,
            cms_topk_estimates,
        )

        df = spark.createDataFrame(
            list(enumerate(docs)), "doc_id long, text string"
        )
        exact = Counter(
            w for d in docs for w in d.lower().split() if w
        )
        rows = cms_topk_estimates(df, k=50, depth=3, width=width).collect()
        for r in rows:
            assert r["exact_count"] == exact[r["word"]]
            assert r["cms_est"] >= r["exact_count"]  # one-sided guarantee
        sketch = cms_build(_words(df, "text"), "w", depth=3, width=width)
        from pyspark.sql import functions as F

        mass = sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
        total = sum(exact.values())
        if total:
            assert sorted(r["s"] for r in mass) == [total] * 3
