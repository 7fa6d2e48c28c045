"""Tests for BPE pair counting (functions/bpe.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.bpe import bpe_pair_counts


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBpePairCounts:
    def test_counts_and_total_order(self, spark):
        # "abab": pairs ab, ba, ab; "abba": ab, bb, ba
        docs = _docs(spark, [(1, "abab"), (2, "abba")])
        rows = bpe_pair_counts(docs, k=10).collect()
        got = {(r["left"], r["right"]): r["pair_count"] for r in rows}
        assert got == {("a", "b"): 3, ("b", "a"): 2, ("b", "b"): 1}
        # total order: count desc, then (left, right) asc — row 1 is the merge
        assert (rows[0]["left"], rows[0]["right"]) == ("a", "b")

    def test_occurrence_weighted_not_distinct(self, spark):
        # the same word repeated contributes every occurrence (BPE objective)
        docs = _docs(spark, [(1, "of of of"), (2, "of")])
        rows = bpe_pair_counts(docs, k=1).collect()
        assert (rows[0]["left"], rows[0]["right"], rows[0]["pair_count"]) == (
            "o", "f", 4)

    def test_normalization_and_short_words(self, spark):
        # punctuation splits words; single chars form no pair; case folds
        docs = _docs(spark, [(1, "A.B c-d! x")])
        rows = bpe_pair_counts(docs, k=10).collect()
        assert rows == []  # a, b, c, d, x all length-1 after splitting

    def test_tie_break_is_deterministic(self, spark):
        docs = _docs(spark, [(1, "xy"), (2, "ab")])
        rows = bpe_pair_counts(docs, k=2).collect()
        assert [(r["left"], r["right"]) for r in rows] == [("a", "b"), ("x", "y")]

    def test_k_limits(self, spark):
        docs = _docs(spark, [(1, "abcdef")])
        assert len(bpe_pair_counts(docs, k=3).collect()) == 3


class TestBpeEncode:
    def test_merge_chain_collapses_known_words(self, spark):
        from dynamicqueryengine_spark.functions.bpe import bpe_encode_counts

        df = spark.createDataFrame(
            [(1, "table"), (2, "query"), (3, "xyz"), (4, "table query")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in bpe_encode_counts(df).collect()}
        assert out[1]["n_bpe"] == 1       # t-a-b-l-e fully merged
        assert out[2]["n_bpe"] == 1       # q-u-e-r-y fully merged
        assert out[3]["n_bpe"] == 3       # no merges apply
        assert out[4]["n_bpe"] == 2       # boundaries block cross-word merges
        assert out[1]["compression"] == 5.0

    def test_overlap_chain_needs_second_pass(self, spark):
        from dynamicqueryengine_spark.functions.bpe import bpe_encode_counts

        # "tatata": three overlapping 'ta' merge sites — a single global
        # regex pass merges sites 1 and 3, the second pass catches site 2
        df = spark.createDataFrame(
            [(1, "tatata")], "doc_id long, text string"
        )
        r = bpe_encode_counts(df).collect()[0]
        assert r["n_sym"] == 6
        assert r["n_bpe"] == 3  # ta ta ta

    def test_metachar_merges_are_escaped(self, spark, users_duck):
        """Merge symbols with regex/SQL metacharacters must be treated
        literally on BOTH sides: the Spark encode must not blow up or
        mis-merge, and the generated SQL must still parse in DuckDB.
        (The alnum normal form strips such symbols from the TEXT, so
        these merges match nothing — output equals the no-merge case.)"""
        import duckdb

        from dynamicqueryengine_spark.functions.bpe import (
            bpe_encode_counts,
            bpe_encode_counts_sql,
        )

        hostile = (("a", "+"), ("$", "b"), ("'", "x"), ("\\", "d"), ("a", "n"))
        df = spark.createDataFrame(
            [(1, "an a+b table's $5")], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_sym"], r["n_bpe"])
            for r in bpe_encode_counts(df, merges=hostile).collect()
        }
        # normalized stream: "an a b table s 5" (11 symbols) → only
        # ("a","n") merges, collapsing "a n" to one token: 10 tokens
        assert got == {1: (11, 10)}
        con = duckdb.connect()
        con.execute("CREATE TABLE docs (doc_id BIGINT, text VARCHAR)")
        con.execute("INSERT INTO docs VALUES (1, 'an a+b table''s $5')")
        sql = bpe_encode_counts_sql("docs", merges=hostile)
        oracle = {
            r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()
        }
        assert oracle == got
        con.close()
