"""Tests for sequence packing (functions/packing.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.packing import pack_sequences


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


class TestPackSequences:
    def test_offsets_follow_concat_order(self, spark):
        # tok counts: 3, 2, 4 → starts 0, 3, 5
        docs = _docs(spark, [(1, "a b c"), (2, "d e"), (3, "f g h i")])
        got = _by_id(pack_sequences(docs, seq_len=4))
        assert got[1]["start_offset"] == 0 and got[1]["seq_idx"] == 0
        assert got[2]["start_offset"] == 3 and got[2]["offset_in_seq"] == 3
        assert got[3]["start_offset"] == 5 and got[3]["seq_idx"] == 1
        assert got[3]["offset_in_seq"] == 1

    def test_boundary_spanning(self, spark):
        # doc 2 occupies positions 3..6 with seq_len 4 → spans seqs 0 and 1
        docs = _docs(spark, [(1, "a b c"), (2, "d e f g")])
        got = _by_id(pack_sequences(docs, seq_len=4))
        assert got[1]["n_seqs"] == 1
        assert got[2]["n_seqs"] == 2
        # doc ending exactly at a boundary does NOT spill
        docs2 = _docs(spark, [(1, "a b c d"), (2, "e")])
        got2 = _by_id(pack_sequences(docs2, seq_len=4))
        assert got2[1]["n_seqs"] == 1 and got2[2]["seq_idx"] == 1

    def test_empty_docs_excluded(self, spark):
        docs = _docs(spark, [(1, "a b"), (2, "   "), (3, "c")])
        got = _by_id(pack_sequences(docs, seq_len=4))
        assert set(got) == {1, 3}
        assert got[3]["start_offset"] == 2  # the empty doc occupies nothing

    def test_bucketed_matches_naive_on_many_buckets(self, spark):
        # more buckets than docs: every bucket holds ≤1 doc, the per-bucket
        # window is trivial, and values must still equal the global prefix
        rows = [(i, " ".join(["w"] * (i % 7 + 1))) for i in range(1, 41)]
        docs = _docs(spark, rows)
        a = _by_id(pack_sequences(docs, seq_len=16, buckets=64))
        b = _by_id(pack_sequences(docs, seq_len=16, buckets=1))
        assert a == b

    def test_total_token_conservation(self, spark):
        rows = [(i, " ".join(["w"] * (3 * i % 11 + 1))) for i in range(1, 31)]
        got = pack_sequences(_docs(spark, rows), seq_len=8).collect()
        total = sum(r["tok_ws"] for r in got)
        last = max(got, key=lambda r: r["start_offset"])
        assert last["start_offset"] + last["tok_ws"] == total
