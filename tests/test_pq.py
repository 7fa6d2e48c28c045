"""Tests for product-quantization ANN (functions/pq.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.pq import (
    ivfpq_topk,
    pq_codebooks,
    pq_topk,
)
from dynamicqueryengine_spark.functions.similarity import cosine_topk


def _embs(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestPq:
    def test_codebooks_shape_and_determinism(self, spark):
        vecs = [[float(i + j) for j in range(8)] for i in range(20)]
        df = _embs(spark, vecs)
        cb = pq_codebooks(df, n_sub=4, n_codes=3)
        assert len(cb) == 4 and all(len(s) == 3 for s in cb)
        # codebook c of subspace s = slice of the (c+1)-th lowest-id vector
        assert cb[0][0] == vecs[0][0:2]
        assert cb[3][2] == vecs[2][6:8]

    def test_identical_vector_is_rank_one(self, spark):
        # vec 5 duplicates vec 0 → ADC distance 0 → rank 1 for query 0
        base = [[float((i * 7 + j * 3) % 11) for j in range(8)] for i in range(12)]
        base[5] = list(base[0])
        df = _embs(spark, base)
        q = df.filter("vec_id = 0")
        rows = pq_topk(df, q, k=3, n_sub=4, n_codes=4).collect()
        top = [r for r in rows if r["rank"] == 1][0]
        assert top["neighbor_id"] == 5
        assert top["adc_d2"] == 0.0

    def test_output_contract(self, spark):
        vecs = [[float((i * 5 + j) % 9) for j in range(8)] for i in range(15)]
        df = _embs(spark, vecs)
        q = df.filter("vec_id < 2")
        rows = pq_topk(df, q, k=4, n_sub=2, n_codes=4).collect()
        by_q = {}
        for r in rows:
            assert r["query_id"] != r["neighbor_id"]
            by_q.setdefault(r["query_id"], []).append(r)
        for qid, rs in by_q.items():
            ranks = sorted(r["rank"] for r in rs)
            assert ranks == list(range(1, len(rs) + 1))
            ordered = sorted(rs, key=lambda r: r["rank"])
            d = [r["adc_d2"] for r in ordered]
            assert d == sorted(d)

    def test_recall_against_bruteforce(self, spark):
        # clustered data: PQ top-1 should usually agree with exact cosine
        import random

        rng = random.Random(7)
        vecs = []
        for c in range(4):
            center = [rng.uniform(-1, 1) for _ in range(16)]
            for _ in range(10):
                vecs.append([x + rng.uniform(-0.05, 0.05) for x in center])
        df = _embs(spark, vecs)
        q = df.filter("vec_id < 5")
        pq1 = {
            r["query_id"]: r["neighbor_id"]
            for r in pq_topk(df, q, k=1, n_sub=8, n_codes=8).collect()
        }
        ex = cosine_topk(df, q, k=3).collect()
        ok = 0
        for qid, nid in pq1.items():
            exact_top3 = {r["neighbor_id"] for r in ex if r["query_id"] == qid}
            ok += nid in exact_top3
        assert ok >= 3  # recall@(1 in exact-top3) ≥ 60% on clustered data


class TestIvfPq:
    def test_single_cell_equals_flat_pq(self, spark):
        """With n_cells=1 every row lands in the only cell, so IVF-PQ
        must return EXACTLY the flat-PQ result — the composition's
        pruning is the only thing that may differ, and here it prunes
        nothing."""
        vecs = [[float((i * 7 + j * 3) % 11) for j in range(8)] for i in range(14)]
        df = _embs(spark, vecs)
        q = df.filter("vec_id < 2")
        flat = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_d2"])
            for r in pq_topk(df, q, k=5, n_sub=4, n_codes=4).collect()
        }
        comp = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["adc_d2"])
            for r in ivfpq_topk(
                df, q, k=5, n_cells=1, n_probe=1, n_sub=4, n_codes=4
            ).collect()
        }
        assert comp == flat

    def test_probe_prunes_to_cell_subset(self, spark):
        """Two well-separated clusters, n_probe=1: a query only ever
        sees neighbors from its own cell."""
        # interleave so the 2 lowest-id seed vectors (the deterministic
        # centroids) land one per cluster: even ids = A, odd ids = B
        vecs = []
        for i in range(6):
            vecs.append([10.0 + 0.01 * i] * 8)   # id 2i   cluster A
            vecs.append([-10.0 - 0.01 * i] * 8)  # id 2i+1 cluster B
        df = _embs(spark, vecs)
        q = df.filter("vec_id IN (0, 1)")
        rows = ivfpq_topk(
            df, q, k=5, n_cells=2, n_probe=1, n_sub=4, n_codes=2
        ).collect()
        assert rows
        for r in rows:
            same_side = r["query_id"] % 2 == r["neighbor_id"] % 2
            assert same_side, rows
