"""Tests for JL random projection (functions/embeddings.random_projection)."""

from __future__ import annotations

import math

from dynamicqueryengine_spark.functions.embeddings import random_projection
from dynamicqueryengine_spark.functions.similarity import hyperplanes


def _embs(spark, vecs):
    rows = [(i, [float(x) for x in v]) for i, v in enumerate(vecs)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


class TestRandomProjection:
    def test_matches_python_reference(self, spark):
        vecs = [[(i * 3 + j) % 5 - 2.0 for j in range(8)] for i in range(6)]
        df = _embs(spark, vecs)
        got = {
            (r["vec_id"], r["dim"]): r["y"]
            for r in random_projection(df, out_dim=4, in_dim=8).collect()
        }
        planes = hyperplanes(8, 4, 42)
        for i, v in enumerate(vecs):
            for d, p in enumerate(planes):
                acc = 0.0
                for a, b in zip(v, p):
                    acc = acc + float(a) * float(b)  # same fold order
                assert got[(i, d + 1)] == round(acc, 6), (i, d)

    def test_norm_column(self, spark):
        vecs = [[1.0] + [0.0] * 7]
        df = _embs(spark, vecs)
        rows = random_projection(df, out_dim=4, in_dim=8).collect()
        planes = hyperplanes(8, 4, 42)
        ys = [p[0] for p in planes]  # x = e1 → y_j = plane_j[0]
        expect = round(math.sqrt(sum(y * y for y in ys)), 6)
        assert all(r["rp_norm"] == expect for r in rows)

    def test_long_form_shape(self, spark):
        df = _embs(spark, [[0.5] * 16] * 3)
        out = random_projection(df, out_dim=5, in_dim=16)
        assert out.count() == 15
        assert out.columns == ["vec_id", "dim", "y", "rp_norm"]

    def test_deterministic_across_calls(self, spark):
        df = _embs(spark, [[(i + j) * 0.25 for j in range(8)] for i in range(4)])
        a = sorted(map(tuple, random_projection(df, 3, 8).collect()))
        b = sorted(map(tuple, random_projection(df, 3, 8).collect()))
        assert a == b
