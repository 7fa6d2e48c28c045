"""SemDeDup: planted within-cell duplicates must be dropped toward the
lowest id; cross-cell near-identical vectors must survive (the documented
recall trade); the DuckDB oracle must agree bit-for-bit."""

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions.semdedup import (
    semantic_dedup,
    semantic_dedup_sql,
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        # ids 1,2 are the deterministic centroids (lowest ids)
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        # near-dup of 1, same cell
        (3, [0.99, 0.01, 0.0, 0.0]),
        # near-dup of 2, same cell
        (4, [0.0, 0.98, 0.02, 0.0]),
        # equidistant from both centroids -> tie breaks to cell 0; cosine
        # with 1 is ~0.707 < threshold -> kept
        (5, [0.7, 0.7, 0.0, 0.0]),
        # duplicates BOTH 1 and 3 -> dup_of = min = 1
        (6, [0.995, 0.005, 0.0, 0.0]),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


class TestSemanticDedup:
    def test_policy_and_cells(self, corpus):
        out = {
            r["vec_id"]: r
            for r in semantic_dedup(corpus, n_cells=2, threshold=0.95).collect()
        }
        assert set(out) == {1, 2, 3, 4, 5, 6}
        assert out[1]["is_kept"] and out[1]["dup_of"] is None
        assert out[2]["is_kept"]
        assert out[3]["dup_of"] == 1 and not out[3]["is_kept"]
        assert out[4]["dup_of"] == 2 and not out[4]["is_kept"]
        assert out[5]["is_kept"] and out[5]["cell"] == 0  # tie -> lower cell
        assert out[6]["dup_of"] == 1  # min of {1, 3}
        assert out[1]["cell"] == out[3]["cell"] == 0
        assert out[2]["cell"] == out[4]["cell"] == 1

    def test_cross_cell_duplicates_survive(self, spark):
        # 3 duplicates 1 but lands in cell 1 (closer to centroid 2):
        # SemDeDup's recall trade — cross-cell dup is NOT flagged
        rows = [
            (1, [1.0, 0.0]),
            (2, [0.6, 0.8]),
            (3, [0.55, 0.84]),
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        out = {
            r["vec_id"]: r
            for r in semantic_dedup(df, n_cells=2, threshold=0.9).collect()
        }
        assert out[3]["cell"] == 1 and out[3]["dup_of"] == 2

    def test_oracle_parity(self, spark, corpus):
        import duckdb

        pdf = corpus.toPandas()
        con = duckdb.connect()
        con.register("embeddings", pdf)
        oracle = con.execute(
            semantic_dedup_sql("embeddings", n_cells=2, threshold=0.95)
        ).fetch_df()
        spark_rows = {
            r["vec_id"]: (r["cell"], r["dup_of"], r["is_kept"])
            for r in semantic_dedup(corpus, n_cells=2, threshold=0.95).collect()
        }
        assert len(oracle) == len(spark_rows)
        for _, row in oracle.iterrows():
            dup = None if row.isna()["dup_of"] else int(row["dup_of"])
            assert spark_rows[int(row["vec_id"])] == (
                int(row["cell"]),
                dup,
                bool(row["is_kept"]),
            )
