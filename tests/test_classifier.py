"""Linear quality classifier: margin must follow the features (clean prose
beats punctuation soup), the decision must be margin ≥ 0, and the DuckDB
mirror must agree bit-for-bit (the whole point of the margin-not-sigmoid
design)."""

import duckdb
import pytest

from dynamicqueryengine_spark.functions.classifier import (
    classify_quality,
    classify_quality_sql,
)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox is one of the animals that it jumps with"),
        (2, "!!! ??? ### $$$ %%% ^^^ &&& *** ((( )))"),
        (3, ""),
        (4, "word " * 50),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestClassifier:
    def test_margin_orders_quality(self, docs):
        out = {r["doc_id"]: r for r in classify_quality(docs).collect()}
        assert out[1]["margin"] > out[2]["margin"]  # prose beats symbol soup
        assert out[1]["keep"] and not out[2]["keep"]
        assert out[3]["margin"] < 0  # empty text is junk

    def test_oracle_bit_parity(self, docs):
        con = duckdb.connect()
        con.register("documents", docs.toPandas())
        oracle = {
            int(r[0]): (r[1], bool(r[2]))
            for r in con.execute(classify_quality_sql("documents")).fetchall()
        }
        for r in classify_quality(docs).collect():
            om, ok = oracle[r["doc_id"]]
            assert r["margin"] == om, r["doc_id"]  # exact, not approx
            assert r["keep"] == ok


class TestCurriculum:
    def test_quartile_buckets(self, spark):
        from dynamicqueryengine_spark.functions.classifier import (
            curriculum_buckets,
        )

        rows = [
            (i, "en", " ".join(["the quick fox is on it"] * (1 + i % 8)))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
        out = curriculum_buckets(df).collect()
        assert {r["bucket"] for r in out} == {1, 2, 3, 4}
        # monotone: higher margin never lands in a lower bucket
        by_margin = sorted(out, key=lambda r: r["margin"])
        buckets = [r["bucket"] for r in by_margin]
        assert buckets == sorted(buckets)
