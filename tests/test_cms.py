"""Tests for the count-min sketch (functions/cms.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions.cms import (
    cms_build,
    cms_topk_estimates,
    _words,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestCms:
    def test_estimate_never_undercounts(self, spark):
        docs = _docs(
            spark,
            [(i, "alpha beta beta gamma " + f"rare{i}") for i in range(1, 30)],
        )
        rows = cms_topk_estimates(docs, k=10, depth=4, width=64).collect()
        assert rows
        for r in rows:
            assert r["cms_est"] >= r["exact_count"], r

    def test_exact_at_large_width(self, spark):
        # width >> distinct words → no collisions → estimate == exact
        docs = _docs(spark, [(1, "a a a b b c"), (2, "a c c d")])
        rows = cms_topk_estimates(docs, k=10, depth=4, width=4096).collect()
        got = {r["word"]: (r["exact_count"], r["cms_est"]) for r in rows}
        assert got == {
            "a": (4, 4), "b": (2, 2), "c": (3, 3), "d": (1, 1)
        }

    def test_sketch_size_is_bounded(self, spark):
        docs = _docs(
            spark, [(i, " ".join(f"w{j}" for j in range(50))) for i in range(20)]
        )
        n = cms_build(_words(docs, "text"), "w", depth=4, width=32).count()
        assert n <= 4 * 32

    def test_total_mass_per_row(self, spark):
        # every row of the sketch sums to the total token count
        docs = _docs(spark, [(1, "x y z"), (2, "x y")])
        sketch = cms_build(_words(docs, "text"), "w", depth=3, width=16)
        sums = (
            sketch.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
        )
        assert sorted(r["s"] for r in sums) == [5, 5, 5]


class TestStreamingCms:
    def test_stream_equals_batch_sketch(self, spark):
        """The streaming CMS (readStream → incremental groupBy) must equal
        the batch sketch over the same events — sketches are
        order-insensitive, so micro-batching cannot change counters."""
        import __spark_entry__ as entry_mod
        from pyspark.sql import functions as F

        from dynamicqueryengine_spark.functions.cms import cms_build
        from dynamicqueryengine_spark.sources.registry import load_table

        sf = "/root/testdata/sf0.001"
        streamed = entry_mod.queries()["events_stream_cms_sketch"](spark, sf)
        batch = cms_build(
            load_table(spark, sf, "events").select(
                F.col("event_type").alias("w")
            ),
            "w",
            depth=4,
            width=64,
        )
        a = sorted(map(tuple, streamed.collect()))
        b = sorted(map(tuple, batch.collect()))
        assert a == b and len(a) > 0
