"""Bloom-filter membership semantics (functions/bloom.py): no false
negatives ever, bitmap boundedness, and verdict superset-of-exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions.bloom import (
    bloom_build,
    bloom_contamination_flags,
)
from dynamicqueryengine_spark.functions.decontaminate import (
    contamination_flags,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_no_false_negatives_and_bounded_bitmap(spark):
    # 50 docs, benchmark = the 5 docs with ids 0..4 (verbatim overlap)
    docs = _docs(
        spark,
        [(i, f"alpha beta gamma delta epsilon zeta-{i} eta theta") for i in range(50)],
    )
    bench = docs.filter(F.col("doc_id") < 5)
    flags = {
        r["doc_id"]: r["contaminated"]
        for r in bloom_contamination_flags(docs, bench, n=5).collect()
    }
    exact = {
        r["doc_id"]: r["contaminated"]
        for r in contamination_flags(docs, bench, n=5).collect()
    }
    assert set(flags) == set(exact)
    for doc_id, is_exact in exact.items():
        if is_exact:  # every exact hit MUST be a bloom hit
            assert flags[doc_id], doc_id
    # bloom may only ADD flags, never remove
    assert sum(flags.values()) >= sum(exact.values())


def test_bitmap_is_bounded(spark):
    keys = spark.createDataFrame(
        [(f"gram-{i}",) for i in range(5000)], "ngram string"
    )
    bitmap = bloom_build(keys, m_bits=1024, k=4)
    rows = bitmap.collect()
    assert len(rows) <= 1024 // 32
    assert all(0 <= r["widx"] < 1024 // 32 for r in rows)
    # every word uses only the low 32 bits
    assert all(0 <= r["word"] < (1 << 32) for r in rows)


def test_disjoint_sets_mostly_miss(spark):
    docs = _docs(
        spark,
        [(i, f"u{i} v{i} w{i} x{i} y{i} z{i}") for i in range(30)],
    )
    bench = _docs(spark, [(100, "p q r s t u v w")])
    flags = bloom_contamination_flags(docs, bench, n=5).collect()
    # at 16Ki bits / ~4 bench grams the FP rate is ~0 for 30 probes
    assert sum(r["contaminated"] for r in flags) == 0
