"""Benchmark decontamination — remove pretraining documents that overlap
an evaluation/benchmark set, the standard n-gram contamination check run
before training (GPT-3 appendix C / PaLM style: a document is
contaminated if it shares at least one word-level n-gram with any
benchmark item).

Spark shape, sized for a 100 TB corpus vs a tiny (MB-scale) benchmark:
the corpus side streams — normalize, tokenize, explode n-grams, all
inside whole-stage codegen — and is LEFT SEMI joined against the
benchmark's distinct n-gram set, which Spark broadcasts (it is small by
construction). The corpus never shuffles: contamination detection is a
map-side broadcast-hash-semi-join followed by one distinct on the
(small) contaminated-id set. Flag attachment back onto the corpus is a
second broadcast join. Nothing here scales with corpus size except the
single streaming scan.

Tokenization is the alnum-word normal form (lower, non-alphanumeric runs
collapsed to one space) — identical expressions on the Spark and DuckDB
sides so the contamination verdict gets a full value oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import spread

__all__ = [
    "word_ngrams",
    "contamination_flags",
    "decontaminate",
    "contamination_flags_sql",
]

# Non-alphanumeric runs -> single space; mirrored verbatim in SQL below.
_NORM_RE = "[^a-z0-9]+"


def _words(text_col: str):
    return F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " ")), " "
    )


def word_ngrams(
    df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, ngram) stream of word-level n-grams, duplicates retained.
    Stays JVM-side: split -> explode(sequence) -> slice -> concat_ws.
    Documents with fewer than ``n`` words yield no rows (the length guard
    also keeps ``sequence`` from running descending when stop < start)."""
    return (
        spread(df)
        .select(F.col(id_col), _words(text_col).alias("_w"))
        .filter(F.size("_w") >= n)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.size("_w") - (n - 1))).alias("_i"),
            F.col("_w"),
        )
        .select(
            id_col,
            F.concat_ws(" ", F.slice("_w", F.col("_i"), n)).alias("ngram"),
        )
    )


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, contaminated) for every corpus document: contaminated = shares
    at least one word n-gram with any benchmark document. The benchmark
    n-gram set is broadcast; the corpus scan never shuffles."""
    bench_grams = (
        word_ngrams(benchmark, n, text_col, id_col).select("ngram").distinct()
    )
    contaminated = (
        word_ngrams(docs, n, text_col, id_col)
        .join(F.broadcast(bench_grams), "ngram", "left_semi")
        .select(id_col)
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return docs.select(id_col).join(
        F.broadcast(contaminated), id_col, "left"
    ).select(
        id_col, F.coalesce("_hit", F.lit(False)).alias("contaminated")
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus with contaminated documents removed (all original columns).
    Broadcast LEFT ANTI against the contaminated-id set."""
    contaminated = (
        word_ngrams(docs, n, text_col, id_col)
        .join(
            F.broadcast(
                word_ngrams(benchmark, n, text_col, id_col)
                .select("ngram")
                .distinct()
            ),
            "ngram",
            "left_semi",
        )
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(contaminated), id_col, "left_anti")


def _ngrams_sql(source_sql: str, n: int, text_col: str, id_col: str) -> str:
    """DuckDB n-gram stream over ``source_sql`` (a FROM-able subquery).
    Same normal form as :func:`word_ngrams`; list slice w[i:i+n-1] is
    1-based inclusive, range() upper bound exclusive."""
    norm = (
        f"regexp_split_to_array(trim(regexp_replace(lower({text_col}), "
        f"'{_NORM_RE}', ' ', 'g')), ' ')"
    )
    return (
        f"SELECT {id_col}, array_to_string(w[CAST(i AS INT):CAST(i AS INT) + {n - 1}], ' ') AS ngram "
        f"FROM (SELECT {id_col}, {norm} AS w FROM {source_sql} "
        f"WHERE len({norm}) >= {n}), "
        f"UNNEST(range(1, len(w) - {n - 2})) AS u(i)"
    )


def contamination_flags_sql(
    docs_table: str,
    benchmark_sql: str,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`contamination_flags`. ``benchmark_sql`` is
    a subquery selecting the benchmark rows (id + text)."""
    corpus_grams = _ngrams_sql(docs_table, n, text_col, id_col)
    bench_grams = _ngrams_sql(f"({benchmark_sql})", n, text_col, id_col)
    return f"""
WITH corpus_grams AS ({corpus_grams}),
bench_grams AS (SELECT DISTINCT ngram FROM ({bench_grams})),
contaminated AS (
  SELECT DISTINCT {id_col} FROM corpus_grams
  WHERE ngram IN (SELECT ngram FROM bench_grams)
)
SELECT d.{id_col}, (c.{id_col} IS NOT NULL) AS contaminated
FROM {docs_table} d LEFT JOIN contaminated c USING ({id_col})
""".strip()
