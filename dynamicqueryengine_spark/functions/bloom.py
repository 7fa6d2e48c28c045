"""Portable Bloom-filter membership sketch — the bounded-state scale path
for benchmark decontamination.

The broadcast semi-join in :mod:`decontaminate` ships the benchmark's
FULL distinct n-gram set to every executor; fine for MB-scale benchmarks,
but the state grows linearly with the benchmark. The Bloom filter caps
executor-resident state at ``m_bits/8`` bytes (default 2 KiB) regardless
of benchmark size, trading a deterministic, quantifiable false-positive
rate (~0.24% at 16 Ki bits / 4 hashes / ≲1k grams; FPs only ADD docs to
the contaminated set — safe in the decontamination direction).

Everything is md5-derived and mirrored expression-for-expression in
DuckDB SQL, so the sketch — including its false positives — is
value-oracle-checkable: both engines build bit-identical bitmaps and
return bit-identical verdicts.

Layout: ``m_bits`` bits as ``m_bits/32`` 32-bit words stored in BIGINTs
(bit 63 shifts overflow DuckDB's checked ``<<`` — the simhash64 lesson,
functions/dedup.py). Hash j of gram g = first 60 bits of
md5(g || '#' || j) mod m_bits.

Plan shape at 100 TB: the bitmap build aggregates the (tiny) benchmark
side into ≤ ``m_bits/32`` rows via map-side-combined ``bit_or``; the
corpus probe is explode(k) → broadcast-hash-join against those rows →
one aggregation per (doc, gram) then per doc. The corpus is scanned
once and never wide-shuffled.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .decontaminate import _ngrams_sql, word_ngrams
from .dedup import _hex_int_sql

__all__ = [
    "bloom_build",
    "bloom_contamination_flags",
    "bloom_contamination_flags_sql",
]

M_BITS = 16384  # 2^14 bits = 512 32-bit words = 2 KiB
K_HASHES = 4


def _position(col: Column, j: int, m_bits: int) -> Column:
    """Portable hash-j bit position: 60-bit md5 fold mod m_bits."""
    h = F.conv(
        F.substring(F.md5(F.concat(col, F.lit(f"#{j}"))), 1, 15), 16, 10
    ).cast("long")
    return F.pmod(h, F.lit(m_bits))


def _positions(col: Column, k: int, m_bits: int) -> Column:
    return F.array(*[_position(col, j, m_bits) for j in range(k)])


def bloom_build(
    keys: DataFrame,
    key_col: str = "ngram",
    m_bits: int = M_BITS,
    k: int = K_HASHES,
) -> DataFrame:
    """(widx, word) bitmap rows from a distinct key set: every key sets
    its k bit positions; words are OR-merged with a map-side-combined
    ``bit_or`` aggregate — post-shuffle state ≤ m_bits/32 rows total."""
    pos = (
        keys.select(F.col(key_col))
        .distinct()
        .select(F.explode(_positions(F.col(key_col), k, m_bits)).alias("pos"))
    )
    return (
        pos.select(
            F.expr("pos DIV 32").alias("widx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("widx")
        .agg(F.bit_or("mask").alias("word"))
    )


def bloom_contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, contaminated) via Bloom membership: a doc is flagged iff some
    word n-gram has ALL k bits set in the benchmark's bitmap (superset of
    the exact verdict — false positives possible, false negatives not).

    The bitmap (≤ m_bits/32 rows) is broadcast; a probe gram whose word
    index is absent from the bitmap misses by definition (inner join
    drops it), so hits-per-gram < k ⇒ not a member."""
    bloom = bloom_build(
        word_ngrams(benchmark, n, text_col, id_col), "ngram", m_bits, k
    )
    grams = word_ngrams(docs, n, text_col, id_col).distinct()
    probe = grams.select(
        id_col,
        "ngram",
        F.posexplode(_positions(F.col("ngram"), k, m_bits)).alias("j", "pos"),
    ).select(
        id_col,
        "ngram",
        F.expr("pos DIV 32").alias("widx"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
            "mask"
        ),
    )
    hits = (
        probe.join(F.broadcast(bloom), "widx")
        .filter(F.expr("(word & mask) != 0"))
        .groupBy(id_col, "ngram")
        .agg(F.count(F.lit(1)).alias("n_hits"))
        .filter(F.col("n_hits") == k)
        .select(id_col)
        .distinct()
        .withColumn("_hit", F.lit(True))
    )
    return docs.select(id_col).join(F.broadcast(hits), id_col, "left").select(
        id_col, F.coalesce("_hit", F.lit(False)).alias("contaminated")
    )


def _pos_sql(gram_expr: str, j: int, m_bits: int) -> str:
    h = _hex_int_sql(f"substr(md5({gram_expr} || '#{j}'), 1, 15)")
    return f"({h}) % {m_bits}"


def bloom_contamination_flags_sql(
    docs_table: str,
    benchmark_sql: str,
    n: int = 5,
    m_bits: int = M_BITS,
    k: int = K_HASHES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`bloom_contamination_flags` — same md5 bit
    positions, same 32-bit word bitmap, same all-k verdict, so even the
    false positives match bit-for-bit."""
    bench_grams = _ngrams_sql(f"({benchmark_sql})", n, text_col, id_col)
    corpus_grams = _ngrams_sql(docs_table, n, text_col, id_col)
    bpos = " UNION ALL ".join(
        f"SELECT {_pos_sql('ngram', j, m_bits)} AS pos FROM bgrams"
        for j in range(k)
    )
    cpos = " UNION ALL ".join(
        f"SELECT {id_col}, ngram, {_pos_sql('ngram', j, m_bits)} AS pos"
        f" FROM cgrams"
        for j in range(k)
    )
    return f"""
WITH bgrams AS (SELECT DISTINCT ngram FROM ({bench_grams})),
bpos AS ({bpos}),
bloom AS (
  SELECT pos // 32 AS widx,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS word
  FROM bpos GROUP BY 1
),
cgrams AS (SELECT DISTINCT {id_col}, ngram FROM ({corpus_grams})),
cpos AS ({cpos}),
hits AS (
  SELECT DISTINCT p.{id_col}
  FROM cpos p JOIN bloom b ON b.widx = p.pos // 32
  WHERE (b.word & (CAST(1 AS BIGINT) << CAST(p.pos % 32 AS INT))) != 0
  GROUP BY p.{id_col}, p.ngram
  HAVING count(*) = {k}
)
SELECT d.{id_col}, (h.{id_col} IS NOT NULL) AS contaminated
FROM {docs_table} d LEFT JOIN hits h USING ({id_col})
""".strip()
