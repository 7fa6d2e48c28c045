"""BPE tokenizer induction — the pair-counting step of byte-pair-encoding
training (Sennrich et al. 2016), the op an LLM-data pipeline runs over the
whole corpus to learn merge rules before tokenizing it.

What a full BPE trainer iterates — count adjacent symbol pairs, merge the
most frequent, recount — is driver-sequential only in the merge choice; the
expensive part, the corpus-wide pair count, is a pure distributed
aggregation. This module implements that aggregation exactly: word →
character-pair explode → global count → top-K with a total-order
tie-break, so the #1 row IS the first BPE merge and the top-K table is the
frequency input to the next merge round.

Scale shape (100 TB): one codegen'd explode pipeline (no Python at row
time) → one shuffle keyed by (pair) with map-side partial counts — pair
vocabulary is bounded (≤ alphabet², in practice a few thousand), so the
post-shuffle state is tiny regardless of corpus size. Top-K is a
TakeOrdered over that bounded table, not a sort of the corpus.

Word frequencies are weighted per occurrence (not per distinct word),
matching the BPE objective.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import spread

__all__ = ["bpe_pair_counts", "bpe_pair_counts_sql"]

# Same alnum normal form as keywords/decontaminate: lowercase words only —
# BPE over raw bytes would need byte-level splitting; the induction
# mechanics (pair explode + weighted count) are identical.
_NORM_RE = "[^a-z0-9]+"


def bpe_pair_counts(
    df: DataFrame,
    k: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Top-``k`` adjacent character pairs across the corpus: (left, right,
    pair_count), ordered by count desc then (left, right) asc — a total
    order, so row 1 is deterministically the first BPE merge.

    Pipeline: normalize → split to words (one explode) → per word emit
    (char i, char i+1) for i in [1, len-1] (second explode) → count.
    """
    words = (
        spread(df)
        .select(
            F.explode(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " ")
                    ),
                    " ",
                )
            ).alias("w")
        )
        .filter(F.length("w") >= 2)
    )
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.select(
            F.substring("pair", 1, 1).alias("left"),
            F.substring("pair", 2, 1).alias("right"),
        )
        .groupBy("left", "right")
        .agg(F.count(F.lit(1)).alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), F.col("left").asc(), F.col("right").asc())
        .limit(k)
    )


def bpe_pair_counts_sql(table: str, k: int = 50, text_col: str = "text") -> str:
    """DuckDB mirror of :func:`bpe_pair_counts` — same normal form, same
    per-occurrence weighting, same total-order tie-break."""
    norm = (
        f"regexp_split_to_array(trim(regexp_replace(lower({text_col}), "
        f"'{_NORM_RE}', ' ', 'g')), ' ')"
    )
    return f"""
WITH words AS (
  SELECT unnest({norm}) AS w FROM {table}
),
positions AS (
  SELECT w, unnest(range(1, length(w))) AS i
  FROM words WHERE length(w) >= 2
),
pairs AS (
  SELECT substring(w, i, 1) AS "left", substring(w, i + 1, 1) AS "right"
  FROM positions
)
SELECT "left", "right", count(*) AS pair_count
FROM pairs GROUP BY 1, 2
ORDER BY pair_count DESC, "left" ASC, "right" ASC
LIMIT {k}
""".strip()
