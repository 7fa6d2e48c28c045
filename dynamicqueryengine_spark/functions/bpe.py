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


# ------------------------------------------------------- tokenizer apply --

# A fixed, ordered merge table (the artifact BPE *training* produces —
# corpus_bpe_merges computes live pair stats; applying a tokenizer uses a
# frozen table like this one). Later merges build on earlier merges'
# output symbols, exercising the real merge-chain mechanics.
DEFAULT_MERGES: tuple[tuple[str, str], ...] = (
    ("t", "a"), ("ta", "b"), ("tab", "l"), ("tabl", "e"),
    ("v", "a"), ("va", "l"), ("val", "u"), ("valu", "e"),
    ("q", "u"), ("qu", "e"), ("que", "r"), ("quer", "y"),
    ("e", "r"), ("o", "n"), ("i", "n"), ("a", "n"),
)


def bpe_encode_counts(
    df: DataFrame,
    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Apply a frozen BPE merge table and report per-document token
    counts: (id, n_sym, n_bpe, compression) where n_sym is the pre-merge
    symbol count (characters), n_bpe the post-merge token count.

    Everything is a scan-time Column expression — zero shuffles, stays
    inside whole-stage codegen: the symbol stream is space-separated
    characters with ``|`` word boundaries; each merge (a, b) is a literal
    ``" a b " → " ab "`` replace applied twice (a global regex pass
    cannot match overlapping occurrences — the second pass catches the
    alternation leftovers, which are always space-isolated after pass
    one). Merges apply in table order, exactly the greedy BPE-apply
    semantics for a frozen table.

    The identical literal replaces are mirrored in
    :func:`bpe_encode_counts_sql`, so the oracle is a full value check.

    ``merges`` is a public parameter: each symbol is regex-escaped before
    being interpolated into the replace patterns (and quote/backref-
    escaped in the SQL mirror), so merge symbols containing regex or SQL
    metacharacters encode literally instead of breaking the pattern or
    injecting into the generated oracle.
    """
    import re

    norm = F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " ")
    seq = F.concat(
        F.lit(" "),
        F.regexp_replace(
            F.regexp_replace(F.trim(norm), " ", "|"), "(.)", "$1 "
        ),
    )
    for a, b in merges:
        pat = f" {re.escape(a)} {re.escape(b)} "
        # replacement string: \ and $ are Java-regex replacement metachars
        rep = f" {a}{b} ".replace("\\", "\\\\").replace("$", "\\$")
        seq = F.regexp_replace(F.regexp_replace(seq, pat, rep), pat, rep)
    toks = F.expr("filter(split(trim(_seq), ' '), x -> x != '|')")
    out = (
        spread(df)
        .withColumn("_seq", seq)
        .select(
            id_col,
            F.length(
                F.regexp_replace(F.trim(norm), " ", "")
            ).cast("long").alias("n_sym"),
            F.size(toks).cast("long").alias("n_bpe"),
        )
    )
    # no rounding: the shared IEEE division is bit-identical across
    # engines, while round(double) diverges on decimal-tie boundaries
    return out.withColumn(
        "compression",
        F.col("n_sym").cast("double")
        / F.greatest(F.col("n_bpe").cast("double"), F.lit(1.0)),
    )


def bpe_encode_counts_sql(
    table: str,
    merges: tuple[tuple[str, str], ...] = DEFAULT_MERGES,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`bpe_encode_counts` — same normal form,
    same literal merge replaces in the same order, each applied twice.
    Merge symbols are regex-escaped and SQL-quote-escaped (and the
    replacement's backslashes doubled — RE2 backref syntax) before
    interpolation, mirroring the Spark side's escaping."""
    import re

    def _lit(s: str) -> str:  # SQL single-quoted literal body
        return s.replace("'", "''")

    norm = f"regexp_replace(lower({text_col}), '{_NORM_RE}', ' ', 'g')"
    seq = (
        f"' ' || regexp_replace(replace(trim({norm}), ' ', '|'),"
        f" '(.)', '\\1 ', 'g')"
    )
    for a, b in merges:
        pat = _lit(f" {re.escape(a)} {re.escape(b)} ")
        rep = _lit(f" {a}{b} ".replace("\\", "\\\\"))
        once = f"regexp_replace({seq}, '{pat}', '{rep}', 'g')"
        seq = f"regexp_replace({once}, '{pat}', '{rep}', 'g')"
    return f"""
SELECT {id_col},
       CAST(length(replace(trim({norm}), ' ', '')) AS BIGINT) AS n_sym,
       CAST(len(list_filter(string_split(trim({seq}), ' '),
                            x -> x != '|')) AS BIGINT) AS n_bpe,
       CAST(length(replace(trim({norm}), ' ', '')) AS DOUBLE)
         / greatest(CAST(len(list_filter(string_split(trim({seq}), ' '),
                                         x -> x != '|')) AS DOUBLE),
                    1.0) AS compression
FROM {table}
""".strip()
