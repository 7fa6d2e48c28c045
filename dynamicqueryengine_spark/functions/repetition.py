"""Repetition-based quality filtering — the Gopher/MassiveText-style
signals that catch boilerplate, keyword-stuffing, and generator loops,
which per-document length/punctuation scores (functions/text.py) miss.

Signals (all exact integer counts → each emitted ratio is ONE IEEE
double division, so the whole profile is value-oracle-checkable):

* ``dup_word_fraction`` — 1 − distinct/total words: high = the same
  words repeated over and over.
* ``top_bigram_fraction`` — share of the most frequent word bigram:
  high = a phrase loop ("click here click here …").
* ``mean_word_len`` — characters per word: degenerate high/low values
  flag junk tokenization.

Scale shape: everything is derived from ONE token explode keyed by
doc_id — groupBy(doc) and groupBy(doc, bigram) both partial-aggregate
map-side, and every shuffle key includes doc_id, so there is no hot key
regardless of corpus size. Thresholds follow Gopher Table A1
(dup-word > 0.30 or top-bigram > 0.18 → drop); like Gopher, the bigram
test only applies above a minimum length (``MIN_BIGRAMS``) — on a short
document the single most frequent of its handful of bigrams trivially
exceeds any share threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import spread

__all__ = ["repetition_profile", "repetition_profile_sql"]

_NORM_RE = "[^a-z0-9]+"
DUP_WORD_MAX = 0.30
TOP_BIGRAM_MAX = 0.18
MIN_BIGRAMS = 20


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_words, n_distinct_words, dup_word_fraction, mean_word_len,
    top_bigram_fraction, keep) per document with ≥ 2 words."""
    tokens = (
        spread(df)
        .select(
            F.col(id_col),
            F.posexplode(
                F.split(
                    F.trim(
                        F.regexp_replace(
                            F.lower(F.col(text_col)), _NORM_RE, " "
                        )
                    ),
                    " ",
                )
            ).alias("_p", "term"),
        )
        .filter(F.length("term") > 0)
    )
    word_stats = tokens.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.countDistinct("term").alias("n_distinct_words"),
        F.sum(F.length("term")).alias("_chars"),
    )
    # bigram = this token + next token (window by position would shuffle;
    # lead() within the doc partition is the same single doc-keyed shuffle
    # the groupBy needs anyway, so build bigrams with a self-zip instead:
    # re-split per row and slide — stays in the exploded stream via lead)
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy("_p")
    bigrams = (
        tokens.withColumn("_next", F.lead("term").over(w))
        .filter(F.col("_next").isNotNull())
        .select(id_col, F.concat_ws(" ", "term", "_next").alias("bigram"))
    )
    bigram_stats = (
        bigrams.groupBy(id_col, "bigram")
        .agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col)
        .agg(F.max("_c").alias("_top"), F.sum("_c").alias("_tot"))
    )
    out = word_stats.join(bigram_stats, id_col).select(
        id_col,
        "n_words",
        "n_distinct_words",
        (
            F.lit(1.0)
            - F.col("n_distinct_words").cast("double") / F.col("n_words")
        ).alias("dup_word_fraction"),
        (F.col("_chars").cast("double") / F.col("n_words")).alias(
            "mean_word_len"
        ),
        (F.col("_top").cast("double") / F.col("_tot")).alias(
            "top_bigram_fraction"
        ),
    )
    return out.withColumn(
        "keep",
        (F.col("dup_word_fraction") <= DUP_WORD_MAX)
        & (
            (F.col("n_words") - 1 < MIN_BIGRAMS)
            | (F.col("top_bigram_fraction") <= TOP_BIGRAM_MAX)
        ),
    )


def repetition_profile_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB mirror of :func:`repetition_profile` — identical normal
    form, integer counts, single-division ratios, and thresholds."""
    norm = (
        f"regexp_split_to_array(trim(regexp_replace(lower({text_col}), "
        f"'{_NORM_RE}', ' ', 'g')), ' ')"
    )
    return f"""
WITH toks AS (
  SELECT {id_col},
         unnest({norm}) AS term,
         unnest(range(1, len({norm}) + 1)) AS p
  FROM {table}
),
toks_f AS (SELECT * FROM toks WHERE length(term) > 0),
word_stats AS (
  SELECT {id_col}, count(*) AS n_words,
         count(DISTINCT term) AS n_distinct_words,
         sum(length(term)) AS chars
  FROM toks_f GROUP BY {id_col}
),
bigrams AS (
  SELECT {id_col}, term || ' ' || lead(term) OVER (
           PARTITION BY {id_col} ORDER BY p) AS bigram
  FROM toks_f QUALIFY lead(term) OVER (
           PARTITION BY {id_col} ORDER BY p) IS NOT NULL
),
bigram_stats AS (
  SELECT {id_col}, max(c) AS top, sum(c) AS tot FROM (
    SELECT {id_col}, bigram, count(*) AS c FROM bigrams GROUP BY 1, 2
  ) GROUP BY {id_col}
)
SELECT w.{id_col}, w.n_words, w.n_distinct_words,
       1.0 - CAST(w.n_distinct_words AS DOUBLE) / w.n_words
         AS dup_word_fraction,
       CAST(w.chars AS DOUBLE) / w.n_words AS mean_word_len,
       CAST(b.top AS DOUBLE) / b.tot AS top_bigram_fraction,
       (1.0 - CAST(w.n_distinct_words AS DOUBLE) / w.n_words)
         <= {DUP_WORD_MAX}
         AND (w.n_words - 1 < {MIN_BIGRAMS}
              OR (CAST(b.top AS DOUBLE) / b.tot) <= {TOP_BIGRAM_MAX}) AS keep
FROM word_stats w JOIN bigram_stats b USING ({id_col})
""".strip()
