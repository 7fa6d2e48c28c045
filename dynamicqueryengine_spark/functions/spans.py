"""Cross-document repeated-span detection.

Within-doc repetition (functions/repetition.py) catches degenerate
documents; this module catches CORPUS-level span duplication — boilerplate
headers, license blocks, templated paragraphs — the signal behind
span-level training-data dedup (Lee et al., "Deduplicating Training Data
Makes Language Models Better", ACL'22: exact substring dedup at 50-token
granularity). The Spark shape is the scalable core of that pipeline:
word n-grams per document built ROW-LOCALLY (no explode of the corpus
until the hash stream, which is long-only), document frequency by one
int64 groupBy, and a per-doc repeated fraction via one join back — three
narrow shuffles total, no strings ever shuffled.

Beyond profiling, ``flag_repeated_spans`` is the policy gate: documents
whose repeated fraction exceeds a threshold are boilerplate-dominated and
get dropped or routed to span-clipping in a real pretraining pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import _WS
from ..util import spread

__all__ = [
    "repeated_span_profile",
    "repeated_span_profile_sql",
    "flag_repeated_spans",
]


def _gram_hashes(text_col: str, n: int) -> "F.Column":
    """Distinct word-n-gram fingerprints of one document as array<long>,
    built row-locally: split → slide an n-window via transform over the
    position sequence → hash the joined words → array_distinct. Documents
    shorter than n tokens yield an empty array (the sequence() descending
    trap — stop < start — is guarded by the when())."""
    tokens = F.split(F.trim(F.lower(F.col(text_col))), _WS)
    n_tok = F.size(tokens)
    grams = F.transform(
        F.sequence(F.lit(1), n_tok - (n - 1)),
        lambda i: F.xxhash64(F.concat_ws(" ", F.slice(tokens, i, n))),
    )
    return F.array_distinct(
        F.when(n_tok >= n, grams).otherwise(F.array().cast("array<bigint>"))
    )


def repeated_span_profile(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_spans, n_repeated, repeated_frac) per document.

    ``n_spans``: distinct word n-grams in the document; ``n_repeated``:
    how many of those occur in ≥ ``min_df`` documents corpus-wide;
    ``repeated_frac``: their ratio (0.0 for documents shorter than n
    tokens). Fingerprints are xxhash64 int64s — the 2⁻³⁰-corpus-wide
    collision risk is treated as exact, the same trade the jaccard paths
    make (the DuckDB oracle joins raw gram strings and agrees at sf0.01).
    """
    doc_grams = (
        spread(docs)
        .select(id_col, F.explode(_gram_hashes(text_col, n)).alias("_g"))
    )
    # document frequency over int64 fingerprints; repeated grams only —
    # the join-back side is the SMALL side (boilerplate vocabulary), and
    # the per-doc aggregate is a long-only shuffle keyed by doc id
    rep = (
        doc_grams.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") >= min_df)
        .select("_g")
    )
    rep_counts = (
        doc_grams.join(rep, "_g")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_repeated"))
    )
    totals = spread(docs).select(
        id_col, F.size(_gram_hashes(text_col, n)).alias("n_spans")
    )
    frac = F.when(
        F.col("n_spans") > 0,
        F.col("n_repeated").cast("double") / F.col("n_spans"),
    ).otherwise(F.lit(0.0))
    return (
        totals.join(rep_counts, id_col, "left")
        .select(
            id_col,
            "n_spans",
            F.coalesce("n_repeated", F.lit(0)).alias("n_repeated"),
        )
        .withColumn("repeated_frac", frac)
    )


def repeated_span_profile_sql(
    table: str,
    n: int = 5,
    min_df: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror: identical tokenization and windowing, raw gram
    strings instead of fingerprints (the oracle side never needs the hash
    optimization), identical single-division fraction."""
    toks = f"regexp_split_to_array(trim(lower({text_col})), '{_WS}')"
    return f"""
WITH toks AS (
  SELECT {id_col}, {toks} AS tk FROM {table}
),
grams AS (
  SELECT DISTINCT {id_col}, array_to_string(list_slice(tk, i, i + {n - 1}), ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - {n - 2})) AS u(i)
  WHERE len(tk) >= {n}
),
dfreq AS (SELECT g, count(*) AS d FROM grams GROUP BY g),
per_doc AS (
  SELECT grams.{id_col},
         count(*) AS n_spans,
         CAST(sum(CASE WHEN dfreq.d >= {min_df} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_repeated
  FROM grams JOIN dfreq USING (g)
  GROUP BY grams.{id_col}
)
SELECT t.{id_col},
       CAST(COALESCE(p.n_spans, 0) AS INT) AS n_spans,
       COALESCE(p.n_repeated, 0) AS n_repeated,
       CASE WHEN COALESCE(p.n_spans, 0) > 0
            THEN CAST(p.n_repeated AS DOUBLE) / p.n_spans
            ELSE 0.0 END AS repeated_frac
FROM toks t LEFT JOIN per_doc p USING ({id_col})
""".strip()


def flag_repeated_spans(
    docs: DataFrame,
    n: int = 5,
    min_df: int = 2,
    max_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Documents whose corpus-repeated-span fraction exceeds ``max_frac``
    — the drop list a span-dedup pass would act on."""
    prof = repeated_span_profile(docs, n, min_df, text_col, id_col)
    return prof.filter(F.col("repeated_frac") > max_frac)
