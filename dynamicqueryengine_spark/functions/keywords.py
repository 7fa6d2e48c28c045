"""Corpus-level TF-IDF keyword extraction — the classic "what is this
document about" primitive used for corpus exploration, topic-balanced
mixing, and cluster labeling in training-data pipelines.

Score design note: the usual idf = ln(N/df) would tie the value oracle to
transcendental-function rounding (JVM ``Math.log`` vs C libm can differ
in the last ulp, which flips rank ties). Ranking is invariant under any
monotone transform of N/df, so the score here is the raw ratio
``tf * N / df`` computed as ONE IEEE double division — correctly rounded,
hence bit-identical across engines and exactly oracle-checkable.

Scale shape (100 TB corpus): one token explode (codegen scan) → one
(doc, term) shuffle with map-side partial count → a vocab-sized document
-frequency table joined back on term → one doc-keyed window for top-k.
The df table is bounded by vocabulary, not corpus, size; nothing else
materializes off-executor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from ..util import spread

__all__ = ["tfidf_top_terms", "tfidf_top_terms_sql"]

# Same alnum-word normal form as functions/decontaminate.py.
_NORM_RE = "[^a-z0-9]+"
_MIN_TERM_LEN = 3


def tfidf_top_terms(
    df: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` terms per document by tf·(N/df): (id, term, tf, doc_freq,
    score). Ties broken by term ascending; terms shorter than 3 chars
    dropped (they are connective noise at any corpus size)."""
    tokens = (
        spread(df)
        .select(
            F.col(id_col),
            F.explode(
                F.split(
                    F.trim(
                        F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " ")
                    ),
                    " ",
                )
            ).alias("term"),
        )
        .filter(F.length("term") >= _MIN_TERM_LEN)
    )
    tf = tokens.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    doc_freq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("doc_freq"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = tf.join(doc_freq, "term").crossJoin(F.broadcast(n_docs)).select(
        id_col,
        "term",
        "tf",
        "doc_freq",
        ((F.col("tf") * F.col("_n")).cast("double") / F.col("doc_freq")).alias(
            "score"
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def tfidf_top_terms_sql(
    table: str,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`tfidf_top_terms` — same normal form, same
    single-division double score, same tiebreak."""
    norm = (
        f"regexp_split_to_array(trim(regexp_replace(lower({text_col}), "
        f"'{_NORM_RE}', ' ', 'g')), ' ')"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest({norm}) AS term FROM {table}
),
tf AS (
  SELECT {id_col}, term, count(*) AS tf FROM toks
  WHERE length(term) >= {_MIN_TERM_LEN} GROUP BY 1, 2
),
doc_freq AS (SELECT term, count(*) AS doc_freq FROM tf GROUP BY 1),
scored AS (
  SELECT tf.{id_col}, tf.term, tf.tf, doc_freq.doc_freq,
         CAST(tf.tf * (SELECT count(*) FROM {table}) AS DOUBLE)
           / doc_freq.doc_freq AS score
  FROM tf JOIN doc_freq USING (term)
)
SELECT {id_col}, term, tf, doc_freq, score FROM scored
QUALIFY row_number() OVER (
  PARTITION BY {id_col} ORDER BY score DESC, term ASC) <= {k}
""".strip()
