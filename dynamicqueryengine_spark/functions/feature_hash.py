"""Feature-hash text embeddings — the "hashing trick" (Weinberger et
al., *Feature Hashing for Large Scale Multitask Learning*, ICML 2009):
every token hashes to one of ``dim`` slots with a ±1 sign, a document's
vector is the signed term-frequency histogram, and cosine over these
vectors is a model-free semantic similarity — the bridge from the text
family (functions/text.py, dedup.py) to the embedding family
(similarity.py, semdedup.py) with NO external model: a corpus with no
embedding column can still run the whole vector stack (cosine near-dup,
ANN, SemDeDup) over hashed embeddings.

Slot and sign derive from md5 so the Spark Column expression and the
DuckDB mirror produce the IDENTICAL vector: slot = first 8 hex digits
mod dim, sign = parity of the 9th digit. The vectors are INTEGER-valued
(sums of ±1, cast to double at the end), which makes downstream cosine
exactly reproducible across engines and accumulation orders: every dot
product and squared norm is an exact integer below 2^53, so the only
inexact steps are the final sqrt/divide — identical correctly-rounded
IEEE ops on identical inputs in both engines. (Learned float embeddings
cannot promise this; see dedup.embedding_neardup_pairs for how those
are handled.)

Scale shape: tokenize + hash is a pure map stage; the per-document
vector is ONE hash aggregate with ``dim`` conditional sums (map-side
combined, |docs|×dim output — dim=64 default keeps a 100 TB corpus's
vector table at vector-stack-friendly size). No Python UDFs, no
windows, no driver state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalize_text, normalize_text_sql

__all__ = ["feature_hash_embeddings", "feature_hash_embeddings_sql"]


def feature_hash_embeddings(
    df: DataFrame,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> DataFrame:
    """(id, embedding: array<double>) — signed term-frequency hash
    vectors. Documents with no tokens (or an all-cancelling zero
    vector) are dropped: a zero vector has no direction, and keeping it
    would make downstream cosine divide by zero."""
    tok = F.explode(
        F.split(normalize_text(F.col(text_col)), " ")
    ).alias("_t")
    toks = df.select(F.col(id_col), tok).filter(F.col("_t") != "")
    h = F.md5(F.col("_t"))
    slot = F.pmod(
        F.conv(F.substring(h, 1, 8), 16, 10).cast("long"), F.lit(dim)
    ).cast("int")
    sign = F.when(
        F.conv(F.substring(h, 9, 1), 16, 10).cast("int") % 2 == 0,
        F.lit(1),
    ).otherwise(F.lit(-1))
    hashed = toks.select(id_col, slot.alias("_s"), sign.alias("_g"))
    vec = F.array(
        *[
            F.sum(
                F.when(F.col("_s") == i, F.col("_g")).otherwise(F.lit(0))
            )
            .cast("double")
            .alias(f"_c{i}")
            for i in range(dim)
        ]
    )
    out = hashed.groupBy(id_col).agg(vec.alias(out_col))
    nonzero = F.exists(F.col(out_col), lambda x: x != 0)
    return out.filter(nonzero)


def feature_hash_embeddings_sql(
    table: str,
    dim: int = 64,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "embedding",
) -> str:
    """DuckDB mirror of :func:`feature_hash_embeddings`."""
    norm = normalize_text_sql(text_col)
    sums = ",\n         ".join(
        f"CAST(sum(CASE WHEN s = {i} THEN g ELSE 0 END) AS DOUBLE)"
        for i in range(dim)
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, unnest(regexp_split_to_array({norm}, ' ')) AS t
  FROM {table}
),
hashed AS (
  SELECT {id_col},
         CAST('0x' || substr(md5(t), 1, 8) AS BIGINT) % {dim} AS s,
         CASE WHEN CAST('0x' || substr(md5(t), 9, 1) AS INT) % 2 = 0
              THEN 1 ELSE -1 END AS g
  FROM toks WHERE t <> ''
),
vecs AS (
  SELECT {id_col},
         list_value({sums}) AS {out_col}
  FROM hashed GROUP BY {id_col}
)
SELECT {id_col}, {out_col} FROM vecs
WHERE len(list_filter({out_col}, x -> x <> 0)) > 0
""".strip()
