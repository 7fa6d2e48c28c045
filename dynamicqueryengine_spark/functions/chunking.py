"""Document chunking / sequence packing — split each document into
fixed-size token windows, the step that turns a cleaned corpus into
training sequences (context-length packing, with optional overlap for
long-range continuation examples).

Spark shape: tokenization and window arithmetic are row-local Column
expressions (split → sequence → slice → concat_ws) inside whole-stage
codegen; the explode multiplies rows but never shuffles — chunking a
100 TB corpus is a pure map stage whose output partitioning follows the
input. Token counts per chunk are exact integers; the chunk text is the
exact word slice — both value-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import spread

__all__ = ["chunk_documents", "chunk_documents_sql"]

_NORM_RE = "[^a-z0-9]+"


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, chunk_idx (0-based), n_tokens, chunk_text) — consecutive
    ``chunk_tokens``-word windows every ``stride`` words (default:
    non-overlapping). The final partial window is kept (packing decides
    downstream whether to pad or merge it); empty documents yield no
    chunks."""
    stride = chunk_tokens if stride is None else stride
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    words = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)), _NORM_RE, " ")), " "
    )
    tokenized = (
        spread(df)
        .select(F.col(id_col), words.alias("_w"))
        .filter((F.size("_w") > 0) & (F.col("_w")[0] != ""))
    )
    # chunk start offsets: 0, stride, 2*stride, ... while start < n_words
    n_chunks = F.ceil(F.size("_w") / F.lit(stride)).cast("int")
    return (
        tokenized.select(
            id_col,
            F.col("_w"),
            F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
        )
        .select(
            id_col,
            "chunk_idx",
            F.slice(
                "_w", F.col("chunk_idx") * stride + 1, chunk_tokens
            ).alias("_c"),
        )
        # overlapping strides can make a trailing window start past the end
        .filter(F.size("_c") > 0)
        .select(
            id_col,
            "chunk_idx",
            F.size("_c").alias("n_tokens"),
            F.concat_ws(" ", "_c").alias("chunk_text"),
        )
    )


def chunk_documents_sql(
    table: str,
    chunk_tokens: int = 64,
    stride: int | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`chunk_documents` — same normal form,
    1-based inclusive list slices."""
    stride = chunk_tokens if stride is None else stride
    norm = (
        f"regexp_split_to_array(trim(regexp_replace(lower({text_col}), "
        f"'{_NORM_RE}', ' ', 'g')), ' ')"
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, {norm} AS w FROM {table}
  WHERE len({norm}) > 0 AND {norm}[1] <> ''
),
idx AS (
  SELECT {id_col}, w,
         CAST(unnest(range(0, CAST(ceil(len(w) / {stride}.0) AS BIGINT))) AS INT)
           AS chunk_idx
  FROM toks
),
sliced AS (
  SELECT {id_col}, chunk_idx,
         w[chunk_idx * {stride} + 1 : chunk_idx * {stride} + {chunk_tokens}]
           AS c
  FROM idx
)
SELECT {id_col}, chunk_idx, CAST(len(c) AS INT) AS n_tokens,
       array_to_string(c, ' ') AS chunk_text
FROM sliced WHERE len(c) > 0
""".strip()
