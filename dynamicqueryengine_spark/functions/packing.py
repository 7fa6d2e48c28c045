"""Sequence packing — mapping a document stream onto fixed-length training
windows (the GPT-style "concatenate then split every ``seq_len`` tokens"
batching rule). For every document the operator answers: which training
sequence does this document start in, at what offset, and how many
sequences does it span — the bookkeeping a pretraining data loader needs to
build attention-mask / document-boundary tensors without materializing the
token stream.

Semantics: documents are concatenated in ascending ``id`` order (a total,
engine-independent order); token position ``p`` lands in sequence
``p div seq_len``. A document with exclusive-prefix ``start`` occupies
sequences ``start div seq_len`` through ``(start + tok - 1) div seq_len``.
Zero-token documents are excluded (they occupy no positions — and their
"last position" ``start - 1`` would floor-divide differently in engines
that round integer division toward -inf vs toward zero).

Scale shape (100 TB): the naive formulation is ONE global window over the
corpus — a single-task sort, the classic scale-killer. Implemented instead
as a two-level prefix sum (same machinery as ``sample_token_budget``):
documents land in ``buckets`` contiguous id-range buckets; per-bucket token
sums (a ``buckets``-row table) take the only ordered window; every
document then pays one bucket-local window keyed by (bucket), i.e.
``buckets``-way parallel. Values are identical to the naive global window,
which is what the SQL oracle runs. Bucket ranges come from one (min, max)
aggregate over the id column; id skew imbalances tasks but never changes
values — a production variant would draw range bounds from a sampled
RangePartitioner instead.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..util import spread
from .text import token_count_ws, token_count_ws_sql

__all__ = ["pack_sequences", "pack_sequences_sql"]


def pack_sequences(
    df: DataFrame,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """(id, tok_ws, start_offset, seq_idx, offset_in_seq, n_seqs) for every
    document with ≥1 whitespace token, in concat-by-id packing order."""
    base = spread(df).select(
        F.col(id_col),
        token_count_ws(F.col(text_col)).cast("long").alias("tok_ws"),
    ).filter(F.col("tok_ws") > 0)

    bounds = base.agg(
        F.min(id_col).alias("_lo"), F.max(id_col).alias("_hi")
    )
    # contiguous id-range buckets: integer arithmetic (monotone in id, no
    # float rounding at bucket edges); span fits long for any realistic id
    ranged = base.crossJoin(F.broadcast(bounds)).withColumn(
        "_bkt",
        F.expr(
            f"CAST((({id_col} - _lo) * {int(buckets)})"
            f" div (_hi - _lo + 1) AS INT)"
        ),
    )

    bstats = ranged.groupBy("_bkt").agg(F.sum("tok_ws").alias("_bsum"))
    wb = Window.orderBy("_bkt").rowsBetween(Window.unboundedPreceding, -1)
    bstats = bstats.withColumn(
        "_bstart", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    ).drop("_bsum")

    wd = (
        Window.partitionBy("_bkt")
        .orderBy(F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.col("_bstart") + F.coalesce(F.sum("tok_ws").over(wd), F.lit(0))
    L = F.lit(int(seq_len))
    return (
        ranged.join(F.broadcast(bstats), "_bkt")
        .withColumn("start_offset", start)
        .select(
            id_col,
            "tok_ws",
            "start_offset",
            F.expr(f"start_offset div {int(seq_len)}").alias("seq_idx"),
            (F.col("start_offset") % L).alias("offset_in_seq"),
            (
                F.expr(f"(start_offset + tok_ws - 1) div {int(seq_len)}")
                - F.expr(f"start_offset div {int(seq_len)}")
                + F.lit(1)
            ).alias("n_seqs"),
        )
    )


def pack_sequences_sql(
    table: str,
    seq_len: int = 2048,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror — the naive single global window the bucketed plan
    reproduces value-for-value. Every integer aggregate is CAST to BIGINT
    (DuckDB SUM yields HUGEINT, which round-trips through pandas as
    float64 and breaks the driver's value hash), and ``//`` floor-division
    agrees with Spark's ``div`` because every operand is non-negative."""
    return f"""
WITH base AS (
  SELECT {id_col},
         CAST({token_count_ws_sql(text_col)} AS BIGINT) AS tok_ws
  FROM {table}
),
pos AS (
  SELECT {id_col}, tok_ws,
         CAST(COALESCE(SUM(tok_ws) OVER (
             ORDER BY {id_col} ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS start_offset
  FROM base WHERE tok_ws > 0
)
SELECT {id_col}, tok_ws, start_offset,
       start_offset // {int(seq_len)} AS seq_idx,
       start_offset % {int(seq_len)} AS offset_in_seq,
       (start_offset + tok_ws - 1) // {int(seq_len)}
         - start_offset // {int(seq_len)} + 1 AS n_seqs
FROM pos
""".strip()
