"""Similarity search over embedding columns (SURVEY.md §7 Phase 4).

Two paths:

* :func:`cosine_topk` — brute-force exact top-k: **broadcast** the (small)
  query set against the corpus, compute cosine JVM-side, rank per query with
  a window. The corpus never shuffles — the only exchange is the final
  per-query top-k aggregation, so this scales linearly in corpus size at
  fixed query count. SQL-expressible → oracle-checkable.
* :func:`lsh_topk` — random-hyperplane LSH: deterministic signed projections
  bucket the corpus; queries probe their own bucket only, then exact-rerank
  within it. Recall < 1 by construction (documented); candidates shrink by
  ~2^bits. The hyperplanes derive from a seeded RNG so results are stable.

No Python UDFs; the dot product is ``zip_with``+``aggregate`` (whole-stage
codegen) with strict left-to-right double accumulation shared with the
DuckDB oracle mirror.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..util import spread
from .dedup import _dot, _dot_sql


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector.

    Output: (query_id, neighbor_id, cosine, rank) with rank 1..k, ties broken
    by neighbor id (deterministic). Self-matches are excluded when the query
    set is a subset of the corpus (same id space).
    """
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_cnrm"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_qnrm"),
    )
    cos = _dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnrm") * F.col("_cnrm"))
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )


def cosine_topk_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for :func:`cosine_topk` where the query set is
    ``SELECT * FROM table WHERE query_pred``."""
    dot_ab = _dot_sql(f"q.{vec_col}", f"c.{vec_col}")
    dot_self = _dot_sql(vec_col, vec_col)
    return f"""
WITH e AS (SELECT {id_col}, {vec_col}, sqrt({dot_self}) AS nrm FROM {table}),
q AS (SELECT * FROM e WHERE {query_pred.replace('__ID__', id_col)})
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
         {dot_ab} / (q.nrm * c.nrm) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.{id_col}
           ORDER BY {dot_ab} / (q.nrm * c.nrm) DESC, c.{id_col} ASC) AS rank
  FROM q, e c WHERE q.{id_col} <> c.{id_col})
WHERE rank <= {k}
""".strip()


def hyperplanes(dim: int, bits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (seeded Gaussian)."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(bits)]


def lsh_bucket(vec_col: F.Column, planes: list[list[float]]) -> F.Column:
    """Sign-pattern bucket id: bit i = sign(vec · plane_i)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(x) for x in plane]))
        bucket = bucket + F.when(proj > 0, F.lit(2**i).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: bucket by hyperplane signs, exact-rerank within the
    query's bucket. At 100 TB the bucket join shuffles ~n/2^bits of the
    corpus per query bucket instead of the full corpus."""
    planes = hyperplanes(dim, bits, seed)
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_cnrm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_qnrm"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    cos = _dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnrm") * F.col("_cnrm"))
    scored = (
        c.join(F.broadcast(q), on="bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", cos.alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("cosine", 6).alias("cosine"),
            "rank",
        )
    )
