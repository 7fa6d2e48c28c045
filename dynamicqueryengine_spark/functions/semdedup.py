"""SemDeDup: semantic deduplication via embedding-cluster partitioning.

The scale problem with embedding near-dup (``dedup.embedding_neardup_pairs``)
is the all-pairs comparison — O(n²) even tiled. SemDeDup (Abbas et al.,
"SemDeDup: Data-efficient learning at web-scale through semantic
deduplication", 2023) bounds it: partition the corpus into k clusters, then
compare pairs ONLY within a cluster — cost drops to Σ|cellᵢ|², and k grows
with the corpus so cells stay bounded. Missed cross-cell duplicates are the
documented recall trade (the paper's too).

Spark shape: cell assignment is one linear pass of k literal-centroid
distance folds (JVM-side, whole-stage codegen — the same expression as
``similarity.ivf_topk``); the within-cell self-join shuffles each side once
keyed by cell, and the per-cell quadratic stays bounded because cells do.
Nothing Python-side, nothing driver-side.

Determinism: centroids are the ``n_cells`` lowest-id vectors (no RNG), the
distance and cosine folds are strict left-to-right double accumulation, and
ties in cell assignment break on the lower cell index — all of which the
DuckDB oracle reproduces bit-for-bit, so even the recall loss is mirrored
and the output is fully value-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..util import spread
from .dedup import _dot, _dot_sql
from .similarity import _l2_sql

__all__ = ["semantic_dedup", "semantic_dedup_sql"]


def _assign_cells(
    corpus: DataFrame,
    centroids: list[list[float]],
    vec_col: str,
    id_col: str,
) -> DataFrame:
    """(id, vec, nrm, cell): nearest-centroid assignment over literal
    centroids. One projection per row; the d2 array is materialized once so
    each distance fold appears a single time in codegen (the least()+when
    chain form doubled every fold and compile time dominated)."""
    d2 = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    return (
        spread(corpus)
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_v"),
            F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_nrm"),
            d2.alias("_d2"),
        )
        .withColumn(
            "cell",
            (F.array_position(F.col("_d2"), F.array_min(F.col("_d2"))) - 1).cast(
                "int"
            ),
        )
        .drop("_d2")
    )


def semantic_dedup(
    corpus: DataFrame,
    n_cells: int = 8,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "list[list[float]] | None" = None,
) -> DataFrame:
    """(vec_id, cell, dup_of, is_kept) per corpus vector.

    ``dup_of``: the lowest id in the same cell whose cosine similarity with
    this vector is ≥ ``threshold`` (null if none) — the keep-lowest-id
    policy shared with exact dedup. ``is_kept`` = dup_of is null. The
    policy is intentionally non-transitive (b may be dropped for a while c
    is dropped for b); callers needing transitive duplicate GROUPS feed the
    pairs to ``cluster.connected_components`` instead.
    """
    if centroids is None:
        rows = (
            corpus.orderBy(F.col(id_col).asc())
            .limit(n_cells)
            .select(vec_col)
            .collect()
        )
        centroids = [[float(x) for x in r[0]] for r in rows]

    assigned = _assign_cells(corpus, centroids, vec_col, id_col).persist()
    pa = assigned.select(
        "cell",
        F.col("vec_id").alias("_ida"),
        F.col("_v").alias("_va"),
        F.col("_nrm").alias("_na"),
    )
    pb = assigned.select(
        "cell",
        F.col("vec_id").alias("_idb"),
        F.col("_v").alias("_vb"),
        F.col("_nrm").alias("_nb"),
    )
    cos = _dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb"))
    dup_of = (
        pa.join(pb, "cell")
        .filter(F.col("_ida") < F.col("_idb"))
        .filter(cos >= F.lit(threshold))
        .groupBy(F.col("_idb").alias("vec_id"))
        .agg(F.min("_ida").alias("dup_of"))
    )
    return (
        assigned.join(dup_of, "vec_id", "left")
        .select(
            "vec_id",
            "cell",
            "dup_of",
            F.col("dup_of").isNull().alias("is_kept"),
        )
    )


def semantic_dedup_sql(
    table: str,
    n_cells: int = 8,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle: identical lowest-id centroids, identical strict-fold
    distances/cosines, identical lower-cell tie-break — cell boundaries and
    therefore the exact recall behavior are reproduced, not approximated."""
    l2 = _l2_sql(f"e.{vec_col}", "c.cvec")
    dot_ab = _dot_sql(f"a.{vec_col}", f"b.{vec_col}")
    dot_self = _dot_sql(vec_col, vec_col)
    return f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cell, {vec_col} AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {n_cells})),
e AS (SELECT {id_col}, {vec_col}, sqrt({dot_self}) AS nrm FROM {table}),
assign AS (
  SELECT {id_col}, cell FROM (
    SELECT e.{id_col}, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                              ORDER BY {l2} ASC, c.cell ASC) AS rn
    FROM e CROSS JOIN cents c) WHERE rn = 1),
dups AS (
  SELECT ab.{id_col} AS id_b, min(aa.{id_col}) AS dup_of
  FROM assign aa
  JOIN assign ab ON aa.cell = ab.cell AND aa.{id_col} < ab.{id_col}
  JOIN e a ON a.{id_col} = aa.{id_col}
  JOIN e b ON b.{id_col} = ab.{id_col}
  WHERE {dot_ab} / (a.nrm * b.nrm) >= {threshold!r}
  GROUP BY ab.{id_col})
SELECT e.{id_col} AS vec_id, CAST(s.cell AS INT) AS cell, d.dup_of,
       d.dup_of IS NULL AS is_kept
FROM e
JOIN assign s ON s.{id_col} = e.{id_col}
LEFT JOIN dups d ON d.id_b = e.{id_col}
""".strip()
