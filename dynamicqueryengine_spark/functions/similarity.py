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


def kmeans_centroids(
    corpus: DataFrame,
    k: int = 16,
    iterations: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "list":
    """Deterministic distributed Lloyd's k-means (for the IVF index).

    Init = the k lowest-id vectors (deterministic, no RNG). Each iteration:
    executors assign their Arrow batch to the nearest broadcast centroid and
    emit per-cell partial (sum, count); the driver reduces k rows and
    re-broadcasts. Work per iteration is one corpus pass — the same
    broadcast-block matmul pattern as the search itself; no MLlib needed.
    """
    import numpy as np

    spark = corpus.sparkSession
    init = corpus.orderBy(F.col(id_col).asc()).limit(k).select(vec_col).collect()
    centroids = np.stack([np.array(r[0], dtype=np.float64) for r in init])

    data = spread(corpus.select(vec_col))
    for _ in range(iterations):
        bc = spark.sparkContext.broadcast(centroids)

        def partials(batches):
            import pandas as pd

            cents = bc.value
            kk, dim = cents.shape
            for batch in batches:
                mat = np.stack(batch.iloc[:, 0].to_numpy()).astype(np.float64)
                d2 = ((mat[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
                assign = d2.argmin(axis=1)
                sums = np.zeros((kk, dim))
                counts = np.zeros(kk)
                np.add.at(sums, assign, mat)
                np.add.at(counts, assign, 1)
                yield pd.DataFrame(
                    {
                        "cell": range(kk),
                        "s": [sums[i].tolist() for i in range(kk)],
                        "n": counts,
                    }
                )

        agg = (
            data.mapInPandas(partials, schema="cell int, s array<double>, n double")
            .groupBy("cell")
            .agg(
                F.array(
                    *[
                        F.sum(F.col("s")[i]).alias(f"d{i}")
                        for i in range(centroids.shape[1])
                    ]
                ).alias("s"),
                F.sum("n").alias("n"),
            )
            .collect()
        )
        new = centroids.copy()
        for row in agg:
            if row["n"] > 0:
                new[row["cell"]] = np.array(row["s"]) / row["n"]
        centroids = new
    return centroids.tolist()


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    centroids: "list | None" = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: assign the corpus to k-means
    cells once, probe only the ``n_probe`` nearest cells per query, exact
    cosine rerank within them. The classic ANN scale path: search cost drops
    by ~n_cells/n_probe while the assignment is one linear pass.

    Recall < 1 when a true neighbor lives in an unprobed cell (measured in
    tests against the brute-force oracle)."""
    import numpy as np

    if centroids is None:
        centroids = kmeans_centroids(corpus, k=n_cells, vec_col=vec_col, id_col=id_col)
    cents = np.asarray(centroids, dtype=np.float64)

    def cell_of(col: F.Column) -> F.Column:
        # nearest centroid by squared L2, as a Column expression over the
        # broadcast (literal) centroid array — JVM-side, no Python at row time
        d2 = [
            F.aggregate(
                F.zip_with(
                    col, F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: (a.cast("double") - b) * (a.cast("double") - b),
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in cents
        ]
        best = F.least(*d2)
        expr = F.lit(-1)
        for i in reversed(range(len(d2))):
            expr = F.when(d2[i] == best, F.lit(i)).otherwise(expr)
        return expr

    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
        F.sqrt(_dot(F.col(vec_col), F.col(vec_col))).alias("_cnrm"),
        cell_of(F.col(vec_col)).alias("cell"),
    )

    # driver-side probe list per query would need a collect; instead explode
    # each query into its n_probe nearest cells (queries are the small side)
    import numpy as _np

    q_rows = queries.select(id_col, vec_col).collect()
    probe_rows = []
    for r in q_rows:
        v = _np.array(r[vec_col], dtype=_np.float64)
        d2 = ((cents - v) ** 2).sum(axis=1)
        for cell in _np.argsort(d2)[:n_probe]:
            probe_rows.append((int(r[id_col]), int(cell), [float(x) for x in v]))
    q = corpus.sparkSession.createDataFrame(
        probe_rows, f"query_id long, cell int, _qvec array<double>"
    ).withColumn("_qnrm", F.sqrt(_dot(F.col("_qvec"), F.col("_qvec"))))

    cos = _dot(F.col("_qvec"), F.col("_cvec")) / (F.col("_qnrm") * F.col("_cnrm"))
    scored = (
        c.join(F.broadcast(q), on="cell")
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
            "query_id", "neighbor_id", F.round("cosine", 6).alias("cosine"), "rank"
        )
    )


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
