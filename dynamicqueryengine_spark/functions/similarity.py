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


def mips_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k MAXIMUM INNER PRODUCT search per query vector — the
    retrieval objective for un-normalized embeddings (recommender /
    reranker scores), distinct from cosine: a long vector can win on
    inner product while losing on angle.

    Same execution shape as :func:`cosine_topk`: broadcast the query
    set, score JVM-side (zip_with+aggregate, strict left-to-right), one
    per-query window for the top-k — the corpus never shuffles. Scale
    path beyond brute force: the order-isomorphic augmentation
    [x; sqrt(M² − ‖x‖²)] (Bachrach et al. 2014, RecSys) turns MIPS into
    cosine over d+1 dims, after which the IVF/PQ machinery here
    (:func:`ivf_topk`, functions/pq.py) prunes cells exactly as for
    cosine — this entry pins the exact baseline those variants are
    judged against.

    Output: (query_id, neighbor_id, inner_product, rank), rank 1..k,
    ties broken by neighbor id. Self-matches excluded."""
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cvec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qvec"),
    )
    ip = _dot(F.col("_qvec"), F.col("_cvec"))
    scored = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select("query_id", "neighbor_id", ip.alias("inner_product"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("inner_product").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("inner_product", 6).alias("inner_product"),
            "rank",
        )
    )


def mips_topk_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB oracle for :func:`mips_topk` — same fold order, same
    tie-break."""
    dot_ab = _dot_sql(f"q.{vec_col}", f"c.{vec_col}")
    return f"""
WITH q AS (SELECT * FROM {table} WHERE {query_pred.replace('__ID__', id_col)})
SELECT query_id, neighbor_id, round(ip, 6) AS inner_product, rank FROM (
  SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
         {dot_ab} AS ip,
         ROW_NUMBER() OVER (
           PARTITION BY q.{id_col}
           ORDER BY {dot_ab} DESC, c.{id_col} ASC) AS rank
  FROM q, {table} c WHERE q.{id_col} <> c.{id_col})
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


def _plane_literal_sql(plane: list[float]) -> str:
    """Hyperplane as a DuckDB double-list literal; ``repr`` round-trips
    doubles exactly, so both engines see bit-identical coefficients."""
    return "[" + ", ".join(repr(float(x)) for x in plane) + "]"


def lsh_bucket_sql(vec_expr: str, planes: list[list[float]]) -> str:
    """SQL mirror of :func:`lsh_bucket`: same literal hyperplanes, same
    left-to-right dot-product fold, same sign-bit packing."""
    terms = [
        f"CASE WHEN {_dot_sql(vec_expr, _plane_literal_sql(p))} > 0 "
        f"THEN CAST({2 ** i} AS BIGINT) ELSE 0 END"
        for i, p in enumerate(planes)
    ]
    return "(" + " + ".join(terms) + ")"


def lsh_topk_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    bits: int = 8,
    dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Full value oracle for :func:`lsh_topk`. The hyperplanes are seeded
    literals baked into both engines' plans, so bucketing — and therefore
    the exact result set, recall loss included — is reproduced verbatim."""
    planes = hyperplanes(dim, bits, seed)
    bucket = lsh_bucket_sql(vec_col, planes)
    dot_ab = _dot_sql(f"q.{vec_col}", f"c.{vec_col}")
    dot_self = _dot_sql(vec_col, vec_col)
    return f"""
WITH e AS (SELECT {id_col}, {vec_col}, sqrt({dot_self}) AS nrm,
                  {bucket} AS bucket FROM {table}),
q AS (SELECT * FROM e WHERE {query_pred.replace('__ID__', id_col)})
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT q.{id_col} AS query_id, c.{id_col} AS neighbor_id,
         {dot_ab} / (q.nrm * c.nrm) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY q.{id_col}
           ORDER BY {dot_ab} / (q.nrm * c.nrm) DESC, c.{id_col} ASC) AS rank
  FROM q JOIN e c ON q.bucket = c.bucket AND q.{id_col} <> c.{id_col})
WHERE rank <= {k}
""".strip()


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
    # persisted (r15, guide §5): every Lloyd iteration re-read this
    # spread projection — iterations × one corpus scan; the seed collect
    # doubles as the cache's materialization, so no extra job
    cached = spread(corpus.select(id_col, vec_col)).persist()
    init = (
        cached.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(vec_col)
        .collect()
    )
    centroids = np.stack([np.array(r[0], dtype=np.float64) for r in init])

    data = cached.select(vec_col)
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
    cached.unpersist()
    return centroids.tolist()


def kmeans_centroids_exact(
    corpus: DataFrame,
    k: int = 16,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "list":
    """ENGINE-EXACT fixed-iteration Lloyd's k-means: centroids any engine
    can reproduce bit-for-bit, making the refined-IVF search fully
    value-oracle-checkable (``ivf_topk_lloyd_sql`` unrolls the identical
    iterations in DuckDB SQL).

    Three determinism ingredients, shared with the rest of the package:

    * seeding: the ``k`` lowest-id vectors (no RNG);
    * assignment: squared-L2 accumulated in ELEMENT order (per-dim
      vectorized loop — np's pairwise/BLAS order could flip an argmin
      between near-tied centroids), first-minimum tie-break = lowest cell;
    * mean update: per-(cell, dim) sums in DECIMAL(38,12) — exact and
      commutative, so shuffle/reduction order cannot perturb them — cast
      to double only for the final single division (the
      ``group_centroids`` pattern from functions/embeddings.py).

    Per iteration: one corpus pass for assignment (map-only Arrow), one
    posexplode → groupBy(cell, dim) aggregation whose post-shuffle state
    is k × dim rows regardless of corpus size, and a k × dim collect.
    The float-reduction variant (:func:`kmeans_centroids`) remains the
    cheaper choice when cross-engine exactness isn't needed.
    """
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    # the seed collect doubles as the cache's materialization (r15,
    # guide §1.2): the r14 form scanned the corpus once for the seeds
    # and AGAIN for an eager count of the cached projection
    cached = spread(corpus.select(id_col, vec_col)).persist()
    init = (
        cached.orderBy(F.col(id_col).asc())
        .limit(k)
        .select(vec_col)
        .collect()
    )
    cents = [np.asarray(r[0], dtype=np.float64) for r in init]

    data = cached.select(vec_col)
    for _ in range(iterations):
        carr = np.stack(cents)
        bc = spark.sparkContext.broadcast(carr)

        def assign(batches, _bc=bc):
            cc = _bc.value
            for b in batches:
                x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
                acc = np.zeros((x.shape[0], cc.shape[0]))
                for d in range(cc.shape[1]):
                    diff = x[:, d : d + 1] - cc[:, d][None, :]
                    acc = acc + diff * diff
                yield pd.DataFrame(
                    {
                        "cell": np.argmin(acc, axis=1).astype(np.int32),
                        vec_col: b[vec_col],
                    }
                )

        stats = (
            data.mapInPandas(assign, schema=f"cell int, {vec_col} array<float>")
            .select("cell", F.posexplode(vec_col).alias("_p", "_v"))
            .select(
                "cell",
                (F.col("_p") + 1).alias("dim"),
                F.col("_v").cast("double").cast("decimal(38,12)").alias("_vd"),
            )
            .groupBy("cell", "dim")
            .agg(F.sum("_vd").alias("_s"), F.count(F.lit(1)).alias("n"))
            .select(
                "cell", "dim", (F.col("_s").cast("double") / F.col("n")).alias("mu")
            )
            .collect()
        )
        per_cell: dict = {}
        for row in stats:
            per_cell.setdefault(row["cell"], {})[row["dim"]] = row["mu"]
        new = [c.copy() for c in cents]  # empty cells keep their centroid
        for cell, dims in per_cell.items():
            new[cell] = np.array([dims[d] for d in sorted(dims)])
        cents = new
        bc.unpersist()
    cached.unpersist()
    return [c.tolist() for c in cents]


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

    import pandas as pd

    def _d2_np(x: "np.ndarray") -> "np.ndarray":
        # (rows, n_cells) squared L2 with a Python loop over DIMS of
        # vectorized ops — accumulation order is element order, exactly
        # the SQL mirror's left-to-right fold (np.sum's pairwise
        # reduction can differ in the last ulp, enough to flip an argmin
        # between near-tied centroids). Same order-exact pattern as pq.py.
        acc = np.zeros((x.shape[0], cents.shape[0]))
        for d in range(cents.shape[1]):
            diff = x[:, d : d + 1] - cents[:, d][None, :]
            acc = acc + diff * diff
        return acc

    # Cell assignment via Arrow-vectorized mapInPandas (map-only, no
    # shuffle): the earlier Column-fold formulation was semantically
    # identical but ran n_cells × dim interpreted lambda steps per row
    # (~2M at sf0.1 — the dominant query cost). np.argmin returns the
    # FIRST minimum — the same lowest-cell tie-break as the mirror's
    # ROW_NUMBER ... ORDER BY l2, cell.
    def assign(batches):
        for b in batches:
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            yield pd.DataFrame(
                {
                    "neighbor_id": b[id_col].to_numpy(),
                    "_cvec": b[vec_col],
                    "cell": np.argmin(_d2_np(x), axis=1).astype(np.int32),
                }
            )

    c = (
        spread(corpus)
        .select(id_col, vec_col)
        .mapInPandas(
            assign,
            schema="neighbor_id long, _cvec array<float>, cell int",
        )
        .withColumn("_cnrm", F.sqrt(_dot(F.col("_cvec"), F.col("_cvec"))))
    )

    # Probe assignment: n_probe smallest cells per query by (d2, cell) —
    # stable argsort on the order-exact d2 matrix gives index-order ties,
    # matching the mirror. No queries.collect(): a 10^6-query set costs
    # one distributed scan.
    def probe(batches):
        for b in batches:
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            order = np.argsort(_d2_np(x), axis=1, kind="stable")[:, :n_probe]
            qid = b[id_col].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qid, n_probe),
                    "cell": order.astype(np.int32).ravel(),
                    "_qvec": b[vec_col].iloc[
                        np.repeat(np.arange(len(b)), n_probe)
                    ].to_numpy(),
                }
            )

    q = (
        spread(queries.select(id_col, vec_col))
        .mapInPandas(
            probe, schema="query_id long, cell int, _qvec array<float>"
        )
        .withColumn("_qnrm", F.sqrt(_dot(F.col("_qvec"), F.col("_qvec"))))
    )

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


def _l2_sql(a: str, b: str) -> str:
    """Σ (aᵢ−bᵢ)² with the same prepend-0 left-to-right fold as the Spark
    Column expression in ``ivf_topk``'s cell assignment."""
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
        f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), (x, y) -> x + y)"
    )


def ivf_topk_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Full value oracle for :func:`ivf_topk` with deterministic centroids
    (the ``n_cells`` lowest-id corpus vectors — the same seeding the driver
    query passes in). Cell ids are the rank of the centroid's ``vec_id``,
    matching the Spark path's positional index; ties in both assignment and
    probing break on the lower cell id in both engines."""
    l2 = _l2_sql(f"e.{vec_col}", "c.cvec")
    l2q = _l2_sql(f"q.{vec_col}", "c.cvec")
    dot_ab = _dot_sql(f"q.{vec_col}", f"n.{vec_col}")
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
q AS (SELECT * FROM e WHERE {query_pred.replace('__ID__', id_col)}),
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.{id_col} AS query_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.{id_col}
                              ORDER BY {l2q} ASC, c.cell ASC) AS rn
    FROM q CROSS JOIN cents c) WHERE rn <= {n_probe})
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT p.query_id, n.{id_col} AS neighbor_id,
         {dot_ab} / (q.nrm * n.nrm) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY {dot_ab} / (q.nrm * n.nrm) DESC, n.{id_col} ASC) AS rank
  FROM probe p
  JOIN assign a ON a.cell = p.cell
  JOIN e n ON n.{id_col} = a.{id_col}
  JOIN q ON q.{id_col} = p.query_id
  WHERE q.{id_col} <> n.{id_col})
WHERE rank <= {k}
""".strip()


def ivf_topk_lloyd_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    iterations: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Full value oracle for IVF over :func:`kmeans_centroids_exact`
    centroids: the fixed ``iterations`` Lloyd's rounds are UNROLLED as
    chained CTEs — seed = the ``n_cells`` lowest-id vectors, assignment =
    element-order L2 with lowest-cell tie-break, mean update =
    DECIMAL(38,12) sums cast to double for one division — followed by the
    same assign/probe/rerank search as :func:`ivf_topk_sql`. Because every
    arithmetic step mirrors the Spark path exactly, the refined centroids
    (and therefore the approximate search result, recall loss included)
    hash-match across engines."""
    l2 = _l2_sql(f"e.{vec_col}", "c.cvec")
    l2q = _l2_sql(f"q.{vec_col}", "c.cvec")
    dot_ab = _dot_sql(f"q.{vec_col}", f"n.{vec_col}")
    dot_self = _dot_sql(vec_col, vec_col)
    final = f"cents{iterations}"
    ctes = [
        f"""e AS (SELECT {id_col}, {vec_col}, sqrt({dot_self}) AS nrm FROM {table})""",
        f"""ex AS (
  SELECT {id_col},
         unnest(range(1, len({vec_col}) + 1)) AS dim,
         CAST(CAST(unnest({vec_col}) AS DOUBLE) AS DECIMAL(38,12)) AS vd
  FROM {table})""",
        f"""cents0 AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cell, {vec_col} AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {n_cells}))""",
    ]
    for i in range(iterations):
        ctes.append(
            f"""assign{i} AS (
  SELECT {id_col}, cell FROM (
    SELECT e.{id_col}, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                              ORDER BY {l2} ASC, c.cell ASC) AS rn
    FROM e CROSS JOIN cents{i} c) WHERE rn = 1)"""
        )
        ctes.append(
            f"""sums{i} AS (
  SELECT a.cell, x.dim, CAST(sum(x.vd) AS DOUBLE) / count(*) AS mu
  FROM assign{i} a JOIN ex x USING ({id_col})
  GROUP BY a.cell, x.dim)"""
        )
        ctes.append(
            f"""cents{i + 1} AS (
  SELECT cell, list(mu ORDER BY dim) AS cvec FROM sums{i} GROUP BY cell
  UNION ALL
  SELECT c.cell, CAST(c.cvec AS DOUBLE[]) AS cvec FROM cents{i} c
  WHERE c.cell NOT IN (SELECT cell FROM sums{i}))"""
        )
    ctes.append(
        f"""assignf AS (
  SELECT {id_col}, cell FROM (
    SELECT e.{id_col}, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                              ORDER BY {l2} ASC, c.cell ASC) AS rn
    FROM e CROSS JOIN {final} c) WHERE rn = 1)"""
    )
    ctes.append(
        f"""q AS (SELECT * FROM e WHERE {query_pred.replace('__ID__', id_col)})"""
    )
    ctes.append(
        f"""probe AS (
  SELECT query_id, cell FROM (
    SELECT q.{id_col} AS query_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.{id_col}
                              ORDER BY {l2q} ASC, c.cell ASC) AS rn
    FROM q CROSS JOIN {final} c) WHERE rn <= {n_probe})"""
    )
    body = ",\n".join(ctes)
    return f"""
WITH {body}
SELECT query_id, neighbor_id, round(cosine, 6) AS cosine, rank FROM (
  SELECT p.query_id, n.{id_col} AS neighbor_id,
         {dot_ab} / (q.nrm * n.nrm) AS cosine,
         ROW_NUMBER() OVER (
           PARTITION BY p.query_id
           ORDER BY {dot_ab} / (q.nrm * n.nrm) DESC, n.{id_col} ASC) AS rank
  FROM probe p
  JOIN assignf a ON a.cell = p.cell
  JOIN e n ON n.{id_col} = a.{id_col}
  JOIN q ON q.{id_col} = p.query_id
  WHERE q.{id_col} <> n.{id_col})
WHERE rank <= {k}
""".strip()


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
    import numpy as np
    import pandas as pd

    planes = hyperplanes(dim, bits, seed)
    pl = np.asarray(planes, dtype=np.float64)  # (bits, dim)

    def _buckets_np(x: "np.ndarray") -> "np.ndarray":
        # sign-pattern bucket with the projection accumulated in ELEMENT
        # order (per-dim vectorized loop) — the sign of a near-zero
        # projection is exactly where np.dot's pairwise/BLAS reduction
        # order could disagree with the SQL mirror's left-to-right fold
        out = np.zeros(x.shape[0], dtype=np.int64)
        for i in range(pl.shape[0]):
            acc = np.zeros(x.shape[0])
            for d in range(pl.shape[1]):
                acc = acc + x[:, d] * pl[i, d]
            out = out + ((acc > 0).astype(np.int64) << i)
        return out

    def _tag(alias: str):
        def tag(batches):
            for b in batches:
                x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
                yield pd.DataFrame(
                    {
                        alias: b[id_col].to_numpy(),
                        "_vec": b[vec_col],
                        "bucket": _buckets_np(x),
                    }
                )

        return tag

    # Bucket assignment via Arrow-vectorized mapInPandas — the Column-fold
    # form ran bits × dim interpreted lambda steps per row; map-only
    # either way (lsh_bucket stays the Column-side reference, used by the
    # SQL-mirror parity tests).
    c = (
        spread(corpus)
        .select(id_col, vec_col)
        .mapInPandas(
            _tag("neighbor_id"),
            schema="neighbor_id long, _vec array<float>, bucket long",
        )
        .select(
            "neighbor_id",
            F.col("_vec").alias("_cvec"),
            F.sqrt(_dot(F.col("_vec"), F.col("_vec"))).alias("_cnrm"),
            "bucket",
        )
    )
    q = (
        queries.select(id_col, vec_col)
        .mapInPandas(
            _tag("query_id"),
            schema="query_id long, _vec array<float>, bucket long",
        )
        .select(
            "query_id",
            F.col("_vec").alias("_qvec"),
            F.sqrt(_dot(F.col("_vec"), F.col("_vec"))).alias("_qnrm"),
            "bucket",
        )
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
