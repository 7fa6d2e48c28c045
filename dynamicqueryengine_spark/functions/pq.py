"""Product quantization (PQ) ANN — asymmetric-distance search over
subspace-coded embeddings (Jégou, Douze, Schmid, "Product Quantization
for Nearest Neighbor Search", TPAMI 2011). The third ANN path beside
hyperplane LSH and IVF (similarity.py), and the one that changes the
STORAGE equation: a 64-dim float32 vector (256 B) compresses to
``n_sub`` uint8 codes (8 B at the default 8×16 configuration), so a
100 TB embedding corpus scans as ~3 TB of codes.

Mechanics: the vector splits into ``n_sub`` contiguous subspaces; each
subspace has its own ``n_codes``-entry codebook; a vector's code is the
per-subspace nearest centroid. A query never decompresses the corpus —
it builds a ``n_sub × n_codes`` lookup table of subspace distances
(ADC), and each corpus row's distance is the sum of ``n_sub`` table
lookups: O(n_sub) per candidate instead of O(dim).

Scale shape (100 TB): encoding is one map-only pass (pure Column
expressions, no shuffle); the search broadcasts the (small) query side
with its LUTs and scans codes — the only exchange is the per-query
top-k window, identical to the brute-force path but over an 8-byte
payload. Codebooks here are DETERMINISTIC (subspace slices of the
``n_codes`` lowest-id corpus vectors — the same seeding contract as
``ivf_topk_sql``), which makes the whole pipeline value-checkable in
DuckDB; a production deployment would train them with per-subspace
Lloyd iterations (``kmeans_centroids`` on slices) at identical plan
shape, trading oracle-exactness for quantization quality.

Recall < 1 by construction (quantization error moves neighbors across
the top-k boundary); measured against the brute-force oracle in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from ..util import spread

__all__ = [
    "pq_codebooks",
    "pq_topk",
    "pq_topk_sql",
    "ivfpq_topk",
    "ivfpq_topk_sql",
]


def pq_codebooks(
    corpus: DataFrame,
    n_sub: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "list":
    """Deterministic codebooks: ``cb[s][c]`` = subspace-``s`` slice of the
    (c+1)-th lowest-id corpus vector. A bounded ``n_codes``-row collect —
    the same deterministic-seeding contract the IVF oracle uses."""
    rows = (
        corpus.orderBy(F.col(id_col).asc()).limit(n_codes).select(vec_col).collect()
    )
    vecs = [[float(x) for x in r[0]] for r in rows]
    dim = len(vecs[0])
    dsub = dim // n_sub
    return [
        [v[s * dsub : (s + 1) * dsub] for v in vecs] for s in range(n_sub)
    ]


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    codebooks: "list | None" = None,
) -> DataFrame:
    """(query_id, neighbor_id, adc_d2, rank): per query, the ``k`` corpus
    rows with the smallest ADC squared-L2 distance (ties → lower id);
    self-matches excluded."""
    import numpy as np
    import pandas as pd

    cb = codebooks if codebooks is not None else pq_codebooks(
        corpus, n_sub, n_codes, vec_col, id_col
    )
    dim = sum(len(cb[s][0]) for s in range(n_sub))
    dsub = dim // n_sub
    # cb as (n_sub, n_codes, dsub) float64 — broadcast-by-closure (KBs)
    cb_arr = np.asarray(cb, dtype=np.float64)

    def _sub_d2_np(x: "np.ndarray", s: int) -> "np.ndarray":
        """(rows, n_codes) strict left-to-right Σ(xᵢ−cᵢ)² — a Python loop
        over the dsub dims of VECTORIZED ops, so the accumulation order is
        element order, bit-identical to the SQL fold (np.sum's pairwise
        reduction would differ in the last ulp, enough to flip an argmin
        on near-tied centroids)."""
        sl = x[:, s * dsub : (s + 1) * dsub]
        acc = np.zeros((sl.shape[0], cb_arr.shape[1]))
        for d in range(dsub):
            diff = sl[:, d : d + 1] - cb_arr[s, :, d][None, :]
            acc = acc + diff * diff
        return acc

    # Encode via Arrow-vectorized mapInPandas: n_sub × n_codes × dsub
    # mul-adds per row as ~n_sub·dsub numpy array ops per BATCH. The
    # first formulation was pure Column folds — semantically identical
    # but 128 interpreted higher-order lambdas per row (~2M lambda calls
    # at sf0.1, 5× this whole query's budget). Map-only either way: the
    # scan never shuffles.
    def encode(batches):
        for b in batches:
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(b), n_sub), dtype=np.int32)
            for s in range(n_sub):
                codes[:, s] = np.argmin(_sub_d2_np(x, s), axis=1)  # first min
            yield pd.DataFrame(
                {
                    "neighbor_id": b[id_col].to_numpy(),
                    "_codes": list(codes),
                }
            )

    enc = spread(corpus).select(id_col, vec_col).mapInPandas(
        encode, schema="neighbor_id long, _codes array<int>"
    )

    # Query-side ADC lookup tables, same strict fold.
    def make_luts(batches):
        for b in batches:
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            luts = np.stack(
                [_sub_d2_np(x, s) for s in range(n_sub)], axis=1
            )  # (rows, n_sub, n_codes)
            yield pd.DataFrame(
                {
                    "query_id": b[id_col].to_numpy(),
                    "_luts": [row.tolist() for row in luts],
                }
            )

    q = queries.select(id_col, vec_col).mapInPandas(
        make_luts, schema="query_id long, _luts array<array<double>>"
    )

    # ADC distance: sum of one LUT lookup per subspace, folded strictly
    # left-to-right in subspace order (FP addition order is part of the
    # oracle contract).
    dist = F.aggregate(
        F.zip_with(
            F.col("_codes"),
            F.col("_luts"),
            lambda c, l: F.element_at(l, c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        enc.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dist.alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc_d2", 6).alias("adc_d2"),
            "rank",
        )
    )


def pq_topk_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Full value oracle with the same deterministic codebooks (subspace
    slices of the ``n_codes`` lowest-id vectors). ``__ID__`` in
    ``query_pred`` is substituted with the id column."""
    dsub = dim // n_sub

    def l2(a_sl: str, b_sl: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({a_sl}, {b_sl}), "
            f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
            f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), (x, y) -> x + y)"
        )

    def sl(expr: str, s: str) -> str:
        return f"list_slice({expr}, {s} * {dsub} + 1, ({s} + 1) * {dsub})"

    return f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS c, {vec_col} AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {n_codes})),
subs AS (SELECT unnest(range({n_sub})) AS s),
cb AS (
  SELECT s, c, {sl('cvec', 's')} AS cent FROM cents CROSS JOIN subs),
codes AS (
  SELECT {id_col}, s, c AS code FROM (
    SELECT e.{id_col}, cb.s, cb.c,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}, cb.s
                              ORDER BY {l2(sl(f'e.{vec_col}', 'cb.s'), 'cb.cent')} ASC,
                                       cb.c ASC) AS rn
    FROM {table} e CROSS JOIN cb) WHERE rn = 1),
q AS (SELECT {id_col}, {vec_col} FROM {table}
      WHERE {query_pred.replace('__ID__', id_col)}),
luts AS (
  SELECT q.{id_col} AS query_id, cb.s, cb.c,
         {l2(sl(f'q.{vec_col}', 'cb.s'), 'cb.cent')} AS d2
  FROM q CROSS JOIN cb),
dists AS (
  SELECT l.query_id, e.{id_col} AS neighbor_id,
         list_reduce(list_prepend(0.0, list(l.d2 ORDER BY l.s)),
                     (x, y) -> x + y) AS adc_d2
  FROM codes e
  JOIN luts l ON l.s = e.s AND l.c = e.code
  WHERE l.query_id <> e.{id_col}
  GROUP BY l.query_id, e.{id_col})
SELECT query_id, neighbor_id, round(adc_d2, 6) AS adc_d2, rank FROM (
  SELECT query_id, neighbor_id, adc_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
  FROM dists)
WHERE rank <= {k}
""".strip()


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF-PQ — the production-standard ANN combination (FAISS
    ``IVFx,PQy``): IVF cell partitioning bounds WHICH rows are scanned
    (~n_probe/n_cells of the corpus) while PQ codes bound the BYTES per
    scanned row (8 B vs 256 B at the defaults), so the two compose
    multiplicatively — the only formulation that holds at 10⁹⁺ vectors.

    One corpus pass emits (id, cell, codes): the cell argmin and the
    per-subspace code argmins share the same Arrow batch (no second
    scan). The query pass emits (query_id, probed cell, LUTs); the scan
    is a hash equijoin on cell against the broadcast query side — never
    the all-pairs broadcast the flat-PQ baseline uses — and each
    candidate costs n_sub LUT lookups. Both argmins use the
    element-order-exact L2 fold and lowest-index tie-break, and the ADC
    sum folds left-to-right in subspace order, so the result —
    quantization error AND probe-miss recall loss included — is
    reproduced verbatim by :func:`ivfpq_topk_sql` (centroids = the
    ``n_cells`` lowest-id vectors, codebooks = subspace slices of the
    ``n_codes`` lowest-id vectors — the package's deterministic seeding
    contract)."""
    import numpy as np
    import pandas as pd

    cents_rows = (
        corpus.orderBy(F.col(id_col).asc())
        .limit(n_cells)
        .select(vec_col)
        .collect()
    )
    cents = np.asarray(
        [[float(x) for x in r[0]] for r in cents_rows], dtype=np.float64
    )
    cb_arr = np.asarray(
        pq_codebooks(corpus, n_sub, n_codes, vec_col, id_col),
        dtype=np.float64,
    )
    dim = cents.shape[1]
    dsub = dim // n_sub

    def _cell_d2(x: "np.ndarray") -> "np.ndarray":
        acc = np.zeros((x.shape[0], cents.shape[0]))
        for d in range(dim):
            diff = x[:, d : d + 1] - cents[:, d][None, :]
            acc = acc + diff * diff
        return acc

    def _sub_d2(x: "np.ndarray", s: int) -> "np.ndarray":
        sl = x[:, s * dsub : (s + 1) * dsub]
        acc = np.zeros((sl.shape[0], cb_arr.shape[1]))
        for d in range(dsub):
            diff = sl[:, d : d + 1] - cb_arr[s, :, d][None, :]
            acc = acc + diff * diff
        return acc

    def index(batches):
        for b in batches:
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            codes = np.empty((len(b), n_sub), dtype=np.int32)
            for s in range(n_sub):
                codes[:, s] = np.argmin(_sub_d2(x, s), axis=1)
            yield pd.DataFrame(
                {
                    "neighbor_id": b[id_col].to_numpy(),
                    "cell": np.argmin(_cell_d2(x), axis=1).astype(np.int32),
                    "_codes": list(codes),
                }
            )

    enc = spread(corpus).select(id_col, vec_col).mapInPandas(
        index, schema="neighbor_id long, cell int, _codes array<int>"
    )

    def probe(batches):
        for b in batches:
            x = np.stack(b[vec_col].to_numpy()).astype(np.float64)
            order = np.argsort(_cell_d2(x), axis=1, kind="stable")[:, :n_probe]
            luts = np.stack([_sub_d2(x, s) for s in range(n_sub)], axis=1)
            qid = b[id_col].to_numpy()
            rep = np.repeat(np.arange(len(b)), n_probe)
            yield pd.DataFrame(
                {
                    "query_id": qid[rep],
                    "cell": order.astype(np.int32).ravel(),
                    "_luts": [luts[i].tolist() for i in rep],
                }
            )

    q = spread(queries.select(id_col, vec_col)).mapInPandas(
        probe, schema="query_id long, cell int, _luts array<array<double>>"
    )

    dist = F.aggregate(
        F.zip_with(
            F.col("_codes"),
            F.col("_luts"),
            lambda c, l: F.element_at(l, c + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    scored = (
        enc.join(F.broadcast(q), on="cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id", dist.alias("adc_d2"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_d2").asc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("adc_d2", 6).alias("adc_d2"),
            "rank",
        )
    )


def ivfpq_topk_sql(
    table: str,
    query_pred: str,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    n_sub: int = 8,
    n_codes: int = 16,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """Full value oracle for :func:`ivfpq_topk`: the IVF assign/probe
    CTEs (same element-order L2 fold, lowest-cell tie-break) composed
    with the PQ codes/LUT CTEs, candidates restricted to probed cells."""
    dsub = dim // n_sub

    def l2(a_sl: str, b_sl: str) -> str:
        return (
            f"list_reduce(list_prepend(0.0, list_transform(list_zip({a_sl}, {b_sl}), "
            f"p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * "
            f"(CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), (x, y) -> x + y)"
        )

    def sl(expr: str, s: str) -> str:
        return f"list_slice({expr}, {s} * {dsub} + 1, ({s} + 1) * {dsub})"

    return f"""
WITH cents AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS cell, {vec_col} AS cvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {n_cells})),
cbvecs AS (
  SELECT ROW_NUMBER() OVER (ORDER BY {id_col}) - 1 AS c, {vec_col} AS bvec
  FROM (SELECT * FROM {table} ORDER BY {id_col} LIMIT {n_codes})),
subs AS (SELECT unnest(range({n_sub})) AS s),
cb AS (SELECT s, c, {sl('bvec', 's')} AS cent FROM cbvecs CROSS JOIN subs),
assign AS (
  SELECT {id_col}, cell FROM (
    SELECT e.{id_col}, c.cell,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}
                              ORDER BY {l2(f'e.{vec_col}', 'c.cvec')} ASC,
                                       c.cell ASC) AS rn
    FROM {table} e CROSS JOIN cents c) WHERE rn = 1),
codes AS (
  SELECT {id_col}, s, c AS code FROM (
    SELECT e.{id_col}, cb.s, cb.c,
           ROW_NUMBER() OVER (PARTITION BY e.{id_col}, cb.s
                              ORDER BY {l2(sl(f'e.{vec_col}', 'cb.s'), 'cb.cent')} ASC,
                                       cb.c ASC) AS rn
    FROM {table} e CROSS JOIN cb) WHERE rn = 1),
q AS (SELECT {id_col}, {vec_col} FROM {table}
      WHERE {query_pred.replace('__ID__', id_col)}),
probe AS (
  SELECT query_id, cell FROM (
    SELECT q.{id_col} AS query_id, c.cell,
           ROW_NUMBER() OVER (PARTITION BY q.{id_col}
                              ORDER BY {l2(f'q.{vec_col}', 'c.cvec')} ASC,
                                       c.cell ASC) AS rn
    FROM q CROSS JOIN cents c) WHERE rn <= {n_probe}),
luts AS (
  SELECT q.{id_col} AS query_id, cb.s, cb.c,
         {l2(sl(f'q.{vec_col}', 'cb.s'), 'cb.cent')} AS d2
  FROM q CROSS JOIN cb),
dists AS (
  SELECT l.query_id, e.{id_col} AS neighbor_id,
         list_reduce(list_prepend(0.0, list(l.d2 ORDER BY l.s)),
                     (x, y) -> x + y) AS adc_d2
  FROM codes e
  JOIN assign a ON a.{id_col} = e.{id_col}
  JOIN probe p ON p.cell = a.cell
  JOIN luts l ON l.query_id = p.query_id AND l.s = e.s AND l.c = e.code
  WHERE l.query_id <> e.{id_col}
  GROUP BY l.query_id, e.{id_col})
SELECT query_id, neighbor_id, round(adc_d2, 6) AS adc_d2, rank FROM (
  SELECT query_id, neighbor_id, adc_d2,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY adc_d2 ASC, neighbor_id ASC) AS rank
  FROM dists)
WHERE rank <= {k}
""".strip()
