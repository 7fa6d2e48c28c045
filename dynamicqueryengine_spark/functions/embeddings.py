"""Embedding-vector utilities: int8 scalar quantization (the storage/ANN
compression step of a training-data pipeline — 4× smaller than float32,
enough resolution for recall-heavy candidate generation).

Pure Column expressions over ``array<float>`` (transform / array_max /
aggregate) — JVM-side, no UDFs, linear per row, embarrassingly parallel;
and arithmetically portable: float→double widening is exact, the per-
vector scale and ``floor(x·scale + 0.5)`` rounding reproduce bit-for-bit
in DuckDB's list lambdas, so the full quantized vector is value-oracle-
checkable (no approximate-compare escape hatch needed).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "quantize_int8",
    "quantize_int8_long",
    "quantize_int8_sql",
    "quantize_int8_long_sql",
    "group_centroids",
    "group_centroids_sql",
]


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = floor(x_i·scale + 0.5) ∈ [-127, 127]. All-zero vectors get
    scale 0 and an all-zero code. Output: (id, scale (6dp), qvec,
    q_l1 = Σ|q_i| — an exact-integer checksum of the code)."""
    # Two structural tricks keep this linear-per-row. (1) Lambda-variable
    # LET-BINDING: naming the casted vector and its max-|x| as lambda vars
    # of single-element transforms binds each ONCE per row — written as
    # plain named Columns, CollapseProject inlines the scale fold into the
    # per-element qvec lambda and the row cost explodes from O(dim) to
    # O(dim²) (measured 6× wall on the 64-dim table, worse as dim grows).
    # (2) inline_outer as a PROJECTION BARRIER: a Generate's input is
    # evaluated exactly once per row and its outputs are plain attributes,
    # so downstream projections (q_l1, the long-form posexplode) reference
    # qvec instead of re-deriving it (the _outer variant also skips the
    # emptiness Filter, which would re-evaluate the struct a second time).
    def scale_of(m: F.Column) -> F.Column:
        return F.when(m == 0.0, F.lit(0.0)).otherwise(F.lit(127.0) / m)

    packed = F.transform(
        F.array(F.transform(F.col(vec_col), lambda x: x.cast("double"))),
        lambda v: F.transform(
            F.array(F.array_max(F.transform(v, F.abs))),
            lambda m: F.struct(
                scale_of(m).alias("_scale_raw"),
                F.transform(
                    v,
                    lambda x: F.floor(x * scale_of(m) + F.lit(0.5)).cast("int"),
                ).alias("qvec"),
            ),
        )[0],
    )
    return (
        df.select(F.col(id_col), F.inline_outer(packed))
        .select(
            id_col,
            F.round(F.col("_scale_raw"), 6).alias("scale"),
            "qvec",
        )
        .withColumn(
            "q_l1",
            F.aggregate(
                F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
            ),
        )
    )


def quantize_int8_long(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Driver-contract projection of :func:`quantize_int8`: the quantized
    code posexploded to long form (id, scale, dim (1-based), q, q_l1) —
    every element value-checked, no top-level array column. (The r2 driver
    canonicalizes result rows through pandas ``factorize``, which cannot
    hash list cells; a top-level ``array<int>`` column aborts the whole
    comparison. Long form is also the stronger oracle: a wrong element
    flips its own row's hash rather than hiding inside an opaque array.)"""
    q = quantize_int8(df, vec_col=vec_col, id_col=id_col)
    return q.select(
        id_col,
        "scale",
        F.posexplode("qvec").alias("_p", "q"),
        "q_l1",
    ).select(
        id_col,
        "scale",
        (F.col("_p") + 1).alias("dim"),
        "q",
        "q_l1",
    )


def quantize_int8_sql(
    table: str, vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    """DuckDB mirror of :func:`quantize_int8` — identical IEEE double
    arithmetic via list lambdas (list_reduce has no init → seed prepended;
    fold accumulates in BIGINT to dodge INT32 overflow)."""
    return f"""
WITH v AS (
  SELECT {id_col},
         list_transform({vec_col}, x -> CAST(x AS DOUBLE)) AS v
  FROM {table}
),
s AS (
  SELECT {id_col}, v,
         CASE WHEN list_max(list_transform(v, x -> abs(x))) = 0 THEN 0.0
              ELSE 127.0 / list_max(list_transform(v, x -> abs(x))) END
           AS scale
  FROM v
),
q AS (
  SELECT {id_col}, round(scale, 6) AS scale,
         list_transform(v, x -> CAST(floor(x * scale + 0.5) AS INTEGER))
           AS qvec
  FROM s
)
SELECT {id_col}, scale, qvec,
       list_reduce(
         list_prepend(CAST(0 AS BIGINT),
                      list_transform(qvec, x -> CAST(abs(x) AS BIGINT))),
         (a, b) -> a + b) AS q_l1
FROM q
""".strip()


def quantize_int8_long_sql(
    table: str, vec_col: str = "embedding", id_col: str = "vec_id"
) -> str:
    """DuckDB mirror of :func:`quantize_int8_long` — the array mirror
    unnested with parallel ordinals (same pattern as group_centroids_sql)."""
    return f"""
WITH wide AS ({quantize_int8_sql(table, vec_col=vec_col, id_col=id_col)})
SELECT {id_col}, scale,
       CAST(unnest(range(1, len(qvec) + 1)) AS INT) AS dim,
       unnest(qvec) AS q,
       q_l1
FROM wide
""".strip()


def group_centroids(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-group mean vector in long form: (group, dim (1-based), centroid,
    n) — the cluster-center primitive behind IVF coarse quantizers, label
    prototypes, and domain drift monitors.

    Summing doubles across a shuffle is order-dependent, so the per-
    dimension sum is done in DECIMAL(38,12) (exact, commutative —
    the events_sessionize parity pattern) and converted to double only
    for the final single division. posexplode → partial-agg groupBy:
    the shuffle carries (group × dim) partial sums, not vectors, so
    reducer state is bounded by |groups|·dims regardless of corpus
    size."""
    exploded = df.select(
        F.col(group_col),
        F.posexplode(F.col(vec_col)).alias("_p", "_v"),
    ).select(
        group_col,
        (F.col("_p") + 1).alias("dim"),
        F.col("_v").cast("double").cast("decimal(38,12)").alias("_vd"),
    )
    return (
        exploded.groupBy(group_col, "dim")
        .agg(
            F.sum("_vd").alias("_s"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            group_col,
            "dim",
            (F.col("_s").cast("double") / F.col("n")).alias("centroid"),
            "n",
        )
    )


def group_centroids_sql(
    table: str, group_col: str = "label", vec_col: str = "embedding"
) -> str:
    """DuckDB mirror of :func:`group_centroids` — parallel unnests align
    element and ordinal; identical decimal-exact sum then one double
    division."""
    return f"""
WITH exploded AS (
  SELECT {group_col},
         unnest(range(1, len({vec_col}) + 1)) AS dim,
         CAST(CAST(unnest({vec_col}) AS DOUBLE) AS DECIMAL(38,12)) AS vd
  FROM {table}
)
SELECT {group_col}, CAST(dim AS INT) AS dim,
       CAST(sum(vd) AS DOUBLE) / count(*) AS centroid,
       count(*) AS n
FROM exploded GROUP BY {group_col}, dim
""".strip()


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Johnson-Lindenstrauss dimensionality reduction: y_j = x · r_j over
    ``out_dim`` seeded Gaussian directions — the standard cheap step
    BEFORE sketch/ANN indexing when the raw embedding is wider than the
    search needs (distances are preserved within (1±ε) at out_dim =
    O(ln n / ε²); the hyperplane-LSH buckets in similarity.py are exactly
    the SIGNS of such projections).

    Output: (id, rp — array<double> length out_dim, rp_norm (6dp)).

    Scale shape: map-only Column pass, one strict left-to-right fold per
    output dim (out_dim × in_dim mul-adds per row), no shuffle, no UDF.
    The projection matrix is seeded-deterministic and baked into BOTH
    plans as literals, so results are bit-exact against the mirror."""
    from .dedup import _dot
    from .similarity import hyperplanes

    planes = hyperplanes(in_dim, out_dim, seed)
    rp = F.array(
        *[
            _dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in p]))
            for p in planes
        ]
    )
    return (
        df.select(F.col(id_col), F.inline_outer(F.array(F.struct(rp.alias("rp")))))
        .withColumn(
            "rp_norm",
            F.round(
                F.sqrt(
                    F.aggregate(
                        F.col("rp"), F.lit(0.0), lambda a, v: a + v * v
                    )
                ),
                6,
            ),
        )
        .select(id_col, F.posexplode("rp").alias("_p", "y"), "rp_norm")
        .select(
            id_col,
            (F.col("_p") + 1).alias("dim"),
            F.round(F.col("y"), 6).alias("y"),
            "rp_norm",
        )
    )


def random_projection_sql(
    table: str,
    out_dim: int = 16,
    in_dim: int = 64,
    seed: int = 42,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror — identical plane literals (repr round-trips doubles
    exactly), identical fold order, long form via parallel unnest."""
    from .dedup import _dot_sql
    from .similarity import _plane_literal_sql, hyperplanes

    planes = hyperplanes(in_dim, out_dim, seed)
    rp_items = ", ".join(
        _dot_sql(vec_col, _plane_literal_sql(p)) for p in planes
    )
    return f"""
WITH proj AS (
  SELECT {id_col}, [{rp_items}] AS rp FROM {table}
),
normed AS (
  SELECT {id_col}, rp,
         round(sqrt(list_reduce(list_prepend(0.0,
             list_transform(rp, v -> v * v)), (a, b) -> a + b)), 6) AS rp_norm
  FROM proj
)
SELECT {id_col},
       CAST(unnest(range(1, {out_dim} + 1)) AS INT) AS dim,
       round(unnest(rp), 6) AS y,
       rp_norm
FROM normed
""".strip()


def centroid_confusion(
    df: DataFrame,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Label-vs-nearest-centroid confusion counts: assign every vector to
    its nearest label centroid (squared L2, ties → smallest label) and
    report (label, nearest_label, n) — the standard "are my labels
    separable in embedding space" diagnostic before training a
    classifier on them.

    Plan shape: centroids are |labels|·dims rows (decimal-exact means,
    :func:`group_centroids`) broadcast onto the exploded vector stream;
    distances aggregate per (vec, candidate label) with DECIMAL(38,12)
    sums — bit-exact, so the argmin (min over (d², label) structs — the
    rule engine's single-pass argmin shape, no per-vec sort) matches the
    oracle's ROW_NUMBER formulation exactly. The confusion matrix is a
    final |labels|²-bounded aggregation."""
    cents = group_centroids(df, group_col, vec_col).select(
        F.col(group_col).alias("_clabel"), "dim", "centroid"
    )
    exploded = df.select(
        id_col,
        group_col,
        F.posexplode(F.col(vec_col)).alias("_p", "_v"),
    ).select(
        id_col,
        group_col,
        (F.col("_p") + 1).alias("dim"),
        F.col("_v").cast("double").alias("_v"),
    )
    diff = F.col("_v") - F.col("centroid")
    d2 = (
        exploded.join(F.broadcast(cents), "dim")
        .select(
            id_col,
            group_col,
            "_clabel",
            (diff * diff).cast("decimal(38,12)").alias("_sq"),
        )
        .groupBy(id_col, group_col, "_clabel")
        .agg(F.sum("_sq").cast("double").alias("_d2"))
    )
    nearest = (
        d2.groupBy(id_col, group_col)
        .agg(F.min(F.struct("_d2", "_clabel")).alias("_m"))
        .select(id_col, group_col, F.col("_m._clabel").alias("nearest_label"))
    )
    return (
        nearest.groupBy(group_col, "nearest_label")
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "is_match", F.col(group_col) == F.col("nearest_label")
        )
    )


def centroid_confusion_sql(
    table: str,
    group_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    """DuckDB mirror of :func:`centroid_confusion` — same decimal-exact
    centroids and distance sums, ROW_NUMBER argmin with the same
    (d², label) tie order."""
    cents = group_centroids_sql(table, group_col, vec_col)
    return f"""
WITH cents AS ({cents}),
exploded AS (
  SELECT {id_col}, {group_col},
         unnest(range(1, len({vec_col}) + 1)) AS dim,
         CAST(unnest({vec_col}) AS DOUBLE) AS v
  FROM {table}
),
d2 AS (
  SELECT e.{id_col}, e.{group_col} AS lbl, c.{group_col} AS clabel,
         CAST(sum(CAST((e.v - c.centroid) * (e.v - c.centroid)
                       AS DECIMAL(38,12))) AS DOUBLE) AS d2
  FROM exploded e JOIN cents c ON c.dim = e.dim
  GROUP BY 1, 2, 3
),
near AS (
  SELECT {id_col}, lbl, clabel FROM d2
  QUALIFY row_number() OVER (
    PARTITION BY {id_col} ORDER BY d2, clabel) = 1
)
SELECT lbl AS {group_col}, clabel AS nearest_label,
       count(*) AS n,
       lbl = clabel AS is_match
FROM near GROUP BY 1, 2
""".strip()
