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

__all__ = ["quantize_int8", "quantize_int8_sql"]


def quantize_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = 127 / max|x|,
    q_i = floor(x_i·scale + 0.5) ∈ [-127, 127]. All-zero vectors get
    scale 0 and an all-zero code. Output: (id, scale (6dp), qvec,
    q_l1 = Σ|q_i| — an exact-integer checksum of the code)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    maxabs = F.array_max(F.transform(v, F.abs))
    scale = F.when(maxabs == 0.0, F.lit(0.0)).otherwise(F.lit(127.0) / maxabs)
    qvec = F.transform(v, lambda x: F.floor(x * scale + F.lit(0.5)).cast("int"))
    q_l1 = F.aggregate(
        F.col("qvec"), F.lit(0).cast("long"), lambda a, x: a + F.abs(x)
    )
    return (
        df.select(
            id_col,
            F.round(scale, 6).alias("scale"),
            qvec.alias("qvec"),
        )
        .withColumn("q_l1", q_l1)
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
