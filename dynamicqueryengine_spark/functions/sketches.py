"""Deterministic distinct-count sketching: KMV (k-minimum-values).

At 100 TB, ``countDistinct`` on a high-cardinality key is a full shuffle
of every distinct value; a KMV sketch shrinks per-group state to the k
smallest hash values — mergeable, bounded, and (unlike HyperLogLog's
engine-specific registers) EXACTLY reproducible in any engine that has
md5, so the whole sketch is value-oracle-checkable in DuckDB.

Estimator: with h(x) = first 60 bits of md5(x) mapped onto [0, 2⁶⁰), the
k-th smallest of n distinct uniform hashes sits near k/n of the range, so
``n̂ = (k-1) · 2⁶⁰ / h_(k)`` (the classic unbiased KMV estimate; groups
with fewer than k distinct values are exact by construction). Standard
error ≈ 1/√(k−2).

60 bits, not 64: the value must survive a signed BIGINT in both engines
and DuckDB's hex fold (15 nibbles < 2⁶⁰ < 2⁶³).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from .dedup import _hex_int_sql

__all__ = ["kmv_distinct", "kmv_distinct_sql", "kmv_hash"]

_RANGE = float(2**60)


def kmv_hash(col: Column) -> Column:
    """Portable 60-bit uniform hash: first 15 hex chars of md5(string)."""
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> DataFrame:
    """Per-group distinct-count estimate from a k-minimum-values sketch.

    Output: group columns + ``n_kept`` (retained hashes, ≤ k), ``kth_hash``
    (the largest retained hash), ``est_distinct`` (the KMV estimate —
    exact when the group has < k distinct keys).

    Plan: distinct (group, hash) → per-group bottom-k via rank window →
    single aggregate. The window sorts only distinct hashes and the
    retained state is k rows per group — the same two-shuffle shape at any
    scale, with no unbounded collect_set.
    """
    h = kmv_hash(F.col(key_col)).alias("__h")
    hashed = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy("__h")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    est = F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_RANGE) / F.col("kth_hash"))
    return (
        topk.groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("__h").alias("kth_hash"),
        )
        .withColumn("est_distinct", F.round(est, 4))
    )


def kmv_distinct_sql(
    table: str,
    key_col: str,
    group_cols: list[str],
    k: int = 64,
) -> str:
    """DuckDB mirror of :func:`kmv_distinct` — same md5-derived hash, same
    bottom-k, same estimator arithmetic."""
    groups = ", ".join(group_cols)
    h = _hex_int_sql(f"substr(md5(CAST({key_col} AS VARCHAR)), 1, 15)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {groups}, {h} AS h FROM {table}
),
topk AS (
  SELECT * FROM hashed
  QUALIFY row_number() OVER (PARTITION BY {groups} ORDER BY h) <= {k}
),
sk AS (
  SELECT {groups}, count(*) AS n_kept, max(h) AS kth_hash
  FROM topk GROUP BY {groups}
)
SELECT {groups}, n_kept, kth_hash,
       round(CASE WHEN n_kept < {k} THEN CAST(n_kept AS DOUBLE)
             ELSE {float(k - 1)} * {_RANGE} / kth_hash END, 4) AS est_distinct
FROM sk
""".strip()


def kmv_set_estimates(
    df: DataFrame,
    key_col: str,
    group_col: str,
    k: int = 64,
) -> DataFrame:
    """KMV set ALGEBRA between every unordered pair of groups:
    (group_a, group_b, union_est, inter_est, union_exact, inter_exact).

    Mergeability is the property that makes sketches a scale primitive:
    the union sketch of two groups is just the bottom-k of their merged
    hash sets (array ops on two k-length arrays — no data revisit), and
    the intersection follows from the Jaccard estimator ρ = |L ∩ Aₖ ∩
    Bₖ|/|L| over the union's bottom-k L (Beyer et al., SIGMOD'07). The
    exact pair counts ride alongside (the verification baseline, exactly
    like sketch_kmv_distinct) so estimate quality is part of the checked
    result.

    Plan shape: one distinct + rank pass builds the ≤k-row sketch per
    group; the pairing is a |groups|² self-join of k-length arrays —
    driver-free, bounded by the group count, with the full key stream
    never revisited. The exact baseline is the only corpus-sized join.
    """
    h = kmv_hash(F.col(key_col)).alias("__h")
    hashed = df.select(F.col(group_col), h).distinct()
    w = Window.partitionBy(group_col).orderBy("__h")
    sk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .groupBy(group_col)
        .agg(F.sort_array(F.collect_list("__h")).alias("karr"))
    )
    a = sk.select(
        F.col(group_col).alias("group_a"), F.col("karr").alias("ka")
    )
    b = sk.select(
        F.col(group_col).alias("group_b"), F.col("karr").alias("kb")
    )
    pairs = a.crossJoin(b).filter(F.col("group_a") < F.col("group_b"))
    u = F.array_sort(F.array_distinct(F.concat("ka", "kb")))
    pairs = pairs.withColumn(
        "_u", F.slice(u, 1, F.least(F.size(u), F.lit(k)))
    )
    n_u = F.size("_u")
    kth = F.element_at("_u", n_u)
    union_est = F.when(
        n_u < k, n_u.cast("double")
    ).otherwise(F.lit(float(k - 1)) * F.lit(_RANGE) / kth)
    rho = F.size(
        F.array_intersect("_u", F.array_intersect("ka", "kb"))
    ).cast("double")
    est = pairs.select(
        "group_a",
        "group_b",
        F.round(union_est, 4).alias("union_est"),
        # Jaccard denominator is |L| (= k for saturated sketches, the
        # full union for small ones — where the estimate is then exact)
        F.round(rho * union_est / n_u.cast("double"), 4).alias("inter_est"),
    )
    # exact verification baseline
    keys = df.select(F.col(group_col), F.col(key_col).alias("__k")).distinct()
    ksizes = keys.groupBy(group_col).agg(F.count(F.lit(1)).alias("nd"))
    ta = keys.select(F.col(group_col).alias("group_a"), "__k")
    tb = keys.select(F.col(group_col).alias("group_b"), "__k")
    inter = (
        ta.join(tb, "__k")
        .filter(F.col("group_a") < F.col("group_b"))
        .groupBy("group_a", "group_b")
        .agg(F.count(F.lit(1)).alias("inter_exact"))
    )
    na = ksizes.select(F.col(group_col).alias("group_a"), F.col("nd").alias("na"))
    nb = ksizes.select(F.col(group_col).alias("group_b"), F.col("nd").alias("nb"))
    out = (
        est.join(inter, ["group_a", "group_b"], "left")
        .join(F.broadcast(na), "group_a")
        .join(F.broadcast(nb), "group_b")
        .select(
            "group_a",
            "group_b",
            "union_est",
            "inter_est",
            (
                F.col("na") + F.col("nb")
                - F.coalesce("inter_exact", F.lit(0))
            ).alias("union_exact"),
            F.coalesce("inter_exact", F.lit(0)).alias("inter_exact"),
        )
    )
    return out


def kmv_set_estimates_sql(
    table: str, key_col: str, group_col: str, k: int = 64
) -> str:
    """DuckDB mirror of :func:`kmv_set_estimates` — same md5 hashes, same
    bottom-k arrays, same estimator arithmetic."""
    h = _hex_int_sql(f"substr(md5(CAST({key_col} AS VARCHAR)), 1, 15)")
    return f"""
WITH hashed AS (
  SELECT DISTINCT {group_col} AS g, {h} AS h FROM {table}
),
topk AS (
  SELECT * FROM hashed
  QUALIFY row_number() OVER (PARTITION BY g ORDER BY h) <= {k}
),
sk AS (
  SELECT g, list_sort(list(h)) AS karr FROM topk GROUP BY g
),
p AS (
  SELECT a.g AS group_a, b.g AS group_b, a.karr AS ka, b.karr AS kb
  FROM sk a JOIN sk b ON a.g < b.g
),
uu AS (
  SELECT group_a, group_b, ka, kb,
         (list_sort(list_distinct(ka || kb)))[
           1:least(len(list_distinct(ka || kb)), {k})] AS u
  FROM p
),
est AS (
  SELECT group_a, group_b,
         round(CASE WHEN len(u) < {k} THEN CAST(len(u) AS DOUBLE)
               ELSE {float(k - 1)} * {_RANGE} / u[len(u)] END, 4)
           AS union_est,
         round(CAST(len(list_intersect(u, list_intersect(ka, kb)))
                    AS DOUBLE)
               * (CASE WHEN len(u) < {k} THEN CAST(len(u) AS DOUBLE)
                  ELSE {float(k - 1)} * {_RANGE} / u[len(u)] END)
               / CAST(len(u) AS DOUBLE), 4) AS inter_est
  FROM uu
),
keys AS (SELECT DISTINCT {group_col} AS g, {key_col} AS kk FROM {table}),
ksz AS (SELECT g, count(*) AS nd FROM keys GROUP BY g),
inter AS (
  SELECT a.g AS group_a, b.g AS group_b, count(*) AS inter_exact
  FROM keys a JOIN keys b ON a.kk = b.kk AND a.g < b.g
  GROUP BY 1, 2
)
SELECT est.group_a, est.group_b, union_est, inter_est,
       na.nd + nb.nd - coalesce(inter_exact, 0) AS union_exact,
       coalesce(inter_exact, 0) AS inter_exact
FROM est
LEFT JOIN inter ON inter.group_a = est.group_a
               AND inter.group_b = est.group_b
JOIN ksz na ON na.g = est.group_a
JOIN ksz nb ON nb.g = est.group_b
""".strip()
