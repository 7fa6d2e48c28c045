"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus pipeline needs REPRODUCIBLE sampling — `rand()` samples
differ run to run and engine to engine, which breaks lineage audits and
cross-engine verification. Everything here keys off a portable md5-derived
hash of the row id, so any engine (and any rerun) selects the identical
rows. No shuffles: sampling is a pure filter, evaluated at scan time.

Reference scope note: the reference engine (murat-boz/DynamicQueryEngine)
has no sampling surface at all (SURVEY.md §2.5); this module is
beyond-reference LLM-pipeline surface.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import Column, DataFrame, functions as F

# 2^32 — the hash fraction denominator (first 8 md5 hex chars)
_DENOM = 4294967296


def hash_fraction(id_col: Column) -> Column:
    """Uniform-in-[0,1) deterministic fraction per id: the first 8 hex chars
    of md5(id) as an integer over 2^32. `F.conv` parses hex JVM-side; the
    DuckDB mirror reproduces it with a digit fold (``_hex_fraction_sql``)."""
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10)
        .cast("long")
        / F.lit(_DENOM)
    )


def _hex_fraction_sql(id_expr: str) -> str:
    return (
        f"(list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(split(substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8), ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(a, d) -> a * 16 + d) / {_DENOM}.0)"
    )


def sample_uniform(
    df: DataFrame, fraction: float, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic ~``fraction`` sample: keep rows whose hash fraction is
    below the cut. Reproducible across runs, engines, and partitionings."""
    return df.filter(hash_fraction(F.col(id_col)) < F.lit(fraction))


def sample_stratified(
    df: DataFrame,
    fractions: Mapping[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the training-mix knob (e.g.
    downsample English, keep all low-resource languages). Pure filter; the
    per-stratum cut is a broadcast-free CASE over the stratum column."""
    cut = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        cut = F.when(F.col(stratum_col) == value, F.lit(float(frac))).otherwise(cut)
    return df.filter(hash_fraction(F.col(id_col)) < cut)


def sample_stratified_sql(
    table: str,
    fractions: Mapping[str, float],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> str:
    """DuckDB mirror of :func:`sample_stratified` (same hash, same cuts)."""
    whens = " ".join(
        f"WHEN {stratum_col} = '{v}' THEN {float(f)!r}"
        for v, f in sorted(fractions.items())
    )
    cut = f"(CASE {whens} ELSE {float(default_fraction)!r} END)"
    return (
        f"SELECT * FROM {table} "
        f"WHERE {_hex_fraction_sql(id_col)} < {cut}"
    )


def sample_token_budget(
    df: DataFrame,
    budget: int | Mapping[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    buckets: int = 64,
) -> DataFrame:
    """Exact token-budget mixture sampling: per stratum, take documents in
    deterministic hash order until the cumulative whitespace-token count
    reaches the stratum's budget — the final "mix to N tokens per source"
    step of a pretraining data recipe, reproducible across runs and engines.

    A document is kept iff the token total of all documents BEFORE it (in
    (hash_fraction, id) order within its stratum) is `< budget` — so the
    budget-crossing document is included and every selection is a prefix.

    Scale shape: the naive formulation is one window per stratum — which
    puts an ENTIRE stratum in a single task. Instead, a two-level prefix
    sum: documents land in ``buckets`` hash-range buckets; per-(stratum,
    bucket) token sums (tiny: strata × buckets rows) get a running total on
    the aggregated table; buckets wholly under budget are taken with a
    pure filter (no sort anywhere), buckets wholly past it are dropped,
    and only the ONE boundary bucket per stratum — ~1/buckets of the
    stratum — pays an exact windowed cumsum. Output values are identical
    to the naive window (the bucket order refines the hash order), which
    is exactly what the SQL oracle runs.

    Returns (id, stratum, tok_ws, cum_before) for every kept document.
    """
    from pyspark.sql.window import Window

    from .text import token_count_ws

    if isinstance(budget, Mapping):
        b = F.lit(None).cast("long")
        for value, amount in sorted(budget.items()):
            b = F.when(F.col(stratum_col) == value, F.lit(int(amount))).otherwise(b)
    else:
        b = F.lit(int(budget))

    base = df.select(
        F.col(id_col),
        F.col(stratum_col),
        token_count_ws(F.col(text_col)).cast("long").alias("tok_ws"),
        hash_fraction(F.col(id_col)).alias("_frac"),
    ).withColumn("_bkt", F.floor(F.col("_frac") * buckets).cast("int"))

    bstats = base.groupBy(stratum_col, "_bkt").agg(F.sum("tok_ws").alias("_bsum"))
    wb = (
        Window.partitionBy(stratum_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bstats = bstats.withColumn(
        "_bstart", F.coalesce(F.sum("_bsum").over(wb), F.lit(0))
    )

    tagged = base.join(F.broadcast(bstats), [stratum_col, "_bkt"])
    take_all = tagged.filter(F.col("_bstart") + F.col("_bsum") < b).select(
        id_col,
        stratum_col,
        "tok_ws",
        F.col("_bstart").alias("_pre_base"),
        F.lit(None).cast("long").alias("_prefix"),
        "_frac",
        "_bkt",
    )
    boundary = tagged.filter(
        (F.col("_bstart") < b) & (F.col("_bstart") + F.col("_bsum") >= b)
    )
    wd = (
        Window.partitionBy(stratum_col, "_bkt")
        .orderBy(F.col("_frac").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    boundary_kept = (
        boundary.withColumn("_prefix", F.coalesce(F.sum("tok_ws").over(wd), F.lit(0)))
        .filter(F.col("_bstart") + F.col("_prefix") < b)
        .select(
            id_col,
            stratum_col,
            "tok_ws",
            F.col("_bstart").alias("_pre_base"),
            "_prefix",
            "_frac",
            "_bkt",
        )
    )
    kept = take_all.unionByName(boundary_kept)
    # cum_before for take-all rows still needs the exact within-bucket
    # prefix; compute it over the KEPT set only (take-all buckets are kept
    # in full, so the kept-set prefix equals the full prefix there)
    wk = (
        Window.partitionBy(stratum_col, "_bkt")
        .orderBy(F.col("_frac").asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        kept.withColumn(
            "cum_before",
            F.col("_pre_base")
            + F.coalesce(F.col("_prefix"), F.coalesce(F.sum("tok_ws").over(wk), F.lit(0))),
        )
        .select(id_col, stratum_col, "tok_ws", "cum_before")
    )


def sample_token_budget_sql(
    table: str,
    budget: int | Mapping[str, int],
    stratum_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB mirror of :func:`sample_token_budget` — the naive one-window
    formulation (prefix in (hash, id) order per stratum), which the bucketed
    Spark plan reproduces value-for-value."""
    from .text import token_count_ws_sql

    if isinstance(budget, Mapping):
        whens = " ".join(
            f"WHEN {stratum_col} = '{v}' THEN {int(a)}"
            for v, a in sorted(budget.items())
        )
        b = f"(CASE {whens} END)"
    else:
        b = str(int(budget))
    return f"""
WITH base AS (
  SELECT {id_col}, {stratum_col},
         CAST({token_count_ws_sql(text_col)} AS BIGINT) AS tok_ws,
         {_hex_fraction_sql(id_col)} AS frac
  FROM {table}
),
cum AS (
  SELECT *, CAST(COALESCE(SUM(tok_ws) OVER (
      PARTITION BY {stratum_col} ORDER BY frac ASC, {id_col} ASC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
  FROM base
)
SELECT {id_col}, {stratum_col}, tok_ws, cum_before
FROM cum WHERE cum_before < {b}
""".strip()


def sample_temperature(
    df: DataFrame,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature (α = 0.5) resampling — the multilingual balancing rule
    (mBERT / XLM-R exponential smoothing): group g with c_g rows is kept at
    rate (c_g)^(α-1) normalized so the SMALLEST group keeps everything,
    i.e. rate_g = sqrt(c_min / c_g). Big groups are squashed toward the
    small ones without upsampling.

    α is pinned to 0.5 so the rate is a single correctly-rounded IEEE
    ``sqrt(division)`` — bit-identical across engines, which makes the
    sampled row set exactly oracle-checkable (generic ``pow`` is not
    correctly rounded and may disagree in the last ulp right at a hash
    cut). One count-aggregate over the stratum column produces a
    groups-sized rate table that is broadcast back; the corpus itself is
    filtered at scan time, never shuffled."""
    counts = df.groupBy(stratum_col).agg(F.count(F.lit(1)).alias("_c"))
    cmin = counts.agg(F.min("_c").alias("_cmin"))
    rates = counts.crossJoin(F.broadcast(cmin)).select(
        stratum_col,
        F.sqrt(F.col("_cmin").cast("double") / F.col("_c")).alias("_rate"),
    )
    return (
        df.join(F.broadcast(rates), stratum_col)
        .filter(hash_fraction(F.col(id_col)) < F.col("_rate"))
        .drop("_rate")
    )


def sample_temperature_sql(
    table: str,
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    columns: str = "*",
) -> str:
    """DuckDB mirror of :func:`sample_temperature` (same hash, same sqrt)."""
    return f"""
WITH counts AS (
  SELECT {stratum_col}, count(*) AS c FROM {table} GROUP BY {stratum_col}
),
rates AS (
  SELECT {stratum_col},
         sqrt(CAST((SELECT min(c) FROM counts) AS DOUBLE) / c) AS rate
  FROM counts
)
SELECT {columns} FROM {table} t JOIN rates USING ({stratum_col})
WHERE {_hex_fraction_sql("t." + id_col)} < rates.rate
""".strip()


def epoch_order(
    df: DataFrame, seed: int, id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic EPOCH SHUFFLE (r14): a reproducible global
    permutation of the corpus keyed by ``md5('<seed>:' || id)`` —
    epoch N of a training run reads the same order on every engine,
    every rerun, and every cluster size, and different seeds give
    decorrelated orders (the property data-order-sensitive training
    needs; shuffling per epoch without a materialized permutation
    table).

    Scale shape: ORDER BY a computed hash is Spark's range-partitioned
    sort — the exchange SAMPLES the key space, so output partitions
    balance regardless of the corpus's own key skew; no window
    function, no per-stratum single task, no driver state. Writing the
    ordered frame gives the epoch's shard files directly; a ``LIMIT``
    on top plans as TakeOrdered (no full sort materialized). Returns
    ``df`` plus ``epoch_key``, ordered by ``(epoch_key, id)``."""
    key = F.md5(
        F.concat(
            F.lit(f"{int(seed)}:"), F.col(id_col).cast("string")
        )
    )
    return df.withColumn("epoch_key", key).orderBy(
        "epoch_key", id_col
    )


def epoch_order_sql(seed: int, id_expr: str = "doc_id") -> str:
    """DuckDB mirror of :func:`epoch_order`'s key (same md5 string)."""
    return f"md5(concat('{int(seed)}:', CAST({id_expr} AS VARCHAR)))"


def split_leakage_safe(
    docs: DataFrame,
    pairs: DataFrame,
    test_fraction: float,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """LEAKAGE-SAFE train/test split: assign whole NEAR-DUP CLUSTERS to
    one side, never individual documents — a per-document random split
    puts one copy of a near-duplicated document in train and another in
    test, which silently inflates eval scores (the classic
    contamination failure a 100 TB pretraining pipeline must prevent).

    Mechanism: transitive near-dup clusters (connected components over
    ``pairs``; singletons are their own cluster) pick a side by the
    deterministic :func:`hash_fraction` of their EXEMPLAR id — so (a)
    every member of a cluster lands on the same side by construction,
    (b) the split is reproducible across runs, engines, and corpus
    repartitionings, and (c) the achieved test share approaches
    ``test_fraction`` in cluster-count, not row-count, terms (large
    clusters move in blocks; that is inherent to any leakage-safe
    split). Returns ``docs``' id column plus ``cluster_id``,
    ``cluster_size``, ``split`` ∈ {'train','test'}.

    Scale: one components computation (pointer-jumping above the driver
    gate — see functions/cluster.py), one key join to attach cluster
    ids, and a scan-time hash filter; the corpus itself never shuffles
    beyond the attach join."""
    from .cluster import cluster_assign

    assign = cluster_assign(docs, pairs, id_col, id_a, id_b)
    return assign.withColumn(
        "split",
        F.when(
            hash_fraction(F.col("cluster_id")) < F.lit(test_fraction),
            F.lit("test"),
        ).otherwise(F.lit("train")),
    )


def split_leakage_safe_sql(
    pairs_sql: str,
    test_fraction: float,
    docs_table: str = "documents",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`split_leakage_safe` (same recursive
    components as cluster_assign_sql, same md5 hash fraction)."""
    from .cluster import cluster_assign_sql

    inner = cluster_assign_sql(pairs_sql, docs_table, id_col)
    return f"""
SELECT a.*,
       CASE WHEN {_hex_fraction_sql("a.cluster_id")} < {test_fraction}
            THEN 'test' ELSE 'train' END AS split
FROM ({inner}) a
""".strip()
