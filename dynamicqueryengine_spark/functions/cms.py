"""Count-min sketch — bounded-memory frequency estimation (Cormode &
Muthukrishnan 2005), the streaming/heavy-hitter companion to the KMV
distinct sketch (sketches.py). An LLM-data pipeline uses it to ask "how
often does this token / URL / domain appear?" over a corpus whose exact
vocabulary table would itself be huge, with a fixed depth×width counter
array and a one-sided error guarantee (estimate ≥ truth; overshoot ≤
2·N/width with probability 1−2^−depth).

Scale shape (100 TB): the sketch build is ONE aggregation whose post-
shuffle state is exactly ``depth × width`` rows regardless of corpus size
— map-side partial counts do the heavy lifting, the same shape as a
groupBy count but with a BOUNDED key space. Point queries then probe
``depth`` rows per item (broadcast join against the tiny sketch table).
Hashes are the md5-derived portable form shared with KMV/simhash, so the
whole sketch — not just its estimates — is value-oracle-checkable in
DuckDB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from ..util import spread
from .sketches import kmv_hash
from .text import _WS

__all__ = [
    "cms_build",
    "cms_topk_estimates",
    "cms_topk_estimates_sql",
]


def _slot(col: Column, j: int, width: int) -> Column:
    """Deterministic row-j counter index: md5-hash of (j, value) mod width."""
    return F.pmod(
        kmv_hash(F.concat_ws("|", F.lit(str(j)), col.cast("string"))),
        F.lit(int(width)),
    ).cast("int")


def _words(df: DataFrame, text_col: str) -> DataFrame:
    """Lowercased whitespace-split token stream — the same normal form as
    the quality/lang-id token features (text._WS), one codegen explode."""
    return (
        spread(df)
        .select(
            F.explode(
                F.split(F.trim(F.lower(F.col(text_col))), _WS)
            ).alias("w")
        )
        .filter(F.col("w") != "")
    )


def cms_build(
    items: DataFrame,
    item_col: str = "w",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """(row, slot, cnt) counter table of the sketch — ``depth × width``
    rows at most, one shuffle with map-side combine."""
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(j).alias("row"),
                    _slot(F.col(item_col), j, width).alias("slot"),
                )
                for j in range(depth)
            ]
        )
    ).alias("rs")
    # works unchanged on a STREAMING input (bounded key space → bounded
    # streaming-aggregation state); spread()'s partition probe touches
    # .rdd, which streams forbid, so it applies to batch inputs only
    if not items.isStreaming:
        items = spread(items)
    return (
        items.select(rows)
        .select(F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
        .groupBy("row", "slot")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_topk_estimates(
    df: DataFrame,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> DataFrame:
    """Build a CMS over the corpus word stream, then report the exact
    top-``k`` words alongside their sketch estimates:
    (word, exact_count, cms_est), ordered deterministically (count desc,
    word asc). ``cms_est ≥ exact_count`` always — the one-sided guarantee
    the tests assert. The exact side exists to VERIFY the sketch; the
    production use is point-querying the bounded counter table directly."""
    # One pass over the raw word stream: aggregate to exact per-word counts,
    # then derive the sketch as a WEIGHTED sum over the (vocab-sized)
    # count table — each word w with count c adds c to slot(w, j) for every
    # row j, which is exactly cms_build's per-occurrence count, reassociated.
    # The count table is persisted and materialized HERE (persist + count,
    # not the r3 eager-unpersist that dropped the cache before the returned
    # lazy frame ever ran) so the sketch and top-k branches share one corpus
    # scan; Spark 4.1 does not reuse the exchange between the two branches
    # on its own (verified empirically), hence the explicit cache.
    words = _words(df, text_col)
    exact = (
        words.groupBy("w").agg(F.count(F.lit(1)).alias("exact_count")).persist()
    )
    exact.count()
    sketch = (
        exact.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(j).alias("row"),
                            _slot(F.col("w"), j, width).alias("slot"),
                        )
                        for j in range(depth)
                    ]
                )
            ).alias("rs"),
            "exact_count",
        )
        .select(
            F.col("rs.row").alias("row"),
            F.col("rs.slot").alias("slot"),
            "exact_count",
        )
        .groupBy("row", "slot")
        .agg(F.sum("exact_count").alias("cnt"))
    )
    top = (
        exact.orderBy(F.col("exact_count").desc(), F.col("w").asc())
        .limit(k)
    )
    probes = top.select(
        "w",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("row"),
                        _slot(F.col("w"), j, width).alias("slot"),
                    )
                    for j in range(depth)
                ]
            )
        ).alias("rs"),
    ).select("w", "exact_count", F.col("rs.row").alias("row"), F.col("rs.slot").alias("slot"))
    out = (
        probes.join(F.broadcast(sketch), ["row", "slot"])
        .groupBy("w", "exact_count")
        .agg(F.min("cnt").alias("cms_est"))
        .select(
            F.col("w").alias("word"),
            "exact_count",
            "cms_est",
        )
    )
    return out


def cms_topk_estimates_sql(
    table: str,
    k: int = 20,
    depth: int = 4,
    width: int = 256,
    text_col: str = "text",
) -> str:
    """DuckDB mirror — same md5 slot hash, same min-over-rows estimate."""
    from .dedup import _hex_int_sql

    def slot(expr: str, j: int) -> str:
        h = _hex_int_sql(
            f"substr(md5(CAST({j} AS VARCHAR) || '|' || CAST({expr} AS VARCHAR)), 1, 15)"
        )
        return f"CAST(({h}) % {int(width)} AS INT)"

    slot_rows = " UNION ALL ".join(
        f"SELECT w, {j} AS row, {slot('w', j)} AS slot FROM words"
        for j in range(depth)
    )
    probe_rows = " UNION ALL ".join(
        f"SELECT w, exact_count, {j} AS row, {slot('w', j)} AS slot FROM top"
        for j in range(depth)
    )
    return f"""
WITH words AS (
  SELECT unnest(list_filter(
           regexp_split_to_array(trim(lower({text_col})), '{_WS}'),
           x -> x <> '')) AS w
  FROM {table}
),
slots AS ({slot_rows}),
sketch AS (
  SELECT row, slot, count(*) AS cnt FROM slots GROUP BY row, slot
),
exact AS (
  SELECT w, count(*) AS exact_count FROM words GROUP BY w
),
top AS (
  SELECT w, exact_count FROM exact
  ORDER BY exact_count DESC, w ASC LIMIT {int(k)}
),
probes AS ({probe_rows})
SELECT p.w AS word, p.exact_count,
       CAST(min(s.cnt) AS BIGINT) AS cms_est
FROM probes p JOIN sketch s USING (row, slot)
GROUP BY p.w, p.exact_count
""".strip()
