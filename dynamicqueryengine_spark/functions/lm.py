"""N-gram language-model quality scoring (CCNet-style perplexity filter).

The classic web-corpus curation signal (Wenzek et al., *CCNet*, 2020): train
a small smoothed n-gram LM on a trusted slice of the corpus, score every
document by its average negative log-likelihood, and keep the fluent tail.
Here the LM is an add-k-smoothed **word bigram** model trained on a
caller-chosen slice (e.g. ``lang = 'en'``), entirely in DataFrame
aggregations — counts are exact integers, so the model itself is
oracle-checkable, and the per-document score is made order-insensitive by
quantizing each bigram's log-probability to integer micro-nats BEFORE the
per-document sum (bigint summation is exact and associative; summing raw
doubles would make the hash depend on partial-aggregation order).

Model: ``P(cur | prev) = (c(prev,cur) + k) / (c(prev) + k·V)`` with
``V = |train vocab| + 1`` (the +1 reserves unseen-token mass); documents are
tokenized on whitespace after the corpus-standard normalization
(functions/text.normalize_text) with a ``<s>`` BOS token, so a document with
``n`` tokens contributes exactly ``n`` bigrams. Unseen contexts degrade to
``P = 1/V`` — no separate UNK mapping needed, the smoothing already defines
the full event space.

Beyond the reference surface (the reference has no text operators at all —
SURVEY.md §2.5); sibling quality signals live in functions/text.py.

Scale shape: training is two hash-partitioned groupBys over the train
slice's bigram stream (bounded by corpus token count; the bigram table of
even a very large train slice is ≪ the corpus itself because counts
collapse duplicates); scoring is two equi-joins keyed on the bigram/context
(Catalyst broadcasts them when small, AQE handles the hot-stopword-context
skew otherwise) plus one per-document rollup. The vocab size is a
single-row scalar broadcast. No windows, no driver state, no Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import normalize_text, normalize_text_sql

__all__ = ["bigram_lm_scores", "bigram_lm_scores_sql"]

_BOS = "<s>"


def _bigrams(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, prev, cur) bigram stream: BOS-prefixed whitespace tokens of the
    normalized text; empty documents yield the single bigram (<s>, '')."""
    arr = F.concat(
        F.array(F.lit(_BOS)), F.split(normalize_text(F.col(text_col)), " ")
    )
    return (
        df.select(F.col(id_col), arr.alias("_a"))
        .select(
            id_col,
            "_a",
            F.explode(F.sequence(F.lit(1), F.size("_a") - 1)).alias("_i"),
        )
        .select(
            id_col,
            F.element_at("_a", F.col("_i")).alias("prev"),
            F.element_at("_a", F.col("_i") + 1).alias("cur"),
        )
    )


def bigram_lm_scores(
    df: DataFrame,
    train_filter,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document LM fluency score against a bigram model trained on the
    ``train_filter`` slice of the same frame: ``(id, n_bigrams, avg_nll,
    ppl_bucket)`` where ``avg_nll`` is the mean negative log-likelihood in
    nats (round 6, micro-nat-quantized per bigram — see module doc) and
    ``ppl_bucket`` is CCNet's head/middle/tail split at the corpus-wide
    exact tertiles of ``avg_nll`` (lower = more fluent = head; cut points
    are a single-row scalar broadcast, interpolation is the shared
    ``(n-1)p`` formula of Spark ``percentile`` / DuckDB
    ``quantile_cont``)."""
    grams = _bigrams(df, text_col, id_col)
    train = _bigrams(df.filter(train_filter), text_col, id_col)
    big = train.groupBy("prev", "cur").agg(F.count(F.lit(1)).alias("_cbig"))
    uni = train.groupBy("prev").agg(F.count(F.lit(1)).alias("_cuni"))
    vocab = train.agg(
        (F.countDistinct("cur") + F.lit(1)).alias("_v")
    )
    p = (F.coalesce(F.col("_cbig"), F.lit(0)) + F.lit(k)) / (
        F.coalesce(F.col("_cuni"), F.lit(0)) + F.lit(k) * F.col("_v")
    )
    q = F.round(F.log(p) * F.lit(1e6), 0).cast("bigint")
    scores = (
        grams.join(big, ["prev", "cur"], "left")
        .join(uni, ["prev"], "left")
        .crossJoin(F.broadcast(vocab))
        .select(F.col(id_col), q.alias("_q"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_bigrams"),
            F.round(
                (-F.sum("_q") / F.lit(1e6)) / F.count(F.lit(1)), 6
            ).alias("avg_nll"),
        )
    )
    cuts = scores.agg(
        F.percentile(F.col("avg_nll"), F.lit(1.0 / 3)).alias("_c1"),
        F.percentile(F.col("avg_nll"), F.lit(2.0 / 3)).alias("_c2"),
    )
    return scores.crossJoin(F.broadcast(cuts)).select(
        id_col,
        "n_bigrams",
        "avg_nll",
        F.when(F.col("avg_nll") <= F.col("_c1"), F.lit("head"))
        .when(F.col("avg_nll") <= F.col("_c2"), F.lit("middle"))
        .otherwise(F.lit("tail"))
        .alias("ppl_bucket"),
    )


def _bigrams_sql(table: str, where: str, text_col: str, id_col: str) -> str:
    norm = normalize_text_sql(text_col)
    return f"""
  SELECT {id_col}, a[i] AS prev, a[i + 1] AS cur FROM (
    SELECT {id_col},
           list_prepend('{_BOS}', regexp_split_to_array({norm}, ' ')) AS a
    FROM {table}{where}),
  unnest(generate_series(1, len(a) - 1)) AS t(i)
""".strip()


def bigram_lm_scores_sql(
    table: str,
    train_where: str,
    k: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`bigram_lm_scores` (``train_where`` is the SQL
    predicate matching ``train_filter``, without the ``WHERE``)."""
    grams = _bigrams_sql(table, "", text_col, id_col)
    train = _bigrams_sql(table, f" WHERE {train_where}", text_col, id_col)
    return f"""
WITH grams AS ({grams}),
train AS ({train}),
big AS (SELECT prev, cur, count(*) AS cbig FROM train GROUP BY prev, cur),
uni AS (SELECT prev, count(*) AS cuni FROM train GROUP BY prev),
vocab AS (SELECT count(DISTINCT cur) + 1 AS v FROM train),
scored AS (
  SELECT {id_col},
         CAST(round(ln((COALESCE(cbig, 0) + CAST({k} AS DOUBLE)) /
                       (COALESCE(cuni, 0) + CAST({k} AS DOUBLE) * v)) * 1e6)
              AS BIGINT) AS q
  FROM grams
  LEFT JOIN big USING (prev, cur)
  LEFT JOIN uni USING (prev)
  CROSS JOIN vocab
),
scores AS (
  SELECT {id_col},
         CAST(count(*) AS INT) AS n_bigrams,
         round((-sum(q) / 1e6) / count(*), 6) AS avg_nll
  FROM scored GROUP BY {id_col}
),
cuts AS (
  SELECT quantile_cont(avg_nll, {1.0 / 3!r}) AS c1,
         quantile_cont(avg_nll, {2.0 / 3!r}) AS c2
  FROM scores
)
SELECT {id_col}, n_bigrams, avg_nll,
       CASE WHEN avg_nll <= c1 THEN 'head'
            WHEN avg_nll <= c2 THEN 'middle'
            ELSE 'tail' END AS ppl_bucket
FROM scores CROSS JOIN cuts
""".strip()
