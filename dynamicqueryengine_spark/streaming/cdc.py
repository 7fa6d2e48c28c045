"""CDC subscription over the versioned table's change data feed — the
"stream FROM the table" direction (Delta's ``readStream`` on a Delta
source; Debezium's connector cursor), completing the loop the other
streaming modules only write INTO (``upsert.py``, ``minhash.py`` are
sinks; this is the source side).

A SUBSCRIPTION is (source table, consumer app name, sink table). The
consumer's CURSOR — the highest source version it has fully applied —
is not stored anywhere separate: it rides the sink table's
SetTransaction map (``txn=(app, source_head)`` committed atomically
with the apply's own write), so "apply the changes" and "advance the
cursor" are ONE atomic manifest commit. A crash at any point replays
as: re-read the same ``(cursor, head]`` range (immutable — change
directories and manifests are never rewritten), re-derive the same
apply frame, and re-commit with the same txn marker, which the sink's
exactly-once guard turns into a no-op. At-least-once pumping therefore
yields exactly-once application, with no checkpoint files and no state
store — the identical argument ``events_stream_upsert_totals`` pins for
the sink direction.

Scale shape: each pump reads ONLY the ``(cursor, head]`` change rows
(|changes|-proportional, never |table|); the apply is whatever the
consumer does with them — the canonical consumer below maintains a
keyed rollup via signed increments + ``vt_merge``, i.e. O(|changes| +
|touched keys|) per pump. A service would run :func:`pump_changes` on a
processing-time trigger; tests and the contract query drive it to
quiescence with :func:`pump_until_current` (the ``availableNow``
analog).
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, functions as F

__all__ = [
    "pump_changes",
    "pump_until_current",
    "subscription_cursor",
    "apply_rollup_increment",
    "apply_index_increment",
]


def subscription_cursor(sink_path: str, app: str) -> int:
    """The subscription's durable cursor: the highest SOURCE version the
    consumer ``app`` has applied into ``sink_path`` (0 = never)."""
    from ..sources.versioned import vt_last_txn

    last = vt_last_txn(sink_path, app)
    return 0 if last is None else last


def pump_changes(
    spark,
    src_path: str,
    sink_path: str,
    app: str,
    apply_batch: Callable[[DataFrame, tuple[str, int]], None],
) -> int:
    """Process every source commit past the cursor: read the
    ``(cursor, head]`` change rows (``_change_type`` /
    ``_commit_version`` tagged — see ``vt_read_changes``) and hand them
    to ``apply_batch(changes, txn)``, which MUST commit its effect to
    ``sink_path`` with the given ``txn`` marker (that commit advances
    the cursor atomically). Returns the number of source versions
    consumed (0 = already current, apply_batch not called)."""
    from ..sources.versioned import vt_head, vt_read_changes

    head = vt_head(src_path)
    cursor = subscription_cursor(sink_path, app)
    if head <= cursor:
        return 0
    changes = vt_read_changes(spark, src_path, cursor, head)
    apply_batch(changes, (app, head))
    return head - cursor


def pump_until_current(
    spark,
    src_path: str,
    sink_path: str,
    app: str,
    apply_batch: Callable[[DataFrame, tuple[str, int]], None],
    max_rounds: int = 100,
) -> int:
    """Drive :func:`pump_changes` until the subscription is current —
    the ``availableNow`` analog (new source commits may land between
    rounds; each round folds everything accumulated so far). Returns
    total versions consumed."""
    total = 0
    for _ in range(max_rounds):
        n = pump_changes(spark, src_path, sink_path, app, apply_batch)
        if n == 0:
            return total
        total += n
    raise RuntimeError(
        f"subscription {app!r} not current after {max_rounds} rounds"
    )


def apply_rollup_increment(
    spark,
    sink_path: str,
    key_cols: list[str],
    sum_cols: dict[str, str],
) -> Callable[[DataFrame, tuple[str, int]], None]:
    """The canonical CDC consumer: maintain a keyed rollup (per-key row
    count ``n`` plus ``sum_cols`` = {out_name: source_col} sums) by
    SIGNED increments — insert/update_postimage rows count +1, delete/
    update_preimage rows −1 — merged into the sink keyed on
    ``key_cols``. Because count/sum are signed-associative, the
    maintained sink equals a full recompute of the source snapshot after
    every pump, which is what the contract query's value oracle checks.
    Keys whose rolled-up count reaches 0 keep a zero row (tombstone
    compaction is the sink OPTIMIZE's job, not the apply's)."""
    from ..sources.versioned import vt_merge, vt_read, vt_versions

    def apply(changes: DataFrame, txn: tuple[str, int]) -> None:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1))
        delta = changes.groupBy(*key_cols).agg(
            F.sum(sign).alias("_dn"),
            *[
                F.sum(
                    sign * F.coalesce(
                        F.col(src).cast("decimal(38,12)"),
                        F.lit(0).cast("decimal(38,12)"),
                    )
                ).alias(f"_d_{out}")
                for out, src in sum_cols.items()
            ],
        )
        if vt_versions(sink_path):
            cur = vt_read(spark, sink_path)
        else:
            cur = delta.select(
                *key_cols,
                F.lit(0).cast("long").alias("n"),
                *[
                    F.lit(0).cast("decimal(38,12)").alias(out)
                    for out in sum_cols
                ],
            ).limit(0)
        merged = (
            delta.join(cur, key_cols, "left")
            .select(
                *key_cols,
                (
                    F.coalesce(F.col("n"), F.lit(0)) + F.col("_dn")
                ).cast("long").alias("n"),
                *[
                    (
                        F.coalesce(
                            F.col(out), F.lit(0).cast("decimal(38,12)")
                        )
                        + F.col(f"_d_{out}")
                    ).alias(out)
                    for out in sum_cols
                ],
            )
        )
        vt_merge(spark, sink_path, merged, key_cols, txn=txn)

    return apply


def apply_index_increment(
    spark,
    sink_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> Callable[[DataFrame, tuple[str, int]], None]:
    """CDC consumer that maintains an INVERTED-INDEX summary — per token
    ``df`` (documents containing it) and ``tf`` (total occurrences) —
    from a document table's change feed, by signed increments over the
    EXPLODED token stream: each change row tokenizes (whitespace split,
    the corpus_inverted_index convention), contributes ``+1`` (insert /
    update_postimage) or ``-1`` (delete / update_preimage) per distinct
    (doc, token) to ``df`` and ±occurrences to ``tf``, and the per-token
    deltas merge into the sink keyed on token.

    Why this shape scales: a full index rebuild is O(|corpus|) per
    refresh; this is O(|changed docs| × tokens-per-doc) — the
    incremental-view-maintenance argument, but over an exploded (fan-out)
    projection rather than a 1:1 row map, which is what makes it a
    different proof than :func:`apply_rollup_increment`: an update whose
    pre- and post-image share a token telescopes to a net-zero df delta
    only because the pre-image row explodes too. Tokens whose df reaches
    0 keep a zero row (tombstone compaction is OPTIMIZE's job).

    Change rows for the SAME doc from different commits in one pump must
    not collapse before signing, so the per-doc aggregation keys on
    (_commit_version, _change_type) as well."""
    from ..sources.versioned import vt_merge, vt_read, vt_versions

    def apply(changes: DataFrame, txn: tuple[str, int]) -> None:
        sign = F.when(
            F.col("_change_type").isin("insert", "update_postimage"),
            F.lit(1),
        ).otherwise(F.lit(-1)).alias("_sign")
        per_doc = (
            changes.select(
                id_col,
                "_commit_version",
                "_change_type",
                F.explode(F.split(F.col(text_col), " ")).alias("token"),
            )
            .groupBy(id_col, "_commit_version", "_change_type", "token")
            .agg(F.count(F.lit(1)).alias("_occ"))
        )
        delta = per_doc.select("token", sign, "_occ").groupBy("token").agg(
            F.sum("_sign").alias("_d_df"),
            F.sum(F.col("_sign") * F.col("_occ")).alias("_d_tf"),
        )
        if vt_versions(sink_path):
            cur = vt_read(spark, sink_path)
        else:
            cur = delta.select(
                "token",
                F.lit(0).cast("long").alias("df"),
                F.lit(0).cast("long").alias("tf"),
            ).limit(0)
        merged = delta.join(cur, ["token"], "left").select(
            "token",
            (F.coalesce(F.col("df"), F.lit(0)) + F.col("_d_df"))
            .cast("long")
            .alias("df"),
            (F.coalesce(F.col("tf"), F.lit(0)) + F.col("_d_tf"))
            .cast("long")
            .alias("tf"),
        )
        vt_merge(spark, sink_path, merged, ["token"], txn=txn)

    return apply
