"""Sink connectors: partitioned columnar writes.

The reference's only sink is the HTTP response body (RuleController.cs:17-22)
— materialize-to-caller, reproduced by ``api.py``. A real analytics engine
also needs durable sinks; these are thin, declarative wrappers that keep the
write inside Spark's committer machinery (atomic, retry-safe at 1000
executors).

Scale guidance baked in: ``partition_by`` low-cardinality keys only
(date/type — every distinct value is a directory); ``target_file_mb``
re-buckets the plan with a repartition so files land near the target size
instead of one-file-per-task dust at high parallelism.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: Sequence[str] | None = None,
    mode: str = "overwrite",
    target_file_mb: int | None = None,
) -> None:
    out = df
    if target_file_mb:
        # crude but effective local sizing: rows-per-file from a sampled avg
        # row width would need a scan; instead coalesce by executor count.
        out = out.coalesce(max(df.sparkSession.sparkContext.defaultParallelism // 2, 1))
    writer = out.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a BUCKETED managed table — the co-located-join lever.

    Two tables bucketed on the same keys with the same bucket count join
    WITHOUT a shuffle on either side (and without the sort, if ``sort_cols``
    matches the join keys): at 100 TB this turns every repeated
    fact-to-fact join on the bucket key from a full-network exchange into a
    local per-bucket merge. Bucket pruning likewise serves point lookups on
    the bucket key from 1/``num_buckets`` of the files. The layout is
    invisible to readers (`spark.table(name)`), so pipelines opt in purely
    at write time. (tests/test_plan_audit.py asserts the no-Exchange plan.)

    Overwrite is made crash-resilient: a killed prior run can leave the
    table's warehouse DIRECTORY behind without a catalog entry, which
    fails the next saveAsTable with LOCATION_ALREADY_EXISTS — so the
    table is dropped if registered AND its default-database location is
    cleared when it exists unregistered (local/file warehouses only; an
    object-store warehouse relies on the committer's overwrite).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        _clear_stale_table_location(spark, name)
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def _clear_stale_table_location(spark, name: str) -> None:
    """Remove a dropped/unregistered managed table's leftover warehouse
    directory (default database, local/file warehouse only) so a
    re-create never hits LOCATION_ALREADY_EXISTS after a killed run."""
    import os
    import shutil
    from urllib.parse import urlparse

    wh = urlparse(spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse"))
    if wh.scheme not in ("", "file"):
        return
    root = wh.path or wh.netloc
    loc = os.path.join(root, name.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc, ignore_errors=True)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", header: bool = True) -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def merge_upsert(
    spark,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
) -> None:
    """Keyed MERGE (upsert) into a parquet directory: rows in ``updates``
    replace current rows with the same key; unmatched keys are inserted.

    Pattern, not table format: at production scale this is what Delta/
    Iceberg MERGE INTO does transactionally; on plain parquet the same
    semantics need copy-on-write — current ⟕(anti) update-keys ∪ updates
    staged to a NEW directory, then swapped in. The staged write fully
    executes (and therefore finishes reading the current table) before
    the swap, so a failed write leaves the current table untouched; the
    swap itself is two renames. Readers caching the old DataFrame keep
    a stale-but-consistent view (parquet files are immutable once
    written).

    The anti-join is keyed and AQE-planned (broadcast for small update
    batches — the common CDC case); nothing is collected.

    Crash recovery (single-writer, LOCAL/file paths only — os.rename is
    what makes the swap atomic here; on an object store this pattern
    needs a transactional table format instead): entry first restores
    the newest ``._old_*`` backup if an interrupted swap left no table
    at ``path``, then clears stale ``._staged_*``/``._old_*`` debris;
    the swap itself restores the backup if the second rename fails, so
    no failure point loses the current table.
    """
    import glob
    import os
    import shutil
    import uuid

    # recover from a swap interrupted between its two renames (table
    # moved aside but replacement never landed), then drop stale debris
    # from previously failed/killed runs. The backup suffix is a random
    # uuid, so NAME order says nothing about recency — restore by mtime
    # (the rename preserves the directory's own mtime, and a newer backup
    # was written strictly later) so accumulated stale backups from prior
    # failed sweeps can never shadow the true latest snapshot.
    olds = sorted(glob.glob(f"{path}._old_*"), key=lambda p: os.path.getmtime(p))
    if olds and not os.path.exists(path):
        os.rename(olds.pop(), path)
    for stale in glob.glob(f"{path}._staged_*") + olds:
        shutil.rmtree(stale, ignore_errors=True)

    keys = list(key_cols)
    if os.path.exists(path):
        current = spark.read.parquet(path)
        merged = current.join(
            updates.select(*keys).distinct(), keys, "left_anti"
        ).unionByName(updates)
    else:
        merged = updates
    staged = f"{path}._staged_{uuid.uuid4().hex[:8]}"
    merged.write.mode("overwrite").parquet(staged)
    old = f"{path}._old_{uuid.uuid4().hex[:8]}"
    had_current = os.path.exists(path)
    if had_current:
        os.rename(path, old)
    try:
        os.rename(staged, path)
    except OSError:
        if had_current and not os.path.exists(path):
            os.rename(old, path)  # restore — never leave no table behind
        shutil.rmtree(staged, ignore_errors=True)
        raise
    if had_current:
        shutil.rmtree(old, ignore_errors=True)
