"""Streaming CDC upsert (streaming/upsert.py): cross-micro-batch
accumulation must equal the one-shot batch aggregate, and updates must
replace (not append) per-key rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from dynamicqueryengine_spark.streaming.upsert import stream_upsert_totals


def _stage_file(df, tmp_path, src, name):
    """Write df as ONE plain parquet file directly inside src."""
    import glob
    import shutil

    stage = tmp_path / f"stage_{name}"
    df.coalesce(1).write.parquet(str(stage))
    src.mkdir(exist_ok=True)
    shutil.move(glob.glob(str(stage / "part-*.parquet"))[0], str(src / name))


def test_two_microbatches_accumulate_exactly(spark, tmp_path):
    src = tmp_path / "src"
    # two separate files -> maxFilesPerTrigger=1 forces TWO micro-batches
    _stage_file(
        spark.createDataFrame(
            [(1, 10.0), (2, 1.5)], "user_id long, value double"
        ),
        tmp_path,
        src,
        "a.parquet",
    )
    _stage_file(
        spark.createDataFrame(
            [(1, 5.0), (3, 2.0)], "user_id long, value double"
        ),
        tmp_path,
        src,
        "b.parquet",
    )

    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    path = str(tmp_path / "totals")
    stream_upsert_totals(stream, path, str(tmp_path / "ckpt"))

    got = {
        r["user_id"]: (r["n_events"], float(r["sum_value"]))
        for r in spark.read.parquet(path).collect()
    }
    assert got == {1: (2, 15.0), 2: (1, 1.5), 3: (1, 2.0)}
    # exactly one row per key — upsert, not append
    assert spark.read.parquet(path).count() == 3


def _totals(spark, path):
    return {
        r["user_id"]: (r["n_events"], float(r["sum_value"]))
        for r in spark.read.parquet(path).collect()
    }


def test_replayed_batch_is_a_noop(spark, tmp_path):
    """foreachBatch is at-least-once: re-applying a committed batch
    (crash between merge commit and checkpoint commit) must not
    double-count — the per-key last_batch_id guard skips replays."""
    from dynamicqueryengine_spark.streaming.upsert import upsert_batch

    path = str(tmp_path / "totals")
    b0 = spark.createDataFrame(
        [(1, 10.0), (2, 1.5)], "user_id long, value double"
    )
    b1 = spark.createDataFrame(
        [(1, 5.0), (3, 2.0)], "user_id long, value double"
    )
    upsert_batch(spark, path, b0, 0)
    upsert_batch(spark, path, b1, 1)
    expect = {1: (2, 15.0), 2: (1, 1.5), 3: (1, 2.0)}
    assert _totals(spark, path) == expect
    # replay batch 1 (same id, same data) — must change nothing
    upsert_batch(spark, path, b1, 1)
    assert _totals(spark, path) == expect
    # replay batch 0 too (late duplicate of an older batch)
    upsert_batch(spark, path, b0, 0)
    assert _totals(spark, path) == expect
    # and a genuinely new batch still applies on top
    upsert_batch(
        spark,
        path,
        spark.createDataFrame([(2, 0.5)], "user_id long, value double"),
        2,
    )
    assert _totals(spark, path) == {1: (2, 15.0), 2: (2, 2.0), 3: (1, 2.0)}
