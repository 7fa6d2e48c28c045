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
