"""vt_convert (r14) — Delta's CONVERT TO DELTA: create a versioned
table around existing parquet files by hard-linking (zero-copy),
harvesting footer stats driver-side, and writing one creation commit.
No byte of data is read or rewritten."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.sources.versioned import (
    _read_manifest,
    vt_convert,
    vt_count,
    vt_delete,
    vt_read,
    vt_scan_plan,
    vt_write,
)


def _stage_parquet(spark, tmp_path, n=40, parts=4):
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(n)],
        "id long, g string, x double",
    ).repartition(parts).write.parquet(src)
    return src


class TestConvert:
    def test_zero_copy_and_full_surface(self, spark, tmp_path):
        src = _stage_parquet(spark, tmp_path)
        path = str(tmp_path / "t")
        v = vt_convert(spark, src, path)
        assert v == 1
        m = _read_manifest(path, 1)
        assert m["convert"]["files"] == len(m["files"][m["dirs"][0]])
        # zero-copy: linked files share the source inodes
        d = m["dirs"][0]
        for f in m["files"][d]:
            assert os.stat(os.path.join(path, d, f)).st_ino == os.stat(
                os.path.join(src, f)
            ).st_ino
        out = vt_read(spark, path)
        assert out.count() == 40
        assert vt_count(spark, path) == 40  # footer counts harvested
        # stats harvested: a range scan prunes without reading
        plan = vt_scan_plan(path, predicate=("id", ">=", 1000))
        assert plan["files_kept"] == 0
        # the full surface applies from the creation commit on
        vt_delete(spark, path, ("id", "<", 10))
        assert vt_read(spark, path).count() == 30
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(100, "gz", 1.0)], "id long, g string, x double"
            ),
            mode="append",
        )
        assert vt_read(spark, path).count() == 31
        # source files untouched
        assert spark.read.parquet(src).count() == 40

    def test_single_file_and_stream(self, spark, tmp_path):
        src = _stage_parquet(spark, tmp_path, n=10, parts=1)
        fp = [
            os.path.join(src, f)
            for f in os.listdir(src)
            if f.endswith(".parquet")
        ][0]
        path = str(tmp_path / "t")
        vt_convert(spark, fp, path)
        assert vt_read(spark, path).count() == 10
        # the creation commit streams as inserts (no predecessor to
        # delete) — a table-stream from version 0 serves it
        from dynamicqueryengine_spark.sources.datasource import (
            vt_register,
        )

        vt_register(spark)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = (
            spark.readStream.format("vt")
            .option("path", path)
            .option("startingVersion", "0")
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert spark.read.parquet(out).count() == 10

    def test_refusals(self, spark, tmp_path):
        src = _stage_parquet(spark, tmp_path)
        path = str(tmp_path / "t")
        vt_convert(spark, src, path)
        with pytest.raises(ValueError, match="already a versioned"):
            vt_convert(spark, src, path)
        # hive layout refused
        hive = str(tmp_path / "hive")
        spark.createDataFrame(
            [(1, "a")], "id long, day string"
        ).write.partitionBy("day").parquet(hive)
        with pytest.raises(ValueError, match="hive-partitioned"):
            vt_convert(spark, hive, str(tmp_path / "t2"))
        # mixed schemas refused
        mixed = str(tmp_path / "mixed")
        os.makedirs(mixed)
        spark.createDataFrame([(1,)], "a long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "m1"))
        spark.createDataFrame([("x",)], "a string").coalesce(
            1
        ).write.mode("overwrite").parquet(str(tmp_path / "m2"))
        import shutil as _sh

        for i, mdir in enumerate(["m1", "m2"]):
            for f in os.listdir(str(tmp_path / mdir)):
                if f.endswith(".parquet"):
                    _sh.copy(
                        str(tmp_path / mdir / f),
                        os.path.join(mixed, f"p{i}.parquet"),
                    )
        with pytest.raises(ValueError, match="distinct parquet"):
            vt_convert(spark, mixed, str(tmp_path / "t3"))
