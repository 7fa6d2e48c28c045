"""Batch half of the vt Python DataSource (r13):
``spark.read.format("vt").option("path", …).load()`` must equal
``vt_read`` on any table — deletion vectors, column mapping, schema
evolution, partitions — plus versionAsOf/timestampAsOf time travel and
metadata-driven filter pushdown (sources/datasource.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.sources.datasource import (
    _VtBatchPushdownReader,
    vt_register,
)
from dynamicqueryengine_spark.sources.versioned import (
    vt_delete,
    vt_merge,
    vt_read,
    vt_rename_column,
    vt_widen_column,
    vt_write,
)


@pytest.fixture()
def registered(spark):
    vt_register(spark)
    return spark


def _df(spark, n=20):
    return spark.createDataFrame(
        [(i, f"g{i % 3}", float(i)) for i in range(n)],
        "id long, g string, x double",
    )


def _by_id(df):
    return sorted(tuple(r) for r in df.collect())


class TestBatchRead:
    def test_equals_vt_read_on_mapped_dv_table(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark), partition_by=["g"])
        vt_delete(spark, path, ("id", "=", 5), mode="dv")
        vt_rename_column(path, "x", "amount")
        out = spark.read.format("vt").option("path", path).load()
        assert out.columns == ["id", "g", "amount"]
        assert _by_id(out) == _by_id(vt_read(spark, path))
        assert out.count() == 19

    def test_version_and_timestamp_time_travel(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 5))
        import time as _t

        _t.sleep(0.05)
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
        )

        ts1 = _read_manifest(path, 1)["ts"]
        vt_write(spark, path, _df(spark, 3), mode="append")
        v1 = (
            spark.read.format("vt")
            .option("path", path)
            .option("versionAsOf", "1")
            .load()
        )
        assert v1.count() == 5
        t1 = (
            spark.read.format("vt")
            .option("path", path)
            .option("timestampAsOf", str(ts1))
            .load()
        )
        assert t1.count() == 5
        with pytest.raises(Exception, match="not both"):
            spark.read.format("vt").option("path", path).option(
                "versionAsOf", "1"
            ).option("timestampAsOf", str(ts1)).load()

    def test_schema_evolution_reconciles_nulls_and_upcasts(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(i, f"g{i % 3}", float(i)) for i in range(4)],
                "id int, g string, x double",
            ),
        )
        # metadata-only widen: the v1 files stay physically int32; the
        # batch reader must upcast them to the declared bigint at scan
        vt_widen_column(path, "id", "bigint")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(100, "g9", 1.5, "tag")],
                "id long, g string, x double, note string",
            ),
            mode="append",
            merge_schema=True,
        )
        out = spark.read.format("vt").option("path", path).load()
        rows = {r["id"]: r["note"] for r in out.collect()}
        assert rows[100] == "tag"
        assert all(rows[i] is None for i in range(4))

    def test_merge_and_partial_dirs_honored(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        vt_merge(
            spark,
            path,
            spark.createDataFrame(
                [(0, "g0", 99.0)], "id long, g string, x double"
            ),
            ["id"],
        )
        out = spark.read.format("vt").option("path", path).load()
        assert _by_id(out) == _by_id(vt_read(spark, path))
        assert {r["x"] for r in out.filter("id = 0").collect()} == {99.0}

    def test_pushdown_prunes_partitions(self, registered, tmp_path):
        from pyspark.sql.datasource import EqualTo

        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 30), partition_by=["g"])
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
        )

        schema = (
            spark.read.format("vt").option("path", path).load().schema
        )
        probe = _VtBatchPushdownReader(schema, path, 1)
        kept = probe.pushFilters([EqualTo(("g",), "g1")])
        assert list(kept)  # every filter handed back for re-evaluation
        parts = probe.partitions()
        # the pushed equality keeps ONLY the g1 partition's directory —
        # every planned path lives under it
        m = _read_manifest(path, 1)
        g1_dirs = {
            d for d, pv in m["partitions"].items() if pv["g"] == "g1"
        }
        assert len(g1_dirs) == 1
        assert parts and all(
            any(f"/{d}/" in p.path or p.path.endswith(d) for d in g1_dirs)
            for p in parts
        )
        # and the filtered read is value-correct end to end
        got = sorted(
            r["id"]
            for r in spark.read.format("vt")
            .option("path", path)
            .load()
            .filter(F.col("g") == "g1")
            .collect()
        )
        assert got == [i for i in range(30) if i % 3 == 1]

    def test_reads_without_pushdown_conf(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 6))
        spark.conf.set(
            "spark.sql.python.filterPushdown.enabled", "false"
        )
        try:
            out = (
                spark.read.format("vt")
                .option("path", path)
                .load()
                .filter("g = 'g0'")
            )
            assert out.count() == 2
        finally:
            spark.conf.set(
                "spark.sql.python.filterPushdown.enabled", "true"
            )

    def test_missing_table_and_bad_version_error(
        self, registered, tmp_path
    ):
        spark = registered
        with pytest.raises(Exception, match="no committed versions"):
            spark.read.format("vt").option(
                "path", str(tmp_path / "nope")
            ).load()
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 2))
        with pytest.raises(Exception, match="not committed"):
            spark.read.format("vt").option("path", path).option(
                "versionAsOf", "7"
            ).load()


class TestBatchWrite:
    """r13: the writer half — df.write.format('vt') creates/appends
    through the same OCC manifest commit as vt_write; features a blind
    writer cannot maintain refuse; failed jobs leave the table
    byte-identical (abort removes the staging, the version slot was
    never claimed)."""

    def test_create_append_and_read_back(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        df = _df(spark, 20)
        df.write.format("vt").mode("overwrite").option(
            "path", path
        ).save()
        assert vt_read(spark, path).count() == 20
        spark.createDataFrame(
            [(100, "g9", 1.0)], "id long, g string, x double"
        ).write.format("vt").mode("append").option("path", path).save()
        got = sorted(
            r["id"]
            for r in spark.read.format("vt")
            .option("path", path)
            .load()
            .collect()
        )
        assert got == sorted(list(range(20)) + [100])
        # the format write is a real commit: time travel sees both
        assert vt_read(spark, path, version=1).count() == 20
        # footer stats were harvested — the scan plan can prune
        from dynamicqueryengine_spark.sources.versioned import (
            vt_scan_plan,
        )

        plan = vt_scan_plan(path, predicate=("id", "=", 100))
        assert plan["files_kept"] < plan["files_total"]

    def test_append_schema_mismatch_refused(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        _df(spark, 4).write.format("vt").mode("overwrite").option(
            "path", path
        ).save()
        with pytest.raises(Exception, match="schema differs"):
            spark.createDataFrame([(1,)], "id long").write.format(
                "vt"
            ).mode("append").option("path", path).save()

    def test_featured_tables_refused(self, registered, tmp_path):
        spark = registered
        for feature, kwargs in (
            (
                "constraints",
                {
                    "constraints": [
                        {"name": "c", "kind": "not_null", "col": "id"}
                    ]
                },
            ),
            ("identity", {"identity": {"rid": {"start": 1}}}),
        ):
            path = str(tmp_path / f"t_{feature}")
            vt_write(spark, path, _df(spark, 4), **kwargs)
            with pytest.raises(Exception, match="vt_write"):
                _df(spark, 2).write.format("vt").mode("append").option(
                    "path", path
                ).save()

    def test_partitioned_append_splits_per_value(
        self, registered, tmp_path
    ):
        """r13 verdict ask #1: the format writer splits appends by the
        recorded partition_by — one file per value per task, one d_*
        dir per value per commit — so exact pruning and metadata-only
        DROP PARTITION survive external writes."""
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
            vt_count,
            vt_delete,
            vt_scan_plan,
            vt_versions,
        )

        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 12), partition_by=["g"])
        _df(spark, 9).withColumn(
            "x", F.col("x") + 100.0
        ).write.format("vt").mode("append").option("path", path).save()
        v = vt_versions(path)[-1]
        m = _read_manifest(path, v)
        # every dir carries exact partition values; no dir mixes them
        assert m["partition_by"] == ["g"]
        assert set(m["dirs"]) == set(m["partitions"])
        assert sorted(
            {pv["g"] for pv in m["partitions"].values()}
        ) == ["g0", "g1", "g2"]
        assert vt_count(spark, path) == 21
        # exact dir pruning still holds across vt_write + format dirs
        plan = vt_scan_plan(path, predicate=("g", "=", "g1"))
        assert plan["partition_pruned"] == len(m["dirs"]) - plan[
            "dirs_kept"
        ] and plan["dirs_kept"] < len(m["dirs"])
        got = sorted(
            r["id"]
            for r in vt_read(
                spark, path, predicate=("g", "=", "g1")
            ).collect()
        )
        assert got == sorted(
            [i for i in range(12) if i % 3 == 1]
            + [i for i in range(9) if i % 3 == 1]
        )
        # DROP PARTITION stays metadata-only after the format append
        v2 = vt_delete(spark, path, ("g", "=", "g2"))
        blob = _read_manifest(path, v2)["delete"]
        assert blob["files_rewritten"] == 0 and blob["dirs_dropped"] >= 2
        assert vt_count(spark, path) == 21 - 7

    def test_partitioned_overwrite_and_null_values(
        self, registered, tmp_path
    ):
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
            vt_scan_plan,
            vt_versions,
        )

        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 6), partition_by=["g"])
        spark.createDataFrame(
            [(1, None, 1.0), (2, "", 2.0), (3, "z", 3.0)],
            "id long, g string, x double",
        ).write.format("vt").mode("overwrite").option(
            "path", path
        ).save()
        m = _read_manifest(path, vt_versions(path)[-1])
        assert m["partition_by"] == ["g"]  # property carried
        vals = sorted(
            (pv["g"] is None, pv["g"] or "<null>")
            for pv in m["partitions"].values()
        )
        assert vals == [
            (False, "<null>"), (False, "z"), (True, "<null>")
        ]
        plan = vt_scan_plan(path, predicate=("g", "isnull", None))
        assert plan["partition_pruned"] == 2
        assert [
            r["id"]
            for r in vt_read(
                spark, path, predicate=("g", "=", "")
            ).collect()
        ] == [2]

    def test_bloom_cols_harvested_at_parity(self, registered, tmp_path):
        """The gateway-free Arrow bloom harvest must record the same
        positions as vt_write's JVM harvest for the same rows, and the
        format-written files must bloom-prune (value-interleaved so
        min/max stats cannot)."""
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
            vt_scan_plan,
            vt_versions,
        )

        spark = registered
        rows_a = [(1, "aa", 1.0), (2, "cc", 2.0)]
        rows_b = [(3, "bb", 3.0), (4, "dd", 4.0)]
        schema = "id long, g string, x double"
        native, fmt = str(tmp_path / "n"), str(tmp_path / "f")
        vt_write(
            spark,
            native,
            spark.createDataFrame(rows_a, schema).coalesce(1),
            bloom_cols=["g"],
        )
        vt_write(
            spark,
            fmt,
            spark.createDataFrame([], schema),
            bloom_cols=["g"],
        )
        spark.createDataFrame(rows_a, schema).coalesce(1).write.format(
            "vt"
        ).mode("append").option("path", fmt).save()
        spark.createDataFrame(rows_b, schema).coalesce(1).write.format(
            "vt"
        ).mode("append").option("path", fmt).save()

        def positions(path, version):
            m = _read_manifest(path, version)
            out = []
            for d in sorted(m.get("blooms", {})):
                b = m["blooms"][d]
                assert (b["m"], b["k"]) == (4096, 4)
                for f in sorted(b["files"]):
                    out.append(b["files"][f].get("g"))
            return out

        # rows_a harvested identically by both write paths
        assert positions(native, 1) == positions(fmt, 2)
        # interleaved ranges: stats keep both data files, blooms prune
        # the one without 'bb'
        plan = vt_scan_plan(fmt, predicate=("g", "=", "bb"))
        assert plan["bloom_pruned"] == 1
        assert plan["files_kept"] == plan["files_total"] - 1
        assert vt_read(
            spark, fmt, predicate=("g", "=", "bb")
        ).count() == 1

    def test_repartition_race_refused_at_commit(
        self, registered, tmp_path
    ):
        from dynamicqueryengine_spark.sources.datasource import (
            _check_writable,
        )
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
            vt_versions,
        )

        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 6), partition_by=["g"])
        prev = _read_manifest(path, vt_versions(path)[-1])
        schema_json = {"fields": []}
        # staged under the recorded split: fine
        _check_writable(
            prev, schema_json, "overwrite", path, staged_pby=["g"]
        )
        # a racing overwrite re-partitioned the table: refuse
        with pytest.raises(ValueError, match="re-partitioned"):
            _check_writable(
                prev, schema_json, "overwrite", path, staged_pby=[]
            )

    def test_cdf_option_refused_on_write(self, registered, tmp_path):
        spark = registered
        with pytest.raises(Exception, match="read option"):
            _df(spark, 2).write.format("vt").mode("append").option(
                "path", str(tmp_path / "t")
            ).option("readChangeFeed", "true").save()

    def test_failed_job_leaves_table_untouched(
        self, registered, tmp_path
    ):
        import glob
        import os as _os

        spark = registered
        path = str(tmp_path / "t")
        _df(spark, 6).write.format("vt").mode("overwrite").option(
            "path", path
        ).save()

        def boom(it):
            for pdf in it:
                raise RuntimeError("task failure injection")
                yield pdf  # pragma: no cover

        bad = _df(spark, 6).mapInPandas(boom, _df(spark, 1).schema)
        with pytest.raises(Exception):
            bad.write.format("vt").mode("append").option(
                "path", path
            ).save()
        from dynamicqueryengine_spark.sources.versioned import (
            vt_versions,
        )

        assert vt_versions(path) == [1]
        assert vt_read(spark, path).count() == 6
        assert not glob.glob(_os.path.join(path, ".fmtstage_*"))

    def test_unclaimed_staged_files_reaped_at_commit(
        self, registered, tmp_path
    ):
        """ADVICE r13 (medium): tasks write straight into the shared
        staging dir, so a failed or SPECULATIVE attempt leaves a file
        no commit message names. The committed d_* dir is scanned
        whole, so commit must unlink every unclaimed file before the
        rename — otherwise its duplicate/truncated rows get served
        while vt_count answers from the manifest."""
        import glob
        import os as _os

        from pyspark.sql.pandas.types import to_arrow_schema

        from dynamicqueryengine_spark.sources.datasource import (
            VersionedTableDataSource,
        )
        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
            vt_count,
        )

        spark = registered
        path = str(tmp_path / "t")
        schema = _df(spark, 1).schema
        target = to_arrow_schema(schema)
        src = VersionedTableDataSource({"path": path})
        w = src.writer(schema, True)
        batches = list(_df(spark, 4).toArrow().cast(target).to_batches())
        msg = w.write(iter(batches))
        # a speculative duplicate attempt writes the same rows but its
        # message never reaches the driver; plus a truncated partial
        w.write(iter(batches))
        stage = glob.glob(_os.path.join(path, ".fmtstage_*"))[0]
        open(_os.path.join(stage, "part-partial.parquet"), "wb").write(
            b"PAR1garbage"
        )
        w.commit([msg])
        m = _read_manifest(path, 1)
        d = m["dirs"][0]
        on_disk = sorted(
            _os.path.basename(p)
            for p in glob.glob(_os.path.join(path, d, "*"))
        )
        assert on_disk == [msg.entries[0][0]] == m["files"][d]
        assert vt_read(spark, path).count() == 4 == vt_count(spark, path)


class TestReadChangeFeed:
    """Batch CDF through the format reader (r14, verdict ask #3):
    option("readChangeFeed","true") + startingVersion/endingVersion
    must equal the package-level vt_read_changes over the same range —
    including DV deletes, column mapping, merges with recorded change
    dirs, and overwrite synthesis."""

    def _stage_history(self, spark, path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_merge,
            vt_update,
        )

        vt_write(spark, path, _df(spark, 6))                      # v1
        vt_write(                                                 # v2
            spark,
            path,
            spark.createDataFrame(
                [(100, "g9", 9.0)], "id long, g string, x double"
            ),
            mode="append",
        )
        vt_delete(spark, path, ("id", "=", 2), mode="dv")         # v3
        vt_rename_column(path, "x", "amount")                     # v4 (no rows)
        vt_merge(                                                 # v5
            spark,
            path,
            spark.createDataFrame(
                [(0, "gz", 50.0), (200, "gn", 7.0)],
                "id long, g string, amount double",
            ),
            ["id"],
            change_feed=True,
        )
        vt_update(                                                # v6
            spark,
            path,
            ("id", "=", 100),
            {"amount": "amount + 1"},
            change_feed=True,
        )
        return path

    def _norm(self, df):
        return sorted(
            tuple(r) for r in df.collect()
        )

    def test_equals_vt_read_changes_full_history(
        self, registered, tmp_path
    ):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_read_changes,
            vt_versions,
        )

        spark = registered
        path = self._stage_history(spark, str(tmp_path / "t"))
        head = vt_versions(path)[-1]
        fmt = (
            spark.read.format("vt")
            .option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
            .load()
        )
        native = vt_read_changes(spark, path, 0, head)
        assert fmt.columns == native.columns
        assert self._norm(fmt) == self._norm(native)
        # the feed saw every change-bearing commit
        assert {
            r["_commit_version"]
            for r in fmt.select("_commit_version").distinct().collect()
        } == {1, 2, 3, 5, 6}

    def test_sub_range_and_defaults(self, registered, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_read_changes,
        )

        spark = registered
        path = self._stage_history(spark, str(tmp_path / "t"))
        fmt = (
            spark.read.format("vt")
            .option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "3")
            .option("endingVersion", "5")
            .load()
        )
        native = vt_read_changes(spark, path, 2, 5)
        assert self._norm(fmt) == self._norm(native)
        # rename inside the range: renamed column's data keeps flowing
        # under the ending version's name
        assert "amount" in fmt.columns and "x" not in fmt.columns

    def test_option_validation(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 3))

        def rd(**opts):
            r = (
                spark.read.format("vt")
                .option("path", path)
                .option("readChangeFeed", "true")
            )
            for k, v in opts.items():
                r = r.option(k, v)
            return r.load().collect()

        with pytest.raises(Exception, match="startingVersion"):
            rd()
        with pytest.raises(Exception, match="not committed"):
            rd(startingVersion="1", endingVersion="9")
        with pytest.raises(Exception, match="not versionAsOf"):
            rd(startingVersion="1", versionAsOf="1")


class TestTimestampOptions:
    """r14: Delta's timestamp forms of the CDF/stream range options —
    startingTimestamp (lowest version committed at/after, raising past
    the latest commit) and endingTimestamp (highest version committed
    at/before) on the batch reader; startingTimestamp on the stream."""

    def _stage(self, spark, path):
        import time as _t

        from dynamicqueryengine_spark.sources.versioned import (
            _read_manifest,
        )

        vt_write(spark, path, _df(spark, 3))                      # v1
        for i in range(2, 4):                                     # v2, v3
            vt_write(
                spark,
                path,
                spark.createDataFrame(
                    [(100 + i, "gz", float(i))],
                    "id long, g string, x double",
                ),
                mode="append",
            )
        return {
            v: float(_read_manifest(path, v)["ts"]) for v in (1, 2, 3)
        }

    def test_batch_cdf_timestamp_range(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        ts = self._stage(spark, path)
        got = (
            spark.read.format("vt")
            .option("path", path)
            .option("readChangeFeed", "true")
            .option("startingTimestamp", str(ts[2]))
            .option("endingTimestamp", str(ts[2]))
            .load()
            .collect()
        )
        # exactly v2's insert
        assert [(r["id"], r["_commit_version"]) for r in got] == [
            (102, 2)
        ]

    def test_starting_timestamp_after_latest_raises(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        ts = self._stage(spark, path)
        with pytest.raises(Exception, match="after the latest commit"):
            (
                spark.read.format("vt")
                .option("path", path)
                .option("readChangeFeed", "true")
                .option("startingTimestamp", str(ts[3] + 3600))
                .load()
                .collect()
            )
        with pytest.raises(Exception, match="not both"):
            (
                spark.read.format("vt")
                .option("path", path)
                .option("readChangeFeed", "true")
                .option("startingVersion", "1")
                .option("startingTimestamp", str(ts[2]))
                .load()
                .collect()
            )

    def test_stream_starting_timestamp_inclusive(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        ts = self._stage(spark, path)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        q = (
            spark.readStream.format("vt")
            .option("path", path)
            .option("startingTimestamp", str(ts[2]))
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # v2 AND v3 appends (at-or-after is inclusive), no snapshot
        assert sorted(
            r["id"] for r in spark.read.parquet(out).collect()
        ) == [102, 103]


class TestMergeSchemaOption:
    """r14: option("mergeSchema", "true") on format('vt') writes —
    Delta's contract: append may ADD nullable columns, WIDEN along the
    safe lattice, and omit existing columns (readers reconcile with
    typed nulls); incompatible changes still raise."""

    def test_append_adds_column_and_null_fills(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 3))
        evolved = spark.createDataFrame(
            [(100, "gz", 9.0, "note")],
            "id long, g string, x double, note string",
        )
        (
            evolved.write.format("vt")
            .option("path", path)
            .option("mergeSchema", "true")
            .mode("append")
            .save()
        )
        out = vt_read(spark, path)
        assert out.columns == ["id", "g", "x", "note"]
        rows = {r["id"]: r["note"] for r in out.collect()}
        assert rows[100] == "note" and rows[0] is None

    def test_append_missing_column_null_fills_new_rows(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 3))
        partial = spark.createDataFrame(
            [(200, "gm")], "id long, g string"
        )
        (
            partial.write.format("vt")
            .option("path", path)
            .option("mergeSchema", "true")
            .mode("append")
            .save()
        )
        out = vt_read(spark, path)
        assert out.columns == ["id", "g", "x"]
        assert (
            out.filter("id = 200").collect()[0]["x"] is None
        )

    def test_append_widens_table_type(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(1, 2)], "id int, n int"),
        )
        wide = spark.createDataFrame(
            [(2, 3_000_000_000)], "id int, n long"
        )
        (
            wide.write.format("vt")
            .option("path", path)
            .option("mergeSchema", "true")
            .mode("append")
            .save()
        )
        out = vt_read(spark, path)
        assert out.schema["n"].dataType.simpleString() == "bigint"
        assert out.filter("n = 3000000000").count() == 1

    def test_incompatible_change_still_raises(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 3))
        bad = spark.createDataFrame(
            [(1, 2, 3.0)], "id long, g int, x double"
        )
        with pytest.raises(Exception, match="incompatible"):
            (
                bad.write.format("vt")
                .option("path", path)
                .option("mergeSchema", "true")
                .mode("append")
                .save()
            )

    def test_without_option_still_exact_match(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 3))
        evolved = spark.createDataFrame(
            [(1, "g", 1.0, "n")],
            "id long, g string, x double, note string",
        )
        with pytest.raises(Exception, match="mergeSchema"):
            (
                evolved.write.format("vt")
                .option("path", path)
                .mode("append")
                .save()
            )

    def test_replace_where_refuses_merge_schema(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 3))
        with pytest.raises(Exception, match="cannot combine"):
            (
                _df(spark, 1).write.format("vt")
                .option("path", path)
                .option("replaceWhere", "id < 1")
                .option("mergeSchema", "true")
                .mode("overwrite")
                .save()
            )

    def test_streaming_sink_merge_schema(self, registered, tmp_path):
        from dynamicqueryengine_spark.streaming.source import (
            vt_change_stream,
        )

        spark = registered
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        vt_write(spark, dst, _df(spark, 2))
        vt_write(
            spark,
            src,
            spark.createDataFrame(
                [(500, "gs", 5.0, "tag")],
                "id long, g string, x double, note string",
            ),
        )
        q = (
            vt_change_stream(spark, src)
            .select("id", "g", "x", "note")
            .writeStream.format("vt")
            .option("path", dst)
            .option("mergeSchema", "true")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        out = vt_read(spark, dst)
        assert out.columns == ["id", "g", "x", "note"]
        assert out.filter("note = 'tag'").count() == 1
