"""Column mapping (sources/versioned.py): RENAME / DROP / metadata-only
ADD COLUMN as zero-rewrite commits — Delta's ``columnMapping.mode=name``
contract (Iceberg's field IDs solve the same problem). The invariant
under test everywhere: the PHYSICAL identity of a column (its on-disk
name, footer stats, blooms, deletion vectors) never changes; only the
logical projection over it does — so every schema DDL commit must
reference the head's data directories verbatim."""

from __future__ import annotations

import json
import os

import pytest

from dynamicqueryengine_spark.sources.versioned import (
    _col_mapping,
    _read_manifest,
    vt_add_column,
    vt_checkpoint,
    vt_clone,
    vt_count,
    vt_delete,
    vt_diff,
    vt_drop_column,
    vt_head,
    vt_history,
    vt_merge,
    vt_minmax,
    vt_optimize,
    vt_read,
    vt_read_changes,
    vt_read_delta,
    vt_rename_column,
    vt_restore,
    vt_scan_plan,
    vt_update,
    vt_vacuum,
    vt_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, user string, val double")


def _rows(df):
    return {tuple(r) for r in df.collect()}


def _base(spark, path, n=20):
    return vt_write(
        spark,
        path,
        _df(spark, [(i, f"u{i % 4}", float(i)) for i in range(n)]),
    )


class TestRenameColumn:
    def test_rename_is_metadata_only(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = _base(spark, path)
        m1 = _read_manifest(path, v1)
        v2 = vt_rename_column(path, "val", "amount")
        m2 = _read_manifest(path, v2)
        # zero data movement: the SAME directories, stats, file lists
        assert m2["dirs"] == m1["dirs"]
        assert m2.get("files") == m1.get("files")
        assert m2.get("file_stats") == m1.get("file_stats")
        # logical schema renamed, physical mapping pins the old name
        assert [f["name"] for f in m2["schema"]["fields"]] == [
            "id", "user", "amount",
        ]
        assert m2["column_mapping"]["amount"] == "val"
        assert vt_read(spark, path).columns == ["id", "user", "amount"]

    def test_values_survive_and_old_versions_keep_old_name(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        v1 = _base(spark, path, n=10)
        vt_rename_column(path, "val", "amount")
        got = vt_read(spark, path)
        assert got.agg({"amount": "sum"}).collect()[0][0] == sum(range(10))
        # time travel: each manifest records its own schema
        old = vt_read(spark, path, version=v1)
        assert old.columns == ["id", "user", "val"]
        assert old.agg({"val": "sum"}).collect()[0][0] == sum(range(10))

    def test_renamed_predicate_prunes_files(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=100)
        vt_optimize(spark, path, ["val"], n_partitions=4)
        vt_rename_column(path, "val", "amount")
        plan = vt_scan_plan(path, None, ("amount", ">=", 90.0))
        assert plan["files_kept"] < plan["files_total"]
        r = vt_read(spark, path, predicate=("amount", ">=", 90.0))
        assert r.count() == 10

    def test_metadata_minmax_and_count_after_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=50)
        vt_rename_column(path, "val", "amount")
        assert vt_minmax(spark, path, "amount") == (0.0, 49.0)
        assert vt_count(spark, path) == 50

    def test_rename_validation(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path)
        with pytest.raises(ValueError, match="no column"):
            vt_rename_column(path, "nope", "x")
        with pytest.raises(ValueError, match="already exists"):
            vt_rename_column(path, "val", "user")
        with pytest.raises(ValueError, match="reserved"):
            vt_rename_column(path, "val", "_change_type")

    def test_rename_refuses_constrained_column(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            _df(spark, [(1, "a", 1.0)]),
            constraints=[
                {"name": "val_pos", "kind": "range", "col": "val", "lo": 0}
            ],
        )
        with pytest.raises(ValueError, match="CHECK constraint"):
            vt_rename_column(path, "val", "amount")
        # unconstrained columns still rename fine
        vt_rename_column(path, "user", "who")
        assert vt_read(spark, path).columns == ["id", "who", "val"]

    def test_bloom_cols_property_follows_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            _df(spark, [(i, f"u{i}", float(i)) for i in range(20)]),
            bloom_cols=["user"],
        )
        v = vt_rename_column(path, "user", "who")
        m = _read_manifest(path, v)
        assert m["bloom_cols"] == ["who"]
        # the bloom entries themselves stay physical ("user") and the
        # probe still prunes through the renamed predicate
        plan = vt_scan_plan(path, None, ("who", "=", "u3"))
        assert plan["files_kept"] <= plan["files_total"]
        assert _rows(
            vt_read(spark, path, predicate=("who", "=", "u3"))
        ) == {(3, "u3", 3.0)}


class TestDropAndAddColumn:
    def test_drop_is_metadata_only_and_hides_data(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = _base(spark, path)
        m1 = _read_manifest(path, v1)
        v2 = vt_drop_column(path, "user")
        m2 = _read_manifest(path, v2)
        assert m2["dirs"] == m1["dirs"]  # no rewrite
        assert vt_read(spark, path).columns == ["id", "val"]
        # time travel still serves the dropped column
        assert vt_read(spark, path, version=v1).columns == [
            "id", "user", "val",
        ]

    def test_dropped_column_cannot_resurrect(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=10)
        vt_drop_column(path, "user")
        vt_add_column(path, "user", "string")
        # fresh physical name: every pre-existing row reads NULL
        assert (
            vt_read(spark, path).filter("user is not null").count() == 0
        )
        # and a later append CAN fill it
        app = spark.createDataFrame(
            [(100, 100.0, "fresh")], "id long, val double, user string"
        )
        vt_write(spark, path, app, mode="append")
        assert (
            _rows(vt_read(spark, path).filter("user is not null"))
            == {(100, 100.0, "fresh")}
        )

    def test_add_column_is_nullable_typed(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=5)
        vt_add_column(path, "score", "bigint")
        got = vt_read(spark, path)
        assert dict(got.dtypes)["score"] == "bigint"
        assert got.filter("score is not null").count() == 0

    def test_drop_validation(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path)
        with pytest.raises(ValueError, match="no column"):
            vt_drop_column(path, "nope")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(1,)], "only long"),
            mode="overwrite",
        )
        with pytest.raises(ValueError, match="only column"):
            vt_drop_column(path, "only")

    def test_drop_refuses_constrained_column(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            _df(spark, [(1, "a", 1.0)]),
            constraints=[{"name": "u_nn", "kind": "not_null", "col": "user"}],
        )
        with pytest.raises(ValueError, match="CHECK constraint"):
            vt_drop_column(path, "user")


class TestMappedDml:
    """The full DML triad against a renamed table: predicates arrive in
    LOGICAL names, footer stats/blooms are PHYSICAL-keyed — these pin
    the translation at every classification boundary."""

    def test_delete_update_merge_after_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=100)
        vt_optimize(spark, path, ["val"], n_partitions=4)
        vt_rename_column(path, "val", "amount")
        vt_delete(spark, path, predicate=("amount", "<", 10.0))
        assert vt_count(spark, path) == 90
        vt_update(
            spark,
            path,
            predicate=("amount", ">=", 95.0),
            assignments={"user": "'vip'"},
        )
        assert vt_read(spark, path).filter("user = 'vip'").count() == 5
        ups = spark.createDataFrame(
            [(500, "nu", 500.0), (50, "replaced", 50.0)],
            "id long, user string, amount double",
        )
        vt_merge(spark, path, ups, ["id"])
        got = vt_read(spark, path)
        # 100 − 10 deleted + 1 inserted (id=500); id=50 replaced in place
        assert got.count() == 91
        assert _rows(got.filter("id = 50")) == {(50, "replaced", 50.0)}

    def test_file_granular_delete_prunes_by_physical_stats(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        _base(spark, path, n=100)
        vt_optimize(spark, path, ["val"], n_partitions=4)
        vt_rename_column(path, "val", "amount")
        v = vt_delete(spark, path, predicate=("amount", ">=", 90.0))
        blob = _read_manifest(path, v)["delete"]
        # the classifier must keep pruning through the rename: a
        # 10%-tail delete on a 4-file clustered layout touches ~1 file
        assert blob["files_rewritten"] + blob.get("files_dropped", 0) < 4

    def test_dv_delete_after_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=100)
        vt_optimize(spark, path, ["val"], n_partitions=4)
        vt_rename_column(path, "val", "amount")
        v = vt_delete(
            spark, path, predicate=("amount", "=", 42.0), mode="dv"
        )
        blob = _read_manifest(path, v)["delete"]
        assert blob["files_rewritten"] == 0 and blob["dv"] is True
        assert vt_count(spark, path) == 99
        assert (
            vt_read(spark, path).filter("amount = 42.0").count() == 0
        )
        # reorg-purge and the DV read both work over the mapped files
        got = vt_read(spark, path, predicate=("amount", "<", 5.0))
        assert got.count() == 5

    def test_update_dv_after_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=50)
        vt_rename_column(path, "val", "amount")
        v = vt_update(
            spark,
            path,
            predicate=("amount", "=", 7.0),
            assignments={"amount": "amount + 1000"},
            mode="dv",
        )
        assert _read_manifest(path, v)["update"]["files_rewritten"] == 0
        assert (
            vt_read(spark, path).filter("amount = 1007.0").count() == 1
        )

    def test_merge_with_bloom_cols_after_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            _df(spark, [(i, f"u{i}", float(i)) for i in range(30)]),
            bloom_cols=["id"],
        )
        vt_rename_column(path, "val", "amount")
        ups = spark.createDataFrame(
            [(3, "hit", 3.0)], "id long, user string, amount double"
        )
        v = vt_merge(spark, path, ups, ["id"])
        m = _read_manifest(path, v)
        # the appended/rewritten dir keeps harvesting blooms (physical
        # key "id" is unmapped here, but the path must not break)
        assert m.get("bloom_cols") == ["id"]
        assert _rows(vt_read(spark, path).filter("id = 3")) == {
            (3, "hit", 3.0)
        }


class TestMappedCdcAndStreams:
    def test_change_feed_relabels_across_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = _base(spark, path, n=6)
        vt_rename_column(path, "val", "amount")
        vt_delete(spark, path, predicate=("amount", "=", 3.0))
        head = vt_head(path)
        ch = vt_read_changes(spark, path, 0, head)
        # everything arrives in the TO version's (renamed) schema
        assert ch.columns == [
            "id", "user", "amount", "_change_type", "_commit_version",
        ]
        by_type = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type").count()
            .withColumnRenamed("count", "n").collect()
        }
        assert by_type == {"insert": 6, "delete": 1}
        # the pre-rename insert rows carry their values under the NEW
        # name — physical identity, not label, routes the data
        ins = ch.filter("_change_type = 'insert'")
        assert ins.agg({"amount": "sum"}).collect()[0][0] == sum(range(6))
        assert v1 == 1

    def test_change_feed_delete_after_rename_with_feed(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        _base(spark, path, n=6)
        vt_rename_column(path, "val", "amount")
        vt_update(
            spark,
            path,
            predicate=("amount", "=", 2.0),
            assignments={"amount": "amount * 10"},
            change_feed=True,
        )
        ch = vt_read_changes(spark, path, 2, vt_head(path))
        post = ch.filter("_change_type = 'update_postimage'")
        assert _rows(post.select("id", "amount")) == {(2, 20.0)}

    def test_stream_source_across_rename(self, spark, tmp_path):
        from dynamicqueryengine_spark.streaming.source import (
            vt_change_stream,
        )

        path = str(tmp_path / "t")
        _base(spark, path, n=6)
        vt_rename_column(path, "val", "amount")
        vt_delete(spark, path, predicate=("amount", "=", 3.0))
        stream = vt_change_stream(spark, path)
        q = (
            stream.writeStream.format("memory")
            .queryName("cm_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from cm_stream")
        assert got.columns == [
            "id", "user", "amount", "_change_type", "_commit_version",
        ]
        # the replayed delete (predicate recorded logically, files
        # physical) must surface exactly the deleted row
        assert _rows(
            got.filter("_change_type = 'delete'").select("id", "amount")
        ) == {(3, 3.0)}
        assert got.filter("_change_type = 'insert'").count() == 6

    def test_read_delta_spans_schema_ops(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = _base(spark, path, n=3)
        v2 = vt_rename_column(path, "val", "amount")
        v3 = vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(100, "x", 100.0)], "id long, user string, amount double"
            ),
            mode="append",
        )
        delta = vt_read_delta(spark, path, v1, v3)
        assert _rows(delta) == {(100, "x", 100.0)}
        assert v2 == 2


class TestMappedLifecycle:
    def test_protocol_gates_mapping_blind_engines(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path)
        v = vt_rename_column(path, "val", "amount")
        m = _read_manifest(path, v)
        assert m["protocol"] == {"min_reader": 3, "min_writer": 3}
        # a level-2 reader must refuse rather than serve stale names
        import dynamicqueryengine_spark.sources.versioned as V

        orig = V._PROTOCOL_READER
        V._PROTOCOL_READER = 2
        try:
            with pytest.raises(ValueError, match="reader protocol"):
                _read_manifest(path, v)
        finally:
            V._PROTOCOL_READER = orig

    def test_overwrite_resets_to_identity_format(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path)
        vt_rename_column(path, "val", "amount")
        v = vt_write(
            spark,
            path,
            spark.createDataFrame([(1, 1.0)], "id long, amount double"),
            mode="overwrite",
        )
        m = _read_manifest(path, v)
        assert _col_mapping(m) is None  # fresh files, no indirection
        assert "protocol" not in m or m["protocol"].get("min_reader", 1) < 3
        assert _rows(vt_read(spark, path)) == {(1, 1.0)}

    def test_restore_past_rename_restores_old_names(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = _base(spark, path, n=4)
        vt_rename_column(path, "val", "amount")
        v3 = vt_restore(spark, path, v1)
        m = _read_manifest(path, v3)
        assert _col_mapping(m) is None
        assert vt_read(spark, path).columns == ["id", "user", "val"]

    def test_clone_carries_mapping(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=4)
        vt_rename_column(path, "val", "amount")
        dst = str(tmp_path / "c")
        vt_clone(spark, path, dst)
        assert vt_read(spark, dst).columns == ["id", "user", "amount"]
        assert (
            vt_read(spark, dst).agg({"amount": "sum"}).collect()[0][0]
            == sum(range(4))
        )

    def test_optimize_and_vacuum_keep_mapping(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=40)
        vt_rename_column(path, "val", "amount")
        vt_optimize(spark, path, ["amount"], n_partitions=2)
        vt_vacuum(spark, path, keep_last=1)
        got = vt_read(spark, path)
        assert got.columns == ["id", "user", "amount"]
        assert got.agg({"amount": "sum"}).collect()[0][0] == sum(range(40))
        # optimize rewrote under the PHYSICAL name: the mapping is
        # still in force and still correct
        plan = vt_scan_plan(path, None, ("amount", ">=", 38.0))
        assert plan["files_kept"] < plan["files_total"]

    def test_checkpoint_and_history_cover_schema_ops(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path)
        vt_rename_column(path, "val", "amount")
        vt_drop_column(path, "user")
        vt_add_column(path, "tag", "string")
        vt_checkpoint(spark, path)
        assert vt_head(path) == 4
        ops = [h["op"] for h in vt_history(path)]
        assert ops[:3] == ["add_column", "drop_column", "rename_column"]
        blobs = {h["op"]: h for h in vt_history(path)}
        assert blobs["rename_column"]["rename_column"] == {
            "from": "val", "to": "amount", "physical": "val",
        }

    def test_diff_reports_rename_not_add_remove(self, spark, tmp_path):
        path = str(tmp_path / "t")
        v1 = _base(spark, path, n=10)
        v2 = vt_rename_column(path, "val", "amount")
        d = vt_diff(path, v1, v2)
        assert d["columns_added"] == [] and d["columns_removed"] == []
        assert d["columns_renamed"] == {"val": "amount"}
        # min/max drift keyed by the NEW logical name, served from the
        # UNCHANGED physical stats
        assert d["minmax"]["amount"]["old"] == d["minmax"]["amount"]["new"]

    def test_double_rename_round_trip(self, spark, tmp_path):
        path = str(tmp_path / "t")
        _base(spark, path, n=5)
        vt_rename_column(path, "val", "amount")
        vt_rename_column(path, "amount", "val")  # back to the original
        got = vt_read(spark, path)
        assert got.columns == ["id", "user", "val"]
        assert got.agg({"val": "sum"}).collect()[0][0] == sum(range(5))

    def test_append_evolution_under_mapping_gets_fresh_physical(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        _base(spark, path, n=3)
        vt_rename_column(path, "val", "amount")
        app = spark.createDataFrame(
            [(9, "x", 9.0, "extra")],
            "id long, user string, amount double, note string",
        )
        v = vt_write(spark, path, app, mode="append", merge_schema=True)
        m = _read_manifest(path, v)
        cm = _col_mapping(m)
        assert cm["amount"] == "val"
        assert cm["note"] != "note" and cm["note"].startswith("note_")
        got = vt_read(spark, path)
        assert got.filter("note = 'extra'").count() == 1
        assert got.filter("note is null").count() == 3


class TestTypeWidening:
    """vt_widen_column + merge_schema auto-widening (Delta's
    typeWidening): declared types move along the safe lattice with ZERO
    file rewrites — the explicit-schema read upcasts narrow files at
    scan."""

    def test_widen_is_metadata_only(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, float(i)) for i in range(10)], "id int, x float"
        )
        v1 = vt_write(spark, path, df)
        v2 = vt_widen_column(path, "id", "bigint")
        v3 = vt_widen_column(path, "x", "double")
        m1, m3 = _read_manifest(path, v1), _read_manifest(path, v3)
        assert m3["dirs"] == m1["dirs"]  # no rewrite
        got = vt_read(spark, path)
        assert dict(got.dtypes) == {"id": "bigint", "x": "double"}
        assert got.agg({"x": "sum"}).collect()[0][0] == sum(range(10))
        # time travel serves the narrow types
        assert dict(vt_read(spark, path, v1).dtypes)["id"] == "int"
        assert v2 == 2

    def test_wide_values_land_after_widen(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(1, 1.0)], "id int, x double"),
        )
        vt_widen_column(path, "id", "bigint")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(2**40, 2.0)], "id bigint, x double"),
            mode="append",
        )
        assert vt_count(spark, path) == 2
        assert vt_minmax(spark, path, "id") == (1, 2**40)

    def test_merge_schema_auto_widens(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(1, 1.0)], "id int, x double"),
        )
        # wider incoming widens the TABLE
        vt_write(
            spark,
            path,
            spark.createDataFrame([(2**40, 2.0)], "id bigint, x double"),
            mode="append",
            merge_schema=True,
        )
        assert dict(vt_read(spark, path).dtypes)["id"] == "bigint"
        # narrower incoming needs NO flag: store assignment (Delta's
        # implicit safe cast) upcasts it at write
        vt_write(
            spark,
            path,
            spark.createDataFrame([(7, 3.0)], "id int, x double"),
            mode="append",
        )
        got = vt_read(spark, path)
        assert dict(got.dtypes)["id"] == "bigint"
        assert {r["id"] for r in got.collect()} == {1, 2**40, 7}
        # a WIDER incoming type without the flag still raises (that is
        # schema evolution, not store assignment)
        t2 = path + "_narrow"
        vt_write(
            spark,
            t2,
            spark.createDataFrame([(1, 1.0)], "id int, x double"),
        )
        with pytest.raises(ValueError, match="merge_schema"):
            vt_write(
                spark,
                t2,
                spark.createDataFrame(
                    [(2**40, 4.0)], "id bigint, x double"
                ),
                mode="append",
            )

    def test_narrowing_and_unrelated_changes_raise(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(2**40, "s")], "id bigint, v string"),
        )
        with pytest.raises(ValueError, match="cannot widen"):
            vt_widen_column(path, "id", "int")
        with pytest.raises(ValueError, match="cannot widen"):
            vt_widen_column(path, "v", "bigint")
        # a narrower append upcasts silently (store assignment)
        vt_write(
            spark,
            path,
            spark.createDataFrame([(1, "x")], "id int, v string"),
            mode="append",
        )
        assert vt_count(spark, path) == 2
        # a genuinely incompatible change raises EVEN WITH merge_schema
        with pytest.raises(ValueError, match="incompatible type change"):
            vt_write(
                spark,
                path,
                spark.createDataFrame(
                    [("oops", "x")], "id string, v string"
                ),
                mode="append",
                merge_schema=True,
            )

    def test_decimal_growth(self, spark, tmp_path):
        from decimal import Decimal

        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(1, Decimal("1.25"))], "id long, d decimal(10,2)"
            ),
        )
        vt_widen_column(path, "d", "decimal(22,4)")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(2, Decimal("123456789012345678.2500"))],
                "id long, d decimal(22,4)",
            ),
            mode="append",
        )
        got = {r["id"]: r["d"] for r in vt_read(spark, path).collect()}
        assert got[1] == Decimal("1.2500")
        assert got[2] == Decimal("123456789012345678.2500")
        # scale shrink / integer-digit shrink refuse
        with pytest.raises(ValueError, match="cannot widen"):
            vt_widen_column(path, "d", "decimal(22,2)")

    def test_widen_composes_with_mapping_and_dml(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_delete,
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(i, float(i)) for i in range(30)], "id int, x float"
            ),
        )
        vt_widen_column(path, "id", "bigint")
        vt_rename_column(path, "x", "amount")
        vt_widen_column(path, "amount", "double")
        vt_delete(spark, path, predicate=("id", "<", 5), mode="dv")
        got = vt_read(spark, path)
        assert dict(got.dtypes) == {"id": "bigint", "amount": "double"}
        assert got.count() == 25
        assert (
            got.agg({"amount": "sum"}).collect()[0][0]
            == sum(range(5, 30))
        )

    def test_cdc_and_delta_span_widen(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        v1 = vt_write(
            spark,
            path,
            spark.createDataFrame([(1, 1.0)], "id int, x double"),
        )
        v2 = vt_widen_column(path, "id", "bigint")
        v3 = vt_write(
            spark,
            path,
            spark.createDataFrame([(2**40, 2.0)], "id bigint, x double"),
            mode="append",
        )
        delta = vt_read_delta(spark, path, v1, v3)
        assert {r["id"] for r in delta.collect()} == {2**40}
        ch = vt_read_changes(spark, path, 0, v3)
        # pre-widen insert rows arrive upcast to the TO schema
        assert dict(ch.dtypes)["id"] == "bigint"
        assert {
            (r["_change_type"], r["id"]) for r in ch.collect()
        } == {("insert", 1), ("insert", 2**40)}
        assert v2 == 2


class TestStreamAcrossWiden:
    def test_stream_source_upcasts_pre_widen_files(self, spark, tmp_path):
        """The streaming source's per-partition pyarrow cast must serve
        pre-widen int32 files as the stream schema's bigint — and a
        post-widen append carrying true 64-bit values lands exactly."""
        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )
        from dynamicqueryengine_spark.streaming.source import (
            vt_change_stream,
        )

        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(1, "a"), (2, "b")], "id int, v string"),
        )
        vt_widen_column(path, "id", "bigint")
        vt_write(
            spark,
            path,
            spark.createDataFrame([(2**40, "c")], "id bigint, v string"),
            mode="append",
        )
        stream = vt_change_stream(spark, path)
        q = (
            stream.writeStream.format("memory")
            .queryName("widen_stream")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("select * from widen_stream")
        assert dict(got.dtypes)["id"] == "bigint"
        assert {
            (r["id"], r["v"], r["_change_type"]) for r in got.collect()
        } == {
            (1, "a", "insert"),
            (2, "b", "insert"),
            (2**40, "c", "insert"),
        }


class TestDdlConcurrency:
    def test_rename_raced_by_append_retries_and_lands(
        self, spark, tmp_path, monkeypatch
    ):
        """A rename losing its commit race to an append must retry on
        the advanced head (metadata-only commits are derivable from any
        head) — both land, and the appended rows serve under the new
        name."""
        import dynamicqueryengine_spark.sources.versioned as V

        path = str(tmp_path / "t")
        _base(spark, path, n=4)
        real = V._read_manifest
        injected = []

        def racing(p, v, _real=real):
            m = _real(p, v)
            if not injected and v == 1:
                injected.append(True)
                vt_write(
                    spark,
                    path,
                    _df(spark, [(100, "x", 100.0)]),
                    mode="append",
                )
            return m

        monkeypatch.setattr(V, "_read_manifest", racing)
        try:
            v = vt_rename_column(path, "val", "amount")
        finally:
            monkeypatch.setattr(V, "_read_manifest", real)
        assert v == 3  # append won 2, rename retried onto 3
        got = vt_read(spark, path)
        assert got.columns == ["id", "user", "amount"]
        assert got.filter("amount = 100.0").count() == 1

    def test_full_stack_composition_clone_of_mapped_widened_dv_table(
        self, spark, tmp_path
    ):
        """Every r12 storage feature stacked on one table, then cloned:
        rename + widen + DV delete + generated column + checkpoint —
        the shallow clone must serve the identical logical snapshot."""
        from dynamicqueryengine_spark.sources.versioned import (
            vt_widen_column,
        )

        path = str(tmp_path / "t")
        df = spark.createDataFrame(
            [(i, i, float(i)) for i in range(20)],
            "id int, qty long, price double",
        )
        vt_write(spark, path, df, generated={"total": "qty * 2"})
        vt_widen_column(path, "id", "bigint")
        # price is NOT referenced by the generated expr, so it renames;
        # qty (referenced) would refuse — the guard has its own test
        vt_rename_column(path, "price", "amount")
        vt_delete(spark, path, ("id", "=", 7), mode="dv")
        vt_checkpoint(spark, path, consolidate_dv=True)
        dst = str(tmp_path / "c")
        vt_clone(spark, path, dst)
        for p in (path, dst):
            got = vt_read(spark, p)
            assert got.columns == ["id", "qty", "amount", "total"]
            assert dict(got.dtypes)["id"] == "bigint"
            assert got.count() == 19
            assert got.filter("id = 7").count() == 0
            assert got.filter("total != qty * 2").count() == 0
        assert vt_count(spark, dst) == 19  # metadata count on the clone


class TestNestedRename:
    """r14 (verdict ask #4): struct-leaf renames are metadata-only —
    the mapping records full dotted logical → physical paths, readers
    request physical leaf names and relabel positionally (JVM cast) or
    by physical-name matching (Arrow readers)."""

    def _table(self, spark, path):
        from pyspark.sql import functions as F  # noqa: F401

        df = spark.createDataFrame(
            [(1, (10, "a")), (2, (20, "b")), (3, (30, "c"))],
            "id long, payload struct<v:int, w:string>",
        )
        vt_write(spark, path, df)
        return vt_rename_column(path, "payload.v", "val")

    def test_rename_read_append_and_time_travel(self, spark, tmp_path):
        from pyspark.sql import functions as F

        path = str(tmp_path / "t")
        v = self._table(spark, path)
        m = _read_manifest(path, v)
        assert m["column_mapping"]["payload.val"] == "payload.v"
        out = vt_read(spark, path)
        assert out.schema["payload"].dataType.fieldNames() == [
            "val", "w"
        ]
        assert out.filter(F.col("payload.val") > 15).count() == 2
        # appends carry the LOGICAL leaf; files get the physical one
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(4, (40, "d"))],
                "id long, payload struct<val:int, w:string>",
            ),
            mode="append",
        )
        got = sorted(
            (r["id"], r["payload"]["val"])
            for r in vt_read(spark, path).collect()
        )
        assert got == [(1, 10), (2, 20), (3, 30), (4, 40)]
        # the appended file's struct child is PHYSICALLY named v
        import glob

        import pyarrow.parquet as pq

        m2 = _read_manifest(path, vt_head(path))
        new_dir = [d for d in m2["dirs"] if d not in m["dirs"]][0]
        fp = glob.glob(os.path.join(path, new_dir, "*.parquet"))[0]
        sch = pq.read_schema(fp)
        assert sch.field("payload").type.field(0).name == "v"
        # time travel serves the OLD leaf name
        old = vt_read(spark, path, version=1)
        assert old.schema["payload"].dataType.fieldNames() == [
            "v", "w"
        ]

    def test_format_reader_change_feed_and_stream(
        self, spark, tmp_path
    ):
        from dynamicqueryengine_spark.sources.datasource import (
            vt_register,
        )

        vt_register(spark)
        path = str(tmp_path / "t")
        self._table(spark, path)
        vt_delete(spark, path, ("id", "=", 2), mode="dv")
        fmt = spark.read.format("vt").option("path", path).load()
        assert fmt.schema["payload"].dataType.fieldNames() == [
            "val", "w"
        ]
        assert sorted(
            (r["id"], r["payload"]["val"]) for r in fmt.collect()
        ) == [(1, 10), (3, 30)]
        # batch CDF reconciles the pre-rename insert files to the
        # ending version's leaf names
        cdf = (
            spark.read.format("vt")
            .option("path", path)
            .option("readChangeFeed", "true")
            .option("startingVersion", "1")
            .load()
        )
        ins = {
            (r["id"], r["payload"]["val"])
            for r in cdf.filter("_change_type = 'insert'").collect()
        }
        assert ins == {(1, 10), (2, 20), (3, 30)}
        native = vt_read_changes(spark, path, 0, vt_head(path))
        assert sorted(tuple(r) for r in cdf.collect()) == sorted(
            tuple(r) for r in native.collect()
        )

    def test_no_resurrection_readd_refused(self, spark, tmp_path):
        """rename payload.v→val, then try to re-add a child named v
        via merge_schema: refused (struct children cannot be added
        post-hoc — _can_widen requires identical field-name lists), so
        a renamed-away leaf's bytes can never be re-addressed under a
        re-added logical name. The no-resurrection property holds
        structurally."""
        path = str(tmp_path / "t")
        self._table(spark, path)
        with pytest.raises(ValueError, match="incompatible type"):
            vt_write(
                spark,
                path,
                spark.createDataFrame(
                    [(4, (40, "d", 99))],
                    "id long, payload struct<val:int, w:string, v:int>",
                ),
                mode="append",
                merge_schema=True,
            )
        # table unchanged, original leaf intact
        assert {
            r["id"]: r["payload"]["val"]
            for r in vt_read(spark, path).collect()
        } == {1: 10, 2: 20, 3: 30}

    def test_struct_node_and_deep_leaf_rename(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(1, ((5, "x"),))],
                "id long, a struct<b:struct<c:int, d:string>>",
            ),
        )
        vt_rename_column(path, "a.b.c", "cc")
        vt_rename_column(path, "a.b", "bb")  # struct node rename
        m = _read_manifest(path, vt_head(path))
        assert m["column_mapping"]["a.bb"] == "a.b"
        assert m["column_mapping"]["a.bb.cc"] == "a.b.c"
        out = vt_read(spark, path)
        assert out.collect()[0]["a"]["bb"]["cc"] == 5
        # top-level rename re-prefixes the dotted entries
        vt_rename_column(path, "a", "z")
        m2 = _read_manifest(path, vt_head(path))
        assert m2["column_mapping"]["z.bb.cc"] == "a.b.c"
        assert vt_read(spark, path).collect()[0]["z"]["bb"]["cc"] == 5

    def test_dml_maintenance_and_drop_under_nested_rename(
        self, spark, tmp_path
    ):
        from dynamicqueryengine_spark.sources.versioned import (
            vt_compact,
        )

        path = str(tmp_path / "t")
        self._table(spark, path)
        vt_merge(
            spark,
            path,
            spark.createDataFrame(
                [(2, (200, "B")), (9, (90, "z"))],
                "id long, payload struct<val:int, w:string>",
            ),
            ["id"],
        )
        got = {
            r["id"]: r["payload"]["val"]
            for r in vt_read(spark, path).collect()
        }
        assert got == {1: 10, 2: 200, 3: 30, 9: 90}
        vt_compact(spark, path)
        assert {
            r["id"]: r["payload"]["val"]
            for r in vt_read(spark, path).collect()
        } == got
        # dropping the whole column expires its dotted entries
        vt_drop_column(path, "payload")
        m = _read_manifest(path, vt_head(path))
        assert not any("." in k for k in m["column_mapping"])
        assert vt_read(spark, path).columns == ["id"]

    def test_refusals(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(1, (2, 3), [1, 2])],
                "id long, p struct<a:int, b:int>, arr array<int>",
            ),
            constraints=[
                {"name": "pa", "kind": "expr", "expr": "p.a > 0"}
            ],
        )
        with pytest.raises(ValueError, match="NEW LEAF NAME"):
            vt_rename_column(path, "p.b", "p.c")
        with pytest.raises(ValueError, match="already exists"):
            vt_rename_column(path, "p.b", "a")
        with pytest.raises(ValueError, match="missing segment"):
            vt_rename_column(path, "p.nope", "x")
        with pytest.raises(ValueError, match="struct nesting"):
            vt_rename_column(path, "arr.x", "y")
        with pytest.raises(ValueError, match="CHECK constraint"):
            vt_rename_column(path, "p.a", "aa")
        # the un-constrained sibling renames fine
        vt_rename_column(path, "p.b", "bb")
        assert vt_read(spark, path).schema[
            "p"
        ].dataType.fieldNames() == ["a", "bb"]


class TestNestedAddDrop:
    """r14: nested column mapping completed — metadata-only ADD/DROP of
    struct children (vt_add_column / vt_drop_column with dotted paths),
    fresh physical leaves on add so dropped/renamed-away bytes can
    never resurrect."""

    def test_nested_add_is_metadata_only_with_fresh_physical(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(1, (10, "a"))],
                "id long, payload struct<v:int, w:string>",
            ),
        )
        dirs1 = _read_manifest(path, 1)["dirs"]
        v = vt_add_column(path, "payload.note", "string")
        m = _read_manifest(path, v)
        assert m["dirs"] == dirs1  # zero data movement
        fresh = m["column_mapping"]["payload.note"]
        assert fresh.startswith("payload.note_") and fresh != (
            "payload.note"
        )
        out = vt_read(spark, path)
        assert out.schema["payload"].dataType.fieldNames() == [
            "v", "w", "note"
        ]
        assert out.collect()[0]["payload"]["note"] is None
        # appends carry the logical leaf; the file gets the fresh
        # physical name
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(2, (20, "b", "hello"))],
                "id long, payload struct<v:int, w:string, note:string>",
            ),
            mode="append",
        )
        rows = {
            r["id"]: r["payload"]["note"]
            for r in vt_read(spark, path).collect()
        }
        assert rows == {1: None, 2: "hello"}
        import glob

        import pyarrow.parquet as pq

        m2 = _read_manifest(path, vt_head(path))
        new_dir = [d for d in m2["dirs"] if d not in dirs1][0]
        fp = glob.glob(os.path.join(path, new_dir, "*.parquet"))[0]
        pl = pq.read_schema(fp).field("payload").type
        assert pl.field(2).name == fresh.rsplit(".", 1)[-1]

    def test_nested_drop_and_no_resurrection_readd(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(1, (10, "secret"))],
                "id long, payload struct<v:int, w:string>",
            ),
        )
        v = vt_drop_column(path, "payload.w")
        out = vt_read(spark, path)
        assert out.schema["payload"].dataType.fieldNames() == ["v"]
        # time travel still serves the dropped child
        old = vt_read(spark, path, version=1)
        assert old.collect()[0]["payload"]["w"] == "secret"
        # re-adding the same logical name gets FRESH bytes, not the old
        vt_add_column(path, "payload.w", "string")
        m = _read_manifest(path, vt_head(path))
        assert m["column_mapping"]["payload.w"] != "payload.w"
        got = vt_read(spark, path).collect()[0]["payload"]
        assert got["v"] == 10 and got["w"] is None  # NOT "secret"
        # format reader agrees
        from dynamicqueryengine_spark.sources.datasource import (
            vt_register,
        )

        vt_register(spark)
        fmt = spark.read.format("vt").option("path", path).load()
        assert fmt.collect()[0]["payload"]["w"] is None
        assert _read_manifest(path, v)["drop_column"]["column"] == (
            "payload.w"
        )

    def test_nested_add_drop_refusals(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(1, (10,))], "id long, p struct<v:int>"
            ),
        )
        with pytest.raises(ValueError, match="already exists"):
            vt_add_column(path, "p.v", "int")
        with pytest.raises(ValueError, match="missing segment"):
            vt_add_column(path, "q.x", "int")
        with pytest.raises(ValueError, match="only child"):
            vt_drop_column(path, "p.v")
        with pytest.raises(ValueError, match="no nested field"):
            vt_drop_column(path, "p.nope")
