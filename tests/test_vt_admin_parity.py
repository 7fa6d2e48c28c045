"""Round-12 admin-parity bundle (sources/versioned.py): SQL-expression
CHECK constraints (Delta's ``ADD CONSTRAINT … CHECK``), time-based
vacuum retention (``VACUUM … RETAIN n HOURS``), vacuum dry runs, and
RESTORE TO TIMESTAMP AS OF."""

from __future__ import annotations

import os
import time

import pytest

from dynamicqueryengine_spark.sources.versioned import (
    ConstraintViolation,
    _read_manifest,
    vt_count,
    vt_merge,
    vt_read,
    vt_rename_column,
    vt_restore,
    vt_update,
    vt_vacuum,
    vt_versions,
    vt_write,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, qty long, price double")


class TestExprConstraints:
    def test_expr_check_enforced_on_write_and_append(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spec = [{"name": "qty_price", "kind": "expr",
                 "expr": "qty * price >= 0"}]
        vt_write(spark, path, _df(spark, [(1, 2, 3.0)]), constraints=spec)
        with pytest.raises(ConstraintViolation, match="qty_price"):
            vt_write(
                spark, path, _df(spark, [(2, -5, 3.0)]), mode="append"
            )
        # NULL evaluates unknown -> passes (Delta CHECK semantics)
        vt_write(
            spark, path, _df(spark, [(3, None, 3.0)]), mode="append"
        )
        assert vt_count(spark, path) == 2

    def test_expr_check_enforced_by_merge_and_update(self, spark, tmp_path):
        path = str(tmp_path / "t")
        spec = [{"name": "positive_total", "kind": "expr",
                 "expr": "qty * price >= 0"}]
        vt_write(spark, path, _df(spark, [(1, 2, 3.0)]), constraints=spec)
        with pytest.raises(ConstraintViolation):
            vt_merge(spark, path, _df(spark, [(1, -9, 1.0)]), ["id"])
        with pytest.raises(ConstraintViolation):
            vt_update(
                spark, path, ("id", "=", 1), {"qty": "-1 * qty"}
            )
        got = vt_read(spark, path).collect()
        assert [(r["id"], r["qty"]) for r in got] == [(1, 2)]

    def test_expr_check_blocks_rename_of_referenced_column(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        spec = [{"name": "qp", "kind": "expr", "expr": "qty * price >= 0"}]
        vt_write(spark, path, _df(spark, [(1, 2, 3.0)]), constraints=spec)
        with pytest.raises(ValueError, match="CHECK constraint"):
            vt_rename_column(path, "qty", "quantity")
        # an unreferenced column renames fine
        vt_rename_column(path, "id", "row_id")
        assert vt_read(spark, path).columns == ["row_id", "qty", "price"]

    def test_expr_spec_validation(self, spark, tmp_path):
        path = str(tmp_path / "t")
        with pytest.raises(ValueError, match="needs name and expr"):
            vt_write(
                spark,
                path,
                _df(spark, [(1, 2, 3.0)]),
                constraints=[{"name": "bad", "kind": "expr"}],
            )


class TestVacuumRetention:
    def test_retain_seconds_keeps_recent_versions(self, spark, tmp_path):
        path = str(tmp_path / "t")
        for i in range(4):
            vt_write(
                spark, path, _df(spark, [(i, i, float(i))]),
                mode="append" if i else "overwrite",
            )
        # keep_last=1 would expire versions 1-3; a generous time floor
        # retains everything committed within the window
        removed = vt_vacuum(
            spark, path, keep_last=1, grace_seconds=0,
            retain_seconds=3600.0,
        )
        assert removed == []
        assert vt_versions(path) == [1, 2, 3, 4]
        # a zero-width window falls back to keep_last alone
        removed = vt_vacuum(
            spark, path, keep_last=2, grace_seconds=0,
            retain_seconds=0.0,
        )
        assert vt_versions(path) == [3, 4]
        assert vt_count(spark, path) == 4  # head snapshot intact

    def test_dry_run_reports_without_deleting(self, spark, tmp_path):
        path = str(tmp_path / "t")
        for i in range(3):
            vt_write(
                spark, path, _df(spark, [(i, i, float(i))]),
                mode="append" if i else "overwrite",
            )
        before_dirs = sorted(os.listdir(path))
        before_versions = vt_versions(path)
        would = vt_vacuum(
            spark, path, keep_last=1, grace_seconds=0, dry_run=True
        )
        assert would == []  # appends: every dir still referenced by head
        # an overwrite strands the old dirs -> dry run names them
        vt_write(spark, path, _df(spark, [(9, 9, 9.0)]), mode="overwrite")
        would = vt_vacuum(
            spark, path, keep_last=1, grace_seconds=0, dry_run=True
        )
        assert len(would) == 3
        # nothing deleted, no manifest expired
        assert set(os.listdir(path)) >= set(before_dirs)
        assert vt_versions(path) == before_versions + [4]
        # the real run removes exactly what the dry run promised
        removed = vt_vacuum(spark, path, keep_last=1, grace_seconds=0)
        assert sorted(removed) == sorted(would)


class TestRestoreTimestamp:
    def test_restore_to_timestamp(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, [(1, 1, 1.0)]))
        t_after_v1 = time.time()
        m1 = _read_manifest(path, 1)
        assert float(m1["ts"]) <= t_after_v1
        time.sleep(0.05)
        vt_write(spark, path, _df(spark, [(2, 2, 2.0)]), mode="overwrite")
        v = vt_restore(spark, path, timestamp=t_after_v1)
        assert v == 3
        assert {r["id"] for r in vt_read(spark, path).collect()} == {1}
        with pytest.raises(ValueError, match="not both"):
            vt_restore(spark, path, version=1, timestamp=t_after_v1)
        with pytest.raises(ValueError, match="requires version"):
            vt_restore(spark, path)
