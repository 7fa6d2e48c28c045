"""Data-quality constraint checker (functions/constraints.py): planted
violations are counted exactly, clean data passes, and the SQL mirror
computes identical reports."""

from __future__ import annotations

import duckdb
import pytest

from dynamicqueryengine_spark.functions.constraints import (
    constraint_report,
    constraint_report_sql,
)

ROWS = [
    # (id, line, flag, qty, code)
    (1, 1, "A", 5.0, "ok_1"),
    (1, 2, "N", 0.5, "ok_2"),      # qty below range
    (2, 1, "X", 3.0, "bad code"),  # bad domain, regex violation
    (2, 1, "R", 2.0, "ok_3"),      # duplicate (id, line) key
    (None, 9, "R", None, "ok_4"),  # null id; null qty passes range
    (99, 1, "A", 1.0, "ok_5"),     # orphan id (not in parent)
]
PARENT = [(1,), (2,), (3,)]


def _spec(parent):
    return [
        {"name": "id_complete", "kind": "not_null", "col": "id"},
        {"name": "qty_range", "kind": "range", "col": "qty", "lo": 1.0, "hi": 10.0},
        {"name": "flag_domain", "kind": "accepted_values", "col": "flag",
         "values": ["A", "N", "R"]},
        {"name": "code_regex", "kind": "regex", "col": "code",
         "pattern": "^ok_[0-9]+$"},
        {"name": "pk_unique", "kind": "unique", "cols": ["id", "line"]},
        {"name": "parent_fk", "kind": "foreign_key", "cols": ["id"],
         **parent},
    ]


class TestConstraintReport:
    def test_planted_violations_counted_exactly(self, spark):
        df = spark.createDataFrame(
            ROWS, "id long, line long, flag string, qty double, code string"
        )
        parent = spark.createDataFrame(PARENT, "pid long")
        got = {
            r["name"]: (r["n_checked"], r["n_violations"], r["passed"])
            for r in constraint_report(
                df, _spec({"parent": parent, "parent_cols": ["pid"]})
            ).collect()
        }
        assert got["id_complete"] == (6, 1, False)
        assert got["qty_range"] == (6, 1, False)     # NULL qty passes
        assert got["flag_domain"] == (6, 1, False)
        assert got["code_regex"] == (6, 1, False)
        assert got["pk_unique"] == (6, 1, False)     # one extra row on (2,1)
        # FK checks only non-null keys: 5 checked, id=99 orphan
        assert got["parent_fk"] == (5, 1, False)

    def test_clean_data_passes_everything(self, spark):
        clean = [(1, 1, "A", 5.0, "ok_1"), (2, 1, "N", 2.0, "ok_2")]
        df = spark.createDataFrame(
            clean, "id long, line long, flag string, qty double, code string"
        )
        parent = spark.createDataFrame(PARENT, "pid long")
        rows = constraint_report(
            df, _spec({"parent": parent, "parent_cols": ["pid"]})
        ).collect()
        assert len(rows) == 6
        assert all(r["passed"] and r["n_violations"] == 0 for r in rows)

    def test_sql_mirror_matches(self, spark):
        df = spark.createDataFrame(
            ROWS, "id long, line long, flag string, qty double, code string"
        )
        parent = spark.createDataFrame(PARENT, "pid long")
        got = {
            r["name"]: (r["n_checked"], r["n_violations"], r["passed"])
            for r in constraint_report(
                df, _spec({"parent": parent, "parent_cols": ["pid"]})
            ).collect()
        }
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE t (id BIGINT, line BIGINT, flag VARCHAR,"
            " qty DOUBLE, code VARCHAR)"
        )
        con.executemany("INSERT INTO t VALUES (?,?,?,?,?)", ROWS)
        con.execute("CREATE TABLE p (pid BIGINT)")
        con.executemany("INSERT INTO p VALUES (?)", PARENT)
        sql = constraint_report_sql(
            "t", _spec({"parent_table": "p", "parent_cols": ["pid"]})
        )
        oracle = {r[0]: (r[2], r[3], r[4]) for r in con.execute(sql).fetchall()}
        con.close()
        assert oracle == got

    def test_unknown_kind_raises(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        with pytest.raises(ValueError):
            constraint_report(
                df, [{"name": "x", "kind": "frobnicate", "col": "id"}]
            ).collect()

    def test_single_pass_plan(self, spark):
        """All row-level + uniqueness checks must share ONE scan."""
        df = spark.range(100).selectExpr(
            "id", "id % 3 AS line", "'A' AS flag",
            "CAST(id % 7 AS DOUBLE) AS qty", "'ok_1' AS code"
        )
        spec = [c for c in _spec({"parent": df, "parent_cols": ["id"]})
                if c["kind"] != "foreign_key"]
        plan = (
            constraint_report(df, spec)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Range (0, 100") == 1

    def test_fk_only_spec(self, spark):
        """A spec with ONLY foreign_key constraints must not explode an
        empty array (array<null> broke the struct select): the report is
        just the FK rows."""
        df = spark.createDataFrame([(1,), (2,), (99,)], "pid long")
        parent = spark.createDataFrame([(1,), (2,)], "pid long")
        rows = constraint_report(
            df,
            [{"name": "fk", "kind": "foreign_key", "cols": ["pid"],
              "parent": parent, "parent_cols": ["pid"]}],
        ).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["name"], r["kind"]) == ("fk", "foreign_key")
        assert (r["n_checked"], r["n_violations"], r["passed"]) == (3, 1, False)

    def test_empty_spec_returns_empty_report(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        out = constraint_report(df, [])
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == [
            "name", "kind", "n_checked", "n_violations", "passed"
        ]
