"""Semantics for the column profiler (functions/profile.py) and
nearest-centroid confusion (functions/embeddings.py centroid_confusion)."""

from __future__ import annotations


class TestProfileTable:
    def test_counts_nulls_and_distinct(self, spark):
        from dynamicqueryengine_spark.functions.profile import profile_table

        df = spark.createDataFrame(
            [(1, "a"), (2, "a"), (3, None), (None, "b")],
            "id long, s string",
        )
        prof = {r["col_name"]: r for r in profile_table(df).collect()}
        assert set(prof) == {"id", "s"}
        assert prof["id"]["n_rows"] == 4
        assert prof["id"]["n_nulls"] == 1
        assert prof["id"]["n_distinct"] == 3
        assert prof["s"]["n_nulls"] == 1
        assert prof["s"]["n_distinct"] == 2
        assert prof["s"]["null_frac"] == 0.25
        assert prof["id"]["dtype"] == "bigint"

    def test_single_aggregation_pass(self, spark):
        """The profile plan must scan the table once — no per-column
        union of scans."""
        from dynamicqueryengine_spark.functions.profile import profile_table

        df = spark.range(100).selectExpr("id", "id % 3 AS k", "id % 5 AS v")
        plan = (
            profile_table(df)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert plan.count("Range (0, 100") == 1

    def test_hostile_column_names(self, spark):
        """Names with spaces, hyphens, and quotes must profile correctly
        on the Spark side AND generate valid DuckDB SQL — identifiers
        are never string-interpolated unquoted."""
        import duckdb

        from dynamicqueryengine_spark.functions.profile import (
            profile_table,
            profile_table_sql,
        )

        names = ["a b", "a-b", "it's", 'dq"name']
        df = spark.createDataFrame(
            [(1, "x", 2.0, None), (None, "y", 2.0, "z")],
            "`a b` long, `a-b` string, `it's` double, `dq\"name` string",
        )
        prof = {r["col_name"]: r for r in profile_table(df).collect()}
        assert set(prof) == set(names)
        assert prof["a b"]["n_nulls"] == 1
        assert prof["it's"]["n_distinct"] == 1
        con = duckdb.connect()
        con.execute(
            'CREATE TABLE t ("a b" BIGINT, "a-b" VARCHAR, '
            "\"it's\" DOUBLE, \"dq\"\"name\" VARCHAR)"
        )
        con.execute("INSERT INTO t VALUES (1, 'x', 2.0, NULL)")
        con.execute("INSERT INTO t VALUES (NULL, 'y', 2.0, 'z')")
        sql = profile_table_sql("t", [(n, "x") for n in names])
        oracle = {r[0]: r for r in con.execute(sql).fetchall()}
        assert set(oracle) == set(names)
        for n in names:
            assert oracle[n][3] == prof[n]["n_nulls"]
            assert oracle[n][4] == prof[n]["n_distinct"]
        con.close()


class TestCentroidConfusion:
    def test_separated_labels_are_diagonal(self, spark):
        from dynamicqueryengine_spark.functions.embeddings import (
            centroid_confusion,
        )

        rows = [(i, [10.0, 0.0], 0) for i in range(5)]
        rows += [(10 + i, [0.0, 10.0], 1) for i in range(5)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {(r["label"], r["nearest_label"]): r for r in
               centroid_confusion(df).collect()}
        assert set(out) == {(0, 0), (1, 1)}
        assert all(r["n"] == 5 and r["is_match"] for r in out.values())

    def test_outlier_crosses_to_other_centroid(self, spark):
        from dynamicqueryengine_spark.functions.embeddings import (
            centroid_confusion,
        )

        # label-0 cluster at x=10 plus one label-0 point sitting on the
        # label-1 cluster: that point must confuse to label 1
        rows = [(i, [10.0, 0.0], 0) for i in range(4)]
        rows.append((99, [0.0, 10.0], 0))
        rows += [(10 + i, [0.0, 10.0], 1) for i in range(5)]
        df = spark.createDataFrame(
            rows, "vec_id long, embedding array<float>, label int"
        )
        out = {(r["label"], r["nearest_label"]): r["n"] for r in
               centroid_confusion(df).collect()}
        assert out[(0, 1)] == 1
        assert out[(0, 0)] == 4
        assert out[(1, 1)] == 5
