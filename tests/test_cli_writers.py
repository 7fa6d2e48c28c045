"""CLI and sink-writer tests."""

from __future__ import annotations

import json
import tempfile

from dynamicqueryengine_spark.sources.writers import write_csv, write_parquet


class TestWriters:
    def test_parquet_roundtrip_partitioned(self, spark, users_df):
        with tempfile.TemporaryDirectory() as d:
            write_parquet(users_df, f"{d}/out", partition_by=["CompanyCode"])
            back = spark.read.parquet(f"{d}/out")
            assert back.count() == users_df.count()
            assert set(back.columns) == set(users_df.columns)

    def test_csv_write(self, spark, users_df):
        with tempfile.TemporaryDirectory() as d:
            write_csv(users_df.select("Id", "Title"), f"{d}/out")
            back = spark.read.option("header", "true").csv(f"{d}/out")
            assert back.count() == users_df.count()


class TestCli:
    def test_evaluate_writes_parquet(self, spark, tmp_path):
        """Drive the CLI code path in-process (same SparkSession)."""
        from dynamicqueryengine_spark.operators.executor import apply_rule
        from dynamicqueryengine_spark.plans.model import RuleDefinition
        from dynamicqueryengine_spark.sources.registry import TableRegistry

        rule_path = tmp_path / "rule.json"
        rule_path.write_text(
            json.dumps(
                {
                    "Conditions": {
                        "Conditions": [
                            {
                                "Property": "c_mktsegment",
                                "Operator": "Equal",
                                "Value": "BUILDING",
                            }
                        ]
                    }
                }
            )
        )
        reg = TableRegistry(spark, "/root/testdata/sf0.001")
        rule = RuleDefinition.from_json(rule_path.read_text())
        out = apply_rule(reg["customer"], rule)
        write_parquet(out, str(tmp_path / "result"))
        back = spark.read.parquet(str(tmp_path / "result"))
        assert back.count() == out.count() > 0


class TestCliWorkloads:
    def test_workload_registry_is_the_contract_surface(self, spark):
        import __spark_entry__ as e
        from dynamicqueryengine_spark.workloads import ALL_QUERIES

        assert set(ALL_QUERIES) == set(e.queries())

    def test_workload_run_in_process(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.writers import write_parquet
        from dynamicqueryengine_spark.workloads import ALL_QUERIES

        df = ALL_QUERIES["docs_length_trim"].spark_fn()(
            spark, "/root/testdata/sf0.001"
        )
        out = str(tmp_path / "trim")
        write_parquet(df, out)
        assert spark.read.parquet(out).count() == df.count() > 0


class TestMergeUpsert:
    def test_insert_then_update(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.writers import merge_upsert

        path = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, name string, v long"
        )
        merge_upsert(spark, path, base, ["id"])
        upd = spark.createDataFrame(
            [(2, "b2", 99), (3, "c", 30)], "id long, name string, v long"
        )
        merge_upsert(spark, path, upd, ["id"])
        got = {
            r["id"]: (r["name"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {1: ("a", 10), 2: ("b2", 99), 3: ("c", 30)}

    def test_failed_stage_leaves_table_intact(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.writers import merge_upsert

        path = str(tmp_path / "t")
        base = spark.createDataFrame([(1, "a")], "id long, name string")
        merge_upsert(spark, path, base, ["id"])
        bad = spark.createDataFrame([(2, "x")], "id long, other string")
        import pytest

        with pytest.raises(Exception):
            merge_upsert(spark, path, bad, ["id"])  # schema mismatch
        assert {r["id"] for r in spark.read.parquet(path).collect()} == {1}

    def test_recovers_interrupted_swap_and_clears_debris(self, spark, tmp_path):
        """A crash between the swap's two renames leaves the table at
        ._old_* with nothing at path; the next merge must restore the
        backup before merging, and stale ._staged_* debris from killed
        runs must be swept."""
        import os

        from dynamicqueryengine_spark.sources.writers import merge_upsert

        path = str(tmp_path / "t")
        base = spark.createDataFrame(
            [(1, "a", 10), (2, "b", 20)], "id long, name string, v long"
        )
        merge_upsert(spark, path, base, ["id"])
        # simulate the interrupted swap + an orphaned staging dir
        os.rename(path, f"{path}._old_deadbeef")
        os.makedirs(f"{path}._staged_feedface")
        upd = spark.createDataFrame(
            [(2, "b2", 99)], "id long, name string, v long"
        )
        merge_upsert(spark, path, upd, ["id"])
        got = {
            r["id"]: (r["name"], r["v"])
            for r in spark.read.parquet(path).collect()
        }
        assert got == {1: ("a", 10), 2: ("b2", 99)}
        assert not os.path.exists(f"{path}._old_deadbeef")
        assert not os.path.exists(f"{path}._staged_feedface")
