"""vt_replace_where (r14) — Delta's replaceWhere: selective overwrite
in ONE atomic commit, (previous MINUS predicate region) + incoming,
with row containment enforced, metadata-only partition backfills,
boundary-file rewrites, CDC replay, and the format writer's
metadata-exact option('replaceWhere', ...)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.sources.versioned import (
    _read_manifest,
    parse_predicate_sql,
    vt_head,
    vt_read,
    vt_read_changes,
    vt_replace_where,
    vt_write,
)


def _df(spark, n=30):
    return spark.createDataFrame(
        [(i, f"d{i % 3}", float(i)) for i in range(n)],
        "id long, day string, x double",
    )


class TestParsePredicateSql:
    def test_full_grammar(self):
        assert parse_predicate_sql(
            "day = 'd1' AND x >= 5 AND g IN ('a', 'b') "
            "AND z IS NOT NULL AND w IS NULL"
        ) == [
            ("day", "=", "d1"),
            ("x", ">=", 5),
            ("g", "in", ["a", "b"]),
            ("z", "notnull", None),
            ("w", "isnull", None),
        ]

    def test_literals(self):
        assert parse_predicate_sql("a = 'it''s'") == [("a", "=", "it's")]
        assert parse_predicate_sql("a = 3.5") == [("a", "=", 3.5)]
        assert parse_predicate_sql("a = true") == [("a", "=", True)]
        assert parse_predicate_sql("`my col` < 3") == [
            ("my col", "<", 3)
        ]

    @pytest.mark.parametrize(
        "bad",
        [
            "a = 1 OR b = 2",
            "a != 1",
            "upper(a) = 'X'",
            "a = null",
            "a BETWEEN 1 AND 2",
            "a = 1 AND",
            "",
        ],
    )
    def test_beyond_skip_grammar_refused(self, bad):
        with pytest.raises(ValueError):
            parse_predicate_sql(bad)


class TestReplaceWhere:
    def test_partition_backfill_is_metadata_only(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark), partition_by=["day"])
        nd = spark.createDataFrame(
            [(100 + i, "d1", 99.0) for i in range(3)],
            _df(spark).schema,
        )
        v = vt_replace_where(spark, path, nd, ("day", "=", "d1"))
        blob = _read_manifest(path, v)["replace_where"]
        assert blob["files_rewritten"] == 0
        assert blob["dirs_dropped"] == 1
        rows = vt_read(spark, path).collect()
        assert sorted(r["id"] for r in rows if r["day"] == "d1") == [
            100, 101, 102
        ]
        assert len([r for r in rows if r["day"] != "d1"]) == 20
        # new data landed as a VALUED partition dir: a later backfill
        # of the same day is again metadata-only
        m = _read_manifest(path, v)
        new_d = blob["new_dirs"][0]
        assert m["partitions"][new_d] == {"day": "d1"}
        # time travel serves the pre-replace day
        old = vt_read(spark, path, version=1)
        assert old.filter("day = 'd1'").count() == 10

    def test_sql_string_predicate(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        nd = spark.createDataFrame([(5, "d2", 500.0)], _df(spark).schema)
        vt_replace_where(spark, path, nd, "id >= 0 AND id < 10")
        out = {r["id"]: r["x"] for r in vt_read(spark, path).collect()}
        assert out[5] == 500.0 and 9 not in out and out[20] == 20.0

    def test_containment_violation_commits_nothing(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        head = vt_head(path)
        bad = spark.createDataFrame([(1, "d0", 1.0)], _df(spark).schema)
        with pytest.raises(ValueError, match="satisfy"):
            vt_replace_where(spark, path, bad, ("day", "=", "d1"))
        assert vt_head(path) == head

    def test_null_predicate_row_violates(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        nulled = spark.createDataFrame(
            [(1, None, 1.0)], _df(spark).schema
        )
        with pytest.raises(ValueError, match="satisfy"):
            vt_replace_where(spark, path, nulled, ("day", "=", "d1"))

    def test_boundary_rewrite_exact(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark, 100).coalesce(1))
        nd = spark.createDataFrame(
            [(0, "dX", 0.5)], _df(spark).schema
        )
        v = vt_replace_where(
            spark, path, nd, [("id", ">=", 0), ("id", "<", 10)]
        )
        blob = _read_manifest(path, v)["replace_where"]
        assert blob["files_rewritten"] >= 1
        out = vt_read(spark, path)
        assert out.count() == 91
        assert out.filter("id < 10").count() == 1
        assert out.filter("day = 'dX'").count() == 1

    def test_empty_region_is_insert(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        nd = spark.createDataFrame([(999, "d9", 9.0)], _df(spark).schema)
        vt_replace_where(spark, path, nd, ("day", "=", "d9"))
        out = vt_read(spark, path)
        assert out.count() == 31
        assert out.filter("day = 'd9'").count() == 1

    def test_empty_frame_clears_region(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        empty = spark.createDataFrame([], _df(spark).schema)
        vt_replace_where(spark, path, empty, ("day", "=", "d1"))
        out = vt_read(spark, path)
        assert out.filter("day = 'd1'").count() == 0
        assert out.count() == 20

    def test_constraints_enforced_on_incoming(self, spark, tmp_path):
        from dynamicqueryengine_spark.sources.versioned import (
            ConstraintViolation,
        )

        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            _df(spark),
            constraints=[
                {"kind": "expr", "name": "xpos", "expr": "x >= 0"}
            ],
        )
        bad = spark.createDataFrame(
            [(7, "d1", -1.0)], _df(spark).schema
        )
        with pytest.raises(ConstraintViolation):
            vt_replace_where(spark, path, bad, ("day", "=", "d1"))

    def test_identity_refused(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [("a", 1.0)], "day string, x double"
            ),
            identity={"rid": {"start": 1, "step": 1}},
        )
        nd = spark.createDataFrame([("a", 2.0)], "day string, x double")
        with pytest.raises(ValueError, match="IDENTITY"):
            vt_replace_where(spark, path, nd, ("day", "=", "a"))

    def test_schema_mismatch_refused(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        extra = spark.createDataFrame(
            [(1, "d1", 1.0, "zz")],
            "id long, day string, x double, note string",
        )
        with pytest.raises(ValueError, match="exact schema"):
            vt_replace_where(spark, path, extra, ("day", "=", "d1"))

    def test_cdc_batch_and_stream_replay(self, spark, tmp_path):
        from dynamicqueryengine_spark.streaming.source import (
            vt_change_stream,
        )
        import uuid

        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark).coalesce(1))
        nd = spark.createDataFrame(
            [(100, "d1", 99.0)], _df(spark).schema
        )
        v = vt_replace_where(spark, path, nd, ("day", "=", "d1"))
        ch = vt_read_changes(spark, path, 1, v)
        by_type = {
            r["_change_type"]: r["n"]
            for r in ch.groupBy("_change_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert by_type == {"delete": 10, "insert": 1}
        # streaming source emits the same change set
        qn = "rw_" + uuid.uuid4().hex[:8]
        q = (
            vt_change_stream(spark, path)
            .writeStream.format("memory")
            .queryName(qn)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        srows = spark.sql(
            f"select id, _change_type from {qn} "
            "where _commit_version = 2"
        ).collect()
        got = {(r["id"], r["_change_type"]) for r in srows}
        want = {(i, "delete") for i in range(1, 30, 3)} | {
            (100, "insert")
        }
        assert got == want

    def test_change_feed_materializes(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark).coalesce(1))
        nd = spark.createDataFrame(
            [(100, "d1", 99.0)], _df(spark).schema
        )
        v = vt_replace_where(
            spark, path, nd, ("day", "=", "d1"), change_feed=True
        )
        m = _read_manifest(path, v)
        assert m.get("changes")  # c_* dir recorded
        ch = vt_read_changes(spark, path, 1, v)
        assert ch.filter("_change_type = 'delete'").count() == 10

    def test_table_stream_classifies_change_commit(
        self, spark, tmp_path
    ):
        from dynamicqueryengine_spark.sources.datasource import (
            vt_register,
        )

        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        vt_replace_where(
            spark,
            path,
            spark.createDataFrame([(100, "d1", 9.0)], _df(spark).schema),
            ("day", "=", "d1"),
        )
        vt_write(
            spark,
            path,
            spark.createDataFrame([(7, "d7", 7.0)], _df(spark).schema),
            mode="append",
        )
        vt_register(spark)
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        src = (
            spark.readStream.format("vt")
            .option("path", path)
            .option("startingVersion", "1")
            .option("skipChangeCommits", "true")
            .load()
        )
        q = (
            src.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert sorted(
            r["id"] for r in spark.read.parquet(out).collect()
        ) == [7]

    def test_commit_race_retries(self, spark, tmp_path):
        """A racing append between read-head and commit re-derives:
        the retry replays classification against the new head, so the
        racer's rows survive when outside the predicate region."""
        import dynamicqueryengine_spark.sources.versioned as V

        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark), partition_by=["day"])
        real_commit = V._commit
        raced = {"done": False}

        def racing_commit(*a, **k):
            if not raced["done"]:
                raced["done"] = True
                vt_write(
                    spark,
                    path,
                    spark.createDataFrame(
                        [(500, "d0", 5.0)], _df(spark).schema
                    ),
                    mode="append",
                )
            return real_commit(*a, **k)

        V._commit = racing_commit
        try:
            vt_replace_where(
                spark,
                path,
                spark.createDataFrame(
                    [(100, "d1", 9.0)], _df(spark).schema
                ),
                ("day", "=", "d1"),
            )
        finally:
            V._commit = real_commit
        out = vt_read(spark, path)
        assert out.filter("id = 500").count() == 1
        assert out.filter("day = 'd1'").count() == 1


class TestFormatWriterReplaceWhere:
    @staticmethod
    def _register(spark):
        from dynamicqueryengine_spark.sources.datasource import (
            vt_register,
        )

        vt_register(spark)

    def test_partition_backfill(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark), partition_by=["day"])
        self._register(spark)
        nd = spark.createDataFrame(
            [(200 + i, "d2", 7.0) for i in range(4)], _df(spark).schema
        )
        (
            nd.write.format("vt")
            .option("path", path)
            .option("replaceWhere", "day = 'd2'")
            .mode("overwrite")
            .save()
        )
        m = _read_manifest(path, 2)
        assert m["op"] == "replace_where"
        assert m["replace_where"]["dirs_dropped"] == 1
        rows = vt_read(spark, path).collect()
        assert sorted(
            r["id"] for r in rows if r["day"] == "d2"
        ) == [200, 201, 202, 203]
        assert len(rows) == 24

    def test_containment_enforced_in_tasks(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark), partition_by=["day"])
        self._register(spark)
        head = vt_head(path)
        bad = spark.createDataFrame([(1, "d0", 1.0)], _df(spark).schema)
        with pytest.raises(Exception, match="region it replaces"):
            (
                bad.write.format("vt")
                .option("path", path)
                .option("replaceWhere", "day = 'd2'")
                .mode("overwrite")
                .save()
            )
        assert vt_head(path) == head

    def test_boundary_rewrite_refused_with_pointer(
        self, spark, tmp_path
    ):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark).coalesce(1), partition_by=["day"])
        self._register(spark)
        nd = spark.createDataFrame([(0, "d0", 0.0)], _df(spark).schema)
        with pytest.raises(Exception, match="vt_replace_where"):
            (
                nd.write.format("vt")
                .option("path", path)
                .option("replaceWhere", "id < 2 AND day = 'd0'")
                .mode("overwrite")
                .save()
            )

    def test_append_mode_refused(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        self._register(spark)
        nd = spark.createDataFrame([(1, "d1", 1.0)], _df(spark).schema)
        with pytest.raises(Exception, match="overwrite"):
            (
                nd.write.format("vt")
                .option("path", path)
                .option("replaceWhere", "day = 'd1'")
                .mode("append")
                .save()
            )


class TestRuleDrivenReplace:
    """r14 late: the engine's rule DOCUMENTS drive the replaced region
    (parity with vt_delete's rule surface) — an exact skip-grammar
    rule keeps metadata-only drops + replayable CDC; a richer rule
    materializes its deleted rows and replaces per the FULL compiled
    operator semantics."""

    def test_exact_rule_metadata_only(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark), partition_by=["day"])
        nd = spark.createDataFrame(
            [(300, "d1", 3.0)], _df(spark).schema
        )
        doc = {
            "Conditions": {
                "Conditions": [
                    {
                        "Property": "day",
                        "Operator": "Equal",
                        "Value": "d1",
                    }
                ]
            }
        }
        v = vt_replace_where(spark, path, nd, rule=doc)
        blob = _read_manifest(path, v)["replace_where"]
        assert blob["files_rewritten"] == 0
        assert blob["dirs_dropped"] == 1
        assert blob["predicate"] == [["day", "=", "d1"]]
        assert blob["rule"] == doc
        out = vt_read(spark, path)
        assert [
            r["id"] for r in out.filter("day = 'd1'").collect()
        ] == [300]
        # CDC replays from the recorded exact predicate
        ch = vt_read_changes(spark, path, v - 1, v)
        assert ch.filter("_change_type = 'delete'").count() == 10

    def test_rich_rule_materializes_and_replaces(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            spark.createDataFrame(
                [(i, f"u{i}@{'corp' if i % 2 else 'edu'}.x", float(i))
                 for i in range(10)],
                "id long, email string, x double",
            ),
        )
        doc = {
            "Conditions": {
                "Conditions": [
                    {
                        "Property": "email",
                        "Operator": "Contains",
                        "Value": "@corp",
                    }
                ]
            }
        }
        nd = spark.createDataFrame(
            [(100, "new@corp.x", 1.0)],
            "id long, email string, x double",
        )
        v = vt_replace_where(spark, path, nd, rule=doc)
        m = _read_manifest(path, v)
        assert m.get("changes")  # deleted rows materialized
        assert m["replace_where"].get("materialized_changes")
        out = vt_read(spark, path)
        assert out.filter("email LIKE '%@corp%'").count() == 1
        assert out.count() == 6  # 5 edu rows + the replacement
        # containment: a row OUTSIDE the rule's region refuses
        head = _read_manifest(path, v)["version"] if "version" in m else v
        bad = spark.createDataFrame(
            [(7, "x@edu.x", 1.0)], "id long, email string, x double"
        )
        with pytest.raises(ValueError, match="satisfy"):
            vt_replace_where(spark, path, bad, rule=doc)

    def test_predicate_and_rule_exclusive(self, spark, tmp_path):
        path = str(tmp_path / "t")
        vt_write(spark, path, _df(spark))
        with pytest.raises(ValueError, match="not both"):
            vt_replace_where(
                spark,
                path,
                _df(spark, 1),
                ("day", "=", "d0"),
                rule={"Conditions": {"Conditions": []}},
            )
