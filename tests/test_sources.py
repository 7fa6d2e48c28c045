"""Round-trip tests for multi-format sources (sources/registry.read_source
+ sources/writers)."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark.sources.registry import read_source
from dynamicqueryengine_spark.sources.writers import (
    write_csv,
    write_json,
    write_parquet,
)

SCHEMA = "id long, name string, score double"
ROWS = [(1, "a", 1.5), (2, "b", -2.0), (3, "c", 0.0)]


def _df(spark):
    return spark.createDataFrame(ROWS, SCHEMA)


def _sorted_rows(df):
    return sorted(tuple(r) for r in df.select("id", "name", "score").collect())


class TestReadSource:
    def test_parquet_round_trip_and_pushdown(self, spark, tmp_path):
        p = str(tmp_path / "t.parquet")
        write_parquet(_df(spark), p)
        back = read_source(spark, p, "parquet")
        assert _sorted_rows(back) == sorted(ROWS)
        plan = (
            back.filter("id > 1")
            .select("id")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)" in plan

    def test_csv_round_trip_with_schema(self, spark, tmp_path):
        p = str(tmp_path / "t.csv")
        write_csv(_df(spark), p)
        back = read_source(spark, p, "csv", schema=SCHEMA)
        assert back.dtypes == [("id", "bigint"), ("name", "string"),
                               ("score", "double")]
        assert _sorted_rows(back) == sorted(ROWS)

    def test_json_round_trip_with_schema(self, spark, tmp_path):
        p = str(tmp_path / "t.json")
        write_json(_df(spark), p)
        back = read_source(spark, p, "json", schema=SCHEMA)
        assert _sorted_rows(back) == sorted(ROWS)

    def test_orc_round_trip(self, spark, tmp_path):
        p = str(tmp_path / "t.orc")
        _df(spark).write.mode("overwrite").orc(p)
        back = read_source(spark, p, "orc")
        assert _sorted_rows(back) == sorted(ROWS)

    def test_unknown_format_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError, match="Unsupported format"):
            read_source(spark, str(tmp_path), "avro")

    def test_csv_options_forwarded(self, spark, tmp_path):
        p = str(tmp_path / "t2.csv")
        _df(spark).write.mode("overwrite").option("header", "false").option(
            "sep", ";"
        ).csv(p)
        back = read_source(
            spark, p, "csv", schema=SCHEMA, header="false", sep=";"
        )
        assert _sorted_rows(back) == sorted(ROWS)
