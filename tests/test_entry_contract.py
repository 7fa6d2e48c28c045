"""Driver-contract simulation: run every ``queries()`` entry at sf0.001 and
compare against its ``oracle_sql()`` in DuckDB — row count, column names, and
order-insensitive values — the same shape of check the driver applies at
sf0.01 (CORRECTNESS_r{N}.json)."""

from __future__ import annotations

import pytest

import __spark_entry__ as entry_mod

from .conftest import SF_DIR, assert_same_rows

QUERIES = entry_mod.queries()
ORACLES = entry_mod.oracle_sql()


def test_every_query_has_an_oracle():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, testdata_duck):
    spark_df = QUERIES[name](spark, SF_DIR)
    if name not in ORACLES:
        assert spark_df.count() >= 0  # rows-only check (non-SQL-expressible)
        return
    duck_rel = testdata_duck.sql(ORACLES[name])
    duck_cols = sorted(duck_rel.columns)
    assert sorted(spark_df.columns) == duck_cols, f"{name}: column-name mismatch"
    assert_same_rows(spark_df, duck_rel)
