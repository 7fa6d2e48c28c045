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

# Resolved output schemas, filled as the oracle-parity tests run. The
# schema-policy test below reuses these instead of re-invoking each query
# fn: for the five events_stream_* queries "building" the DataFrame runs a
# full readStream→memory-sink cycle, so a second invocation for a
# schema-only assertion would double the streaming test cost.
_RESOLVED_SCHEMAS: dict = {}


def test_every_query_has_an_oracle():
    assert set(ORACLES) <= set(QUERIES)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, testdata_duck):
    spark_df = QUERIES[name](spark, SF_DIR)
    _RESOLVED_SCHEMAS[name] = spark_df.schema
    if name not in ORACLES:
        assert spark_df.count() >= 0  # rows-only check (non-SQL-expressible)
        return
    duck_rel = testdata_duck.sql(ORACLES[name])
    duck_cols = sorted(duck_rel.columns)
    assert sorted(spark_df.columns) == duck_cols, f"{name}: column-name mismatch"
    assert_same_rows(spark_df, duck_rel)


def test_no_driver_hostile_output_types(spark):
    """The round driver canonicalizes result rows through pandas
    ``sort_values``/``factorize``, which cannot hash list/dict cells — a
    single top-level array/map/struct column ERRORs the whole comparison
    (embed_quantize_int8, round 2). Decimal columns are rejected too: the
    r6 driver hashed the one decimal(38,2) output in the catalog
    (agg_grouping_sets_mixed's sum_qty) differently than DuckDB's decimal
    even though the values were identical — cast aggregates to double at
    the contract boundary instead. Analysis-only: resolve each contract
    query's schema and reject complex/decimal top-level types. Queries
    must posexplode arrays to long form instead."""
    bad = {}
    for name, fn in QUERIES.items():
        # Prefer the schema resolved during the oracle-parity run above;
        # recompute only when this test runs in isolation.
        schema = _RESOLVED_SCHEMAS.get(name) or fn(spark, SF_DIR).schema
        complex_cols = [
            f.name
            for f in schema.fields
            if f.dataType.typeName() in ("array", "map", "struct")
            or f.dataType.typeName().startswith("decimal")
        ]
        if complex_cols:
            bad[name] = complex_cols
    assert not bad, f"complex/decimal top-level output columns: {bad}"
