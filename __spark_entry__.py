"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship rule query at sf0.001;
``queries()``/``oracle_sql()`` expose one named query per implemented
operator family from SURVEY.md §2 (reference parity) plus the
beyond-reference LLM-data-pipeline workloads. Every oracle SQL string is
GENERATED from the same rule document the Spark path executes
(dynamicqueryengine_spark.plans.sqlgen) — one source of truth.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from dynamicqueryengine_spark import RuleDefinition, apply_rule
from dynamicqueryengine_spark.sources.registry import load_table
from dynamicqueryengine_spark.workloads import ALL_QUERIES

FLAGSHIP_RULE = {
    "Name": "flagship-building-or-automobile-high-balance",
    "Conditions": {
        "LogicalOperator": "AND",
        "Conditions": [
            {"Property": "c_acctbal", "Operator": "GreaterThan", "Value": 1000}
        ],
        "Groups": [
            {
                "LogicalOperator": "OR",
                "Conditions": [
                    {
                        "Property": "c_mktsegment",
                        "Operator": "Equal",
                        "Value": "BUILDING",
                    },
                    {
                        "Property": "c_mktsegment",
                        "Operator": "Equal",
                        "Value": "AUTOMOBILE",
                    },
                ],
            }
        ],
    },
    "GroupBy": ["c_mktsegment"],
    "Aggregation": {"AggregateProperty": "c_acctbal", "AggregateFunction": "Max"},
}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    customer = load_table(spark, "/root/testdata/sf0.001", "customer")
    return apply_rule(customer, RuleDefinition.from_dict(FLAGSHIP_RULE))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for name, wl in ALL_QUERIES.items():
        out[name] = wl.spark_fn()
    return out


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalent for each query (omitted for the
    hash-engine-specific approximate ops, whose exact twins carry the
    oracle). Rule-query oracles are generated from the same rule documents
    via the rule→SQL transpiler."""
    out: dict[str, str] = {}
    for name, wl in ALL_QUERIES.items():
        sql = wl.oracle()
        if sql is not None:
            out[name] = sql
    return out
