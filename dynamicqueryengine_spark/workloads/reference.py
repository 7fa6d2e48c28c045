"""Reference-parity workload: one named query per operator family from
SURVEY.md §2, each defined ONCE as a rule document and compiled both ways —
to a Spark DataFrame pipeline and to DuckDB oracle SQL — so the driver's
correctness gate checks the Spark engine against an independently-executed
translation of the same rule.

Static Spark schemas for the driver tables (FIXTURES.md §2) let oracle SQL
generate without a live SparkSession.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Any, Callable, Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..operators.executor import apply_rule, execute_rules
from ..plans.model import RuleDefinition
from ..plans.sqlgen import SqlGenerator
from ..sources.registry import load_table


def _schema(*cols: tuple[str, Any]) -> StructType:
    return StructType([StructField(n, t, True) for n, t in cols])


TESTDATA_SCHEMAS: dict[str, StructType] = {
    "region": _schema(("r_regionkey", IntegerType()), ("r_name", StringType())),
    "nation": _schema(
        ("n_nationkey", IntegerType()),
        ("n_name", StringType()),
        ("n_regionkey", IntegerType()),
    ),
    "customer": _schema(
        ("c_custkey", LongType()),
        ("c_name", StringType()),
        ("c_nationkey", IntegerType()),
        ("c_acctbal", DoubleType()),
        ("c_mktsegment", StringType()),
    ),
    "supplier": _schema(
        ("s_suppkey", LongType()),
        ("s_name", StringType()),
        ("s_nationkey", IntegerType()),
        ("s_acctbal", DoubleType()),
    ),
    "part": _schema(
        ("p_partkey", LongType()),
        ("p_name", StringType()),
        ("p_brand", StringType()),
        ("p_type", StringType()),
        ("p_size", IntegerType()),
        ("p_retailprice", DoubleType()),
    ),
    "orders": _schema(
        ("o_orderkey", LongType()),
        ("o_custkey", LongType()),
        ("o_orderstatus", StringType()),
        ("o_totalprice", DoubleType()),
        ("o_orderdate", TimestampType()),
        ("o_orderpriority", StringType()),
    ),
    "lineitem": _schema(
        ("l_orderkey", LongType()),
        ("l_partkey", LongType()),
        ("l_suppkey", LongType()),
        ("l_linenumber", IntegerType()),
        ("l_quantity", DoubleType()),
        ("l_extendedprice", DoubleType()),
        ("l_discount", DoubleType()),
        ("l_tax", DoubleType()),
        ("l_returnflag", StringType()),
        ("l_linestatus", StringType()),
        ("l_shipdate", TimestampType()),
    ),
    "events": _schema(
        ("event_id", LongType()),
        ("ts", TimestampType()),
        ("user_id", LongType()),
        ("event_type", StringType()),
        ("value", DoubleType()),
        ("props", StringType()),
    ),
    "documents": _schema(
        ("doc_id", LongType()),
        ("text", StringType()),
        ("lang", StringType()),
        ("source", StringType()),
        ("n_chars", LongType()),
    ),
    "embeddings": _schema(
        ("vec_id", LongType()),
        ("embedding", ArrayType(FloatType())),
        ("label", IntegerType()),
    ),
}

# The driver's DuckDB views read events.parquet raw, where ``ts`` is a
# nanosecond timestamp; our engine normalizes it to µs at load (registry
# load_table). The oracle reads through the same normalization:
_EVENTS_ORACLE_SOURCE = (
    "(SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id, event_type, "
    "value, props FROM events) AS events"
)


@dataclass
class RuleWorkload:
    """One named correctness query: rule document + target table.

    ``prepare``/``oracle_source``/``schema`` let a workload run its rule
    over a DERIVED projection of a base table (the same derivation
    expressed once as a DataFrame transform and once as a SQL subquery) —
    used where the raw testdata is too clean to exercise a path (no NULLs,
    no numeric strings) and a vacuous 0-row match would prove nothing.
    """

    table: str
    rule: Mapping[str, Any]
    params: Mapping[str, Any] | None = None
    group_by_mode: str = "all"
    prepare: Callable[[DataFrame], DataFrame] | None = None
    oracle_source: str | None = None
    schema: StructType | None = None

    def spark_fn(self) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            df = load_table(spark, sf_dir, self.table)
            if self.prepare is not None:
                df = self.prepare(df)
            return apply_rule(
                df,
                RuleDefinition.from_dict(self.rule),
                external_params=self.params,
                group_by_mode=self.group_by_mode,
            )

        return run

    def oracle(self) -> str:
        gen = SqlGenerator(
            self.schema or TESTDATA_SCHEMAS[self.table],
            external_params=self.params,
        )
        if self.oracle_source is not None:
            table = self.oracle_source
        elif self.table == "events":
            table = _EVENTS_ORACLE_SOURCE
        else:
            table = self.table
        return gen.rule_sql(
            RuleDefinition.from_dict(self.rule), table, self.group_by_mode
        )


@dataclass
class MultiRuleWorkload:
    """Union-distinct batch (RuleDefinitionExecutor.cs:8-28); the
    beyond-reference ``combine`` modes ride the same per-rule compile
    (operators/executor.py execute_rules)."""

    table: str
    rules: list[Mapping[str, Any]] = dc_field(default_factory=list)
    params: Mapping[str, Any] | None = None
    combine: str = "union"

    def spark_fn(self) -> Callable[[SparkSession, str], DataFrame]:
        def run(spark: SparkSession, sf_dir: str) -> DataFrame:
            df = load_table(spark, sf_dir, self.table)
            rules = [RuleDefinition.from_dict(r) for r in self.rules]
            return execute_rules(
                df, rules, external_params=self.params, combine=self.combine
            )

        return run

    def oracle(self) -> str:
        gen = SqlGenerator(TESTDATA_SCHEMAS[self.table], external_params=self.params)
        rules = [RuleDefinition.from_dict(r) for r in self.rules]
        table = _EVENTS_ORACLE_SOURCE if self.table == "events" else self.table
        if self.combine != "union":
            return gen.rules_set_sql(rules, table, self.combine)
        return gen.rules_union_sql(rules, table)


def _cond(prop: str, op: str, value: Any = None) -> dict:
    return {
        "Conditions": {
            "Conditions": [{"Property": prop, "Operator": op, "Value": value}]
        }
    }


REFERENCE_QUERIES: dict[str, RuleWorkload | MultiRuleWorkload] = {
    # --- comparison operators (SURVEY §2.2 #1-8) ---
    "rule_equal": RuleWorkload("customer", _cond("c_mktsegment", "Equal", "BUILDING")),
    "rule_notequal": RuleWorkload(
        "customer", _cond("c_mktsegment", "NotEqual", "BUILDING")
    ),
    "rule_comparisons": RuleWorkload(
        "customer",
        {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "c_acctbal", "Operator": "GreaterThan", "Value": 1000},
                    {
                        "Property": "c_nationkey",
                        "Operator": "LessThanOrEqual",
                        "Value": 10,
                    },
                ],
            }
        },
    ),
    "rule_range": RuleWorkload(
        "part",
        {
            "Conditions": {
                "Conditions": [
                    {
                        "Property": "p_retailprice",
                        "Operator": "GreaterThanOrEqual",
                        "Value": 950,
                    },
                    {"Property": "p_size", "Operator": "LessThan", "Value": 30},
                ]
            }
        },
    ),
    "rule_in": RuleWorkload(
        "customer", _cond("c_mktsegment", "In", ["BUILDING", "MACHINERY"])
    ),
    "rule_notin": RuleWorkload(
        "customer", _cond("c_mktsegment", "NotIn", ["BUILDING", "MACHINERY"])
    ),
    "rule_timestamp_lessthan": RuleWorkload(
        "orders", _cond("o_orderdate", "LessThan", "1995-06-15T00:00:00")
    ),
    # --- string-method operators (#9-12, ordinal case-sensitive) ---
    "rule_contains": RuleWorkload("part", _cond("p_name", "Contains", "red")),
    "rule_notcontains": RuleWorkload("part", _cond("p_name", "NotContains", "blue")),
    "rule_startswith": RuleWorkload("part", _cond("p_type", "StartsWith", "STANDARD")),
    "rule_endswith": RuleWorkload("part", _cond("p_brand", "EndsWith", "#3")),
    # --- null/empty family (#13-18) ---
    "rule_null_family": RuleWorkload(
        "customer",
        {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "c_name", "Operator": "NotNull"},
                    {"Property": "c_mktsegment", "Operator": "NotEmpty"},
                ],
            }
        },
    ),
    # Testdata has no NULL/empty lang values, so NullOrEmpty runs over a
    # derived projection that introduces both (same derivation both engines)
    # — a 0-row match on the raw table would be vacuous.
    "rule_nullorempty": RuleWorkload(
        "documents",
        _cond("lang", "NullOrEmpty"),
        prepare=lambda df: df.select(
            "doc_id",
            F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("string"))
            .when(F.col("doc_id") % 5 == 0, F.lit(""))
            .otherwise(F.col("lang"))
            .alias("lang"),
        ),
        oracle_source=(
            "(SELECT doc_id, CASE WHEN doc_id % 7 = 0 THEN NULL "
            "WHEN doc_id % 5 = 0 THEN '' ELSE lang END AS lang "
            "FROM documents) AS documents"
        ),
        schema=_schema(("doc_id", LongType()), ("lang", StringType())),
    ),
    "rule_notempty": RuleWorkload("documents", _cond("source", "NotEmpty")),
    "rule_empty_or_short": RuleWorkload(
        # Empty op in a non-degenerate position: OR with a live predicate
        "documents",
        {
            "Conditions": {
                "LogicalOperator": "OR",
                "Conditions": [
                    {"Property": "lang", "Operator": "Empty"},
                    {"Property": "n_chars", "Operator": "LessThan", "Value": 100},
                ],
            }
        },
    ),
    "rule_notnullorempty_tautology": RuleWorkload(
        # faithful reference bug: passes every row (IQueryableRuleEvaluator.cs:210-216)
        "customer",
        _cond("c_mktsegment", "NotNullOrEmpty"),
    ),
    # --- regex-count family (#19-21) ---
    "rule_regex_count_greater": RuleWorkload(
        "events",
        _cond("props", "ContainIfCountIsGreater", {"Target": "[0-9]", "Threshold": "1"}),
    ),
    "rule_regex_count_less": RuleWorkload(
        "events",
        _cond("props", "ContainIfCountIsLess", {"Target": "7", "Threshold": "2"}),
    ),
    "rule_regex_must_contain": RuleWorkload(
        "events",
        _cond(
            "props",
            "MustContainIfCountIsGreater",
            {"Target": "[0-9]", "Required": "K", "Threshold": "1"},
        ),
    ),
    # --- conditional (#22): material implication ---
    "rule_if_implication": RuleWorkload(
        "orders",
        _cond(
            "o_orderstatus",
            "If",
            {
                "Check": {
                    "Property": "o_orderstatus",
                    "Operator": "Equal",
                    "Value": "O",
                },
                "Then": {
                    "Property": "o_totalprice",
                    "Operator": "GreaterThan",
                    "Value": 50000,
                },
            },
        ),
    ),
    # --- dynamic external-parameter family (#23-27) ---
    "rule_dynamic_equal": RuleWorkload(
        "customer",
        _cond("c_mktsegment", "DynamicEqual"),
        params={"c_mktsegment": "BUILDING"},
    ),
    "rule_dynamic_unary_family": RuleWorkload(
        # DynamicNullOrEmpty + DynamicNotEmpty as row-independent gates
        # (they test the PARAMETER, not the column —
        # IQueryableRuleEvaluator.cs:249-272) folded with a live predicate
        "customer",
        {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "blank_param", "Operator": "DynamicNullOrEmpty"},
                    {"Property": "list_param", "Operator": "DynamicNotEmpty"},
                    {"Property": "c_acctbal", "Operator": "GreaterThan", "Value": 500},
                ],
            }
        },
        params={"blank_param": "   ", "list_param": [1, 2]},
    ),
    "rule_dynamic_empty": RuleWorkload(
        # op #27 DynamicEmpty (IQueryableRuleEvaluator.cs:608): true when the
        # PARAMETER is empty — row-independent gate folded with a live
        # predicate so the result set is nontrivial
        "customer",
        {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "empty_param", "Operator": "DynamicEmpty"},
                    {"Property": "c_acctbal", "Operator": "LessThan", "Value": 500},
                ],
            }
        },
        params={"empty_param": ""},
    ),
    "rule_dynamic_guard": RuleWorkload(
        # row-independent DynamicNotNullOrEmpty gate AND a real filter
        "customer",
        {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "tenant", "Operator": "DynamicNotNullOrEmpty"},
                    {
                        "Property": "c_acctbal",
                        "Operator": "GreaterThan",
                        "Value": 5000,
                    },
                ],
            }
        },
        params={"tenant": "acme"},
    ),
    # --- boolean combinators: nested tree + negate + empty group ---
    "rule_nested_tree": RuleWorkload(
        "customer",
        {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "c_acctbal", "Operator": "GreaterThan", "Value": 0}
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
                    },
                    {
                        "Negate": True,
                        "Conditions": [
                            {
                                "Property": "c_nationkey",
                                "Operator": "In",
                                "Value": [1, 2, 3],
                            }
                        ],
                    },
                ],
            }
        },
    ),
    "rule_empty_group_passes_all": RuleWorkload(
        "region", {"Conditions": {"Conditions": [], "Groups": []}}
    ),
    # --- string-as-numeric coercion parity (try_cast NULL on malformed) ---
    # The raw props column is JSON (never castable → 0 rows, vacuous), so
    # coerce over a derived mixed column: the numeric payload extracted from
    # props, with every 10th row replaced by a malformed string. Exercises
    # both the numeric-string ordering and the try_cast-NULL path.
    "rule_string_numeric_coercion": RuleWorkload(
        "events",
        _cond("knum", "GreaterThan", 50),
        prepare=lambda df: df.select(
            "event_id",
            F.when(F.col("event_id") % 10 == 0, F.lit("N/A"))
            .otherwise(F.regexp_extract(F.col("props"), "[0-9]+", 0))
            .alias("knum"),
        ),
        oracle_source=(
            "(SELECT event_id, CASE WHEN event_id % 10 = 0 THEN 'N/A' "
            "ELSE regexp_extract(props, '[0-9]+', 0) END AS knum "
            "FROM events) AS events"
        ),
        schema=_schema(("event_id", LongType()), ("knum", StringType())),
    ),
    # --- aggregation (SURVEY §2.3): argmin/argmax whole rows, count ---
    "agg_argmax_by_segment": RuleWorkload(
        "customer",
        {
            "GroupBy": ["c_mktsegment"],
            "Aggregation": {
                "AggregateProperty": "c_acctbal",
                "AggregateFunction": "Max",
            },
        },
    ),
    "agg_argmin_by_segment": RuleWorkload(
        "customer",
        {
            "GroupBy": ["c_mktsegment"],
            "Aggregation": {
                "AggregateProperty": "c_acctbal",
                "AggregateFunction": "Min",
            },
        },
    ),
    "agg_argmax_filtered": RuleWorkload(
        "orders",
        {
            "Conditions": {
                "Conditions": [
                    {"Property": "o_orderstatus", "Operator": "Equal", "Value": "O"}
                ]
            },
            "GroupBy": ["o_orderpriority"],
            "Aggregation": {
                "AggregateProperty": "o_totalprice",
                "AggregateFunction": "Max",
            },
        },
    ),
    "agg_count_multikey": RuleWorkload(
        "customer",
        {
            "GroupBy": ["c_mktsegment", "c_nationkey"],
            "Aggregation": {"AggregateFunction": "Count"},
        },
    ),
    "agg_count_live_first_key": RuleWorkload(
        # live-path fidelity: multi-key GroupBy, only the FIRST key honored
        # (IQueryableRuleEvaluator.cs:36-40)
        "customer",
        {
            "GroupBy": ["c_mktsegment", "c_nationkey"],
            "Aggregation": {"AggregateFunction": "Count"},
        },
        group_by_mode="first",
    ),
    "agg_argmin_lineitem": RuleWorkload(
        "lineitem",
        {
            "Conditions": {
                "Conditions": [
                    {
                        "Property": "l_shipdate",
                        "Operator": "GreaterThanOrEqual",
                        "Value": "1995-01-01T00:00:00",
                    }
                ]
            },
            "GroupBy": ["l_returnflag", "l_linestatus"],
            "Aggregation": {
                "AggregateProperty": "l_extendedprice",
                "AggregateFunction": "Min",
            },
        },
    ),
    # --- multi-rule union-distinct (SURVEY §2.4) ---
    "multi_rule_union_distinct": MultiRuleWorkload(
        "customer",
        rules=[
            _cond("c_mktsegment", "Equal", "BUILDING"),
            _cond("c_acctbal", "GreaterThan", 9000),
        ],
    ),
    # --- beyond-reference set modes over the same rule batch (§2.5:
    # the reference has no set surface beyond union-distinct) ---
    "multi_rule_intersect": MultiRuleWorkload(
        "customer",
        rules=[
            _cond("c_mktsegment", "Equal", "BUILDING"),
            _cond("c_acctbal", "GreaterThan", 5000),
        ],
        combine="intersect",
    ),
    "multi_rule_except": MultiRuleWorkload(
        "customer",
        rules=[
            _cond("c_mktsegment", "Equal", "BUILDING"),
            _cond("c_acctbal", "GreaterThan", 5000),
        ],
        combine="except",
    ),
}
