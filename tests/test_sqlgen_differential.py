"""Differential tests: each rule runs through BOTH the Spark compiler and the
rule→SQL transpiler (DuckDB), and the row sets must agree — a local preview
of the driver's oracle gate (SURVEY.md §5 item 1/4)."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark import RuleDefinition, SqlGenerator, apply_rule

from .conftest import SF_DIR, assert_same_rows


def _check(spark, duck, table_df, table_name, rule_dict, params=None):
    rule = RuleDefinition.from_dict(rule_dict)
    spark_out = apply_rule(table_df, rule, external_params=params)
    sql = SqlGenerator(table_df.schema, external_params=params).rule_sql(rule, table_name)
    assert_same_rows(spark_out, duck.sql(sql))


@pytest.fixture(scope="module")
def customer(spark):
    return spark.read.parquet(f"{SF_DIR}/customer.parquet")


@pytest.fixture(scope="module")
def orders(spark):
    return spark.read.parquet(f"{SF_DIR}/orders.parquet")


@pytest.fixture(scope="module")
def part(spark):
    return spark.read.parquet(f"{SF_DIR}/part.parquet")


@pytest.fixture(scope="module")
def events(spark):
    from dynamicqueryengine_spark.sources.registry import load_table

    return load_table(spark, SF_DIR, "events")


def cond(prop, op, value=None):
    return {"Conditions": {"Conditions": [{"Property": prop, "Operator": op, "Value": value}]}}


class TestFilterParity:
    def test_comparisons(self, spark, testdata_duck, customer):
        _check(spark, testdata_duck, customer, "customer",
               cond("c_acctbal", "GreaterThan", 5000))
        _check(spark, testdata_duck, customer, "customer",
               cond("c_nationkey", "LessThanOrEqual", 10))
        _check(spark, testdata_duck, customer, "customer",
               cond("c_mktsegment", "Equal", "BUILDING"))
        _check(spark, testdata_duck, customer, "customer",
               cond("c_mktsegment", "NotEqual", "BUILDING"))

    def test_in_notin(self, spark, testdata_duck, customer):
        _check(spark, testdata_duck, customer, "customer",
               cond("c_mktsegment", "In", ["BUILDING", "MACHINERY"]))
        _check(spark, testdata_duck, customer, "customer",
               cond("c_mktsegment", "NotIn", ["BUILDING", "MACHINERY"]))

    def test_string_methods(self, spark, testdata_duck, part):
        _check(spark, testdata_duck, part, "part", cond("p_name", "Contains", "green"))
        _check(spark, testdata_duck, part, "part", cond("p_name", "NotContains", "blue"))
        _check(spark, testdata_duck, part, "part", cond("p_type", "StartsWith", "STANDARD"))
        _check(spark, testdata_duck, part, "part", cond("p_brand", "EndsWith", "#3"))

    def test_timestamp_comparison(self, spark, testdata_duck, orders):
        _check(spark, testdata_duck, orders, "orders",
               cond("o_orderdate", "LessThan", "1995-06-15T00:00:00"))

    def test_regex_count_ops(self, spark, testdata_duck, events):
        _check(spark, testdata_duck, events, "events",
               cond("props", "ContainIfCountIsGreater", {"Target": "a", "Threshold": "2"}))
        _check(spark, testdata_duck, events, "events",
               cond("props", "ContainIfCountIsLess", {"Target": "x", "Threshold": "1"}))
        _check(spark, testdata_duck, events, "events",
               cond("props", "MustContainIfCountIsGreater",
                    {"Target": "[0-9]", "Required": "ID", "Threshold": "3"}))

    def test_if_operator(self, spark, testdata_duck, orders):
        _check(spark, testdata_duck, orders, "orders",
               cond("o_orderstatus", "If", {
                   "Check": {"Property": "o_orderstatus", "Operator": "Equal", "Value": "O"},
                   "Then": {"Property": "o_totalprice", "Operator": "GreaterThan", "Value": 50000},
               }))

    def test_nested_boolean_tree(self, spark, testdata_duck, customer):
        rule = {
            "Conditions": {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "c_acctbal", "Operator": "GreaterThan", "Value": 0}
                ],
                "Groups": [
                    {
                        "LogicalOperator": "OR",
                        "Conditions": [
                            {"Property": "c_mktsegment", "Operator": "Equal", "Value": "BUILDING"},
                            {"Property": "c_mktsegment", "Operator": "Equal", "Value": "AUTOMOBILE"},
                        ],
                    },
                    {
                        "Negate": True,
                        "Conditions": [
                            {"Property": "c_nationkey", "Operator": "In", "Value": [1, 2, 3]}
                        ],
                    },
                ],
            }
        }
        _check(spark, testdata_duck, customer, "customer", rule)

    def test_dynamic_params(self, spark, testdata_duck, customer):
        rule = cond("c_mktsegment", "DynamicEqual")
        _check(spark, testdata_duck, customer, "customer", rule,
               params={"c_mktsegment": "BUILDING"})


class TestAggregateParity:
    def test_argmin_argmax(self, spark, testdata_duck, customer):
        for func in ("Min", "Max"):
            rule = {
                "GroupBy": ["c_mktsegment"],
                "Aggregation": {"AggregateProperty": "c_acctbal", "AggregateFunction": func},
            }
            _check(spark, testdata_duck, customer, "customer", rule)

    def test_multi_key_count(self, spark, testdata_duck, customer):
        rule = {
            "GroupBy": ["c_mktsegment", "c_nationkey"],
            "Aggregation": {"AggregateFunction": "Count"},
        }
        _check(spark, testdata_duck, customer, "customer", rule)

    def test_filter_then_argmax(self, spark, testdata_duck, orders):
        rule = {
            "Conditions": {"Conditions": [
                {"Property": "o_orderstatus", "Operator": "Equal", "Value": "O"}
            ]},
            "GroupBy": ["o_orderpriority"],
            "Aggregation": {"AggregateProperty": "o_totalprice", "AggregateFunction": "Max"},
        }
        _check(spark, testdata_duck, orders, "orders", rule)


class TestUnionParity:
    def test_union_distinct(self, spark, testdata_duck, customer):
        from dynamicqueryengine_spark import execute_rules

        rules_raw = [
            cond("c_mktsegment", "Equal", "BUILDING"),
            cond("c_acctbal", "GreaterThan", 9000),
        ]
        rules = [RuleDefinition.from_dict(r) for r in rules_raw]
        spark_out = execute_rules(customer, rules)
        sql = SqlGenerator(customer.schema).rules_union_sql(rules, "customer")
        assert_same_rows(spark_out, testdata_duck.sql(sql))
