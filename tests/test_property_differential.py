"""Property-based differential tests (SURVEY.md §5 item 4): hypothesis
generates random rule trees (nested groups, mixed operators, typed values);
each rule compiles through BOTH the Spark predicate compiler and the SQL
transpiler, and the row sets must agree on the sf0.001 customer table.

This is the strongest net over the predicate surface: any divergence in
null handling, coercion, negation, or nesting between the two compilers
(or between Spark and DuckDB semantics) fails here with a minimal
counterexample rule."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dynamicqueryengine_spark import RuleDefinition, SqlGenerator, apply_rule

from .conftest import SF_DIR, assert_same_rows

# --- rule-document strategies over the customer schema -------------------

_NUMERIC_VALUES = st.one_of(
    st.integers(min_value=-100, max_value=10_000),
    st.floats(min_value=-100, max_value=10_000, allow_nan=False, width=32),
)
_SEGMENTS = ["BUILDING", "AUTOMOBILE", "MACHINERY", "HOUSEHOLD", "FURNITURE", "bogus"]

_numeric_cond = st.builds(
    lambda prop, op, val: {"Property": prop, "Operator": op, "Value": val},
    st.sampled_from(["c_acctbal", "c_nationkey", "c_custkey"]),
    st.sampled_from(
        ["Equal", "NotEqual", "GreaterThan", "GreaterThanOrEqual", "LessThan", "LessThanOrEqual"]
    ),
    _NUMERIC_VALUES,
)

_string_eq_cond = st.builds(
    lambda op, val: {"Property": "c_mktsegment", "Operator": op, "Value": val},
    st.sampled_from(["Equal", "NotEqual"]),
    st.sampled_from(_SEGMENTS),
)

_string_method_cond = st.builds(
    lambda op, val: {"Property": "c_name", "Operator": op, "Value": val},
    st.sampled_from(["Contains", "NotContains", "StartsWith", "EndsWith"]),
    st.sampled_from(["Customer", "0000", "1", "zzz", ""]),
)

_in_cond = st.builds(
    lambda op, vals: {"Property": "c_mktsegment", "Operator": op, "Value": vals},
    st.sampled_from(["In", "NotIn"]),
    st.lists(st.sampled_from(_SEGMENTS), min_size=1, max_size=4),
)

_null_cond = st.builds(
    lambda prop, op: {"Property": prop, "Operator": op},
    st.sampled_from(["c_name", "c_mktsegment", "c_acctbal"]),
    st.sampled_from(["Null", "NotNull", "Empty", "NotEmpty", "NullOrEmpty", "NotNullOrEmpty"]),
)

_regex_cond = st.builds(
    lambda op, target, thr: {
        "Property": "c_name",
        "Operator": op,
        "Value": {"Target": target, "Threshold": str(thr)},
    },
    st.sampled_from(["ContainIfCountIsGreater", "ContainIfCountIsLess"]),
    st.sampled_from(["0", "[0-9]", "Customer", "00"]),
    st.integers(min_value=0, max_value=6),
)

_must_contain_cond = st.builds(
    lambda target, req, thr: {
        "Property": "c_name",
        "Operator": "MustContainIfCountIsGreater",
        "Value": {"Target": target, "Required": req, "Threshold": str(thr)},
    },
    st.sampled_from(["0", "[1-5]"]),
    st.sampled_from(["customer", "CUSTOMER", "#0000"]),
    st.integers(min_value=0, max_value=5),
)

_if_cond = st.builds(
    lambda check, then: {"Property": "c_name", "Operator": "If",
                         "Value": {"Check": check, "Then": then}},
    st.one_of(_numeric_cond, _string_eq_cond),
    st.one_of(_numeric_cond, _string_eq_cond, _string_method_cond),
)

_leaf = st.one_of(
    _numeric_cond,
    _string_eq_cond,
    _string_method_cond,
    _in_cond,
    _null_cond,
    _regex_cond,
    _must_contain_cond,
    _if_cond,
)


def _group(children=None):
    subgroups = (
        st.lists(children, max_size=2) if children is not None else st.just([])
    )
    return st.builds(
        lambda op, conds, groups, neg: {
            "LogicalOperator": op,
            "Conditions": conds,
            "Groups": groups,
            "Negate": neg,
        },
        st.sampled_from(["AND", "OR", "and", "or"]),
        st.lists(_leaf, max_size=3),
        subgroups,
        st.booleans(),
    )


_condition_tree = st.recursive(_group(), _group, max_leaves=8)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(tree=_condition_tree)
def test_random_rule_tree_matches_oracle(tree, spark, testdata_duck):
    rule = RuleDefinition.from_dict({"Name": "prop", "Conditions": tree})
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    spark_out = apply_rule(customer, rule)
    sql = SqlGenerator(customer.schema).rule_sql(rule, "customer")
    assert_same_rows(spark_out, testdata_duck.sql(sql))


_ORDERS_VALUES = st.one_of(
    st.sampled_from(["O", "F", "P"]),
    st.sampled_from(
        ["1992-01-01T00:00:00", "1995-06-15T12:30:00", "1998-01-01T00:00:00"]
    ),
)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    op=st.sampled_from(
        ["Equal", "NotEqual", "GreaterThan", "GreaterThanOrEqual", "LessThan", "LessThanOrEqual"]
    ),
    use_ts=st.booleans(),
    value=_ORDERS_VALUES,
    dyn=st.booleans(),
)
def test_orders_timestamp_and_dynamic_params(op, use_ts, value, dyn, spark, testdata_duck):
    """Timestamp literals and external-parameter resolution across both
    compilers on the orders table."""
    from hypothesis import assume

    # ordering ops on a string column trigger the numeric-coercion path,
    # which (faithfully to decimal.Parse) REJECTS non-numeric literals —
    # not a differential case
    assume(use_ts or op in ("Equal", "NotEqual"))
    prop = "o_orderdate" if use_ts else "o_orderstatus"
    value = value if use_ts == ("-" in str(value)) else ("1994-01-01T00:00:00" if use_ts else "O")
    cond = {"Property": prop, "Operator": op}
    params = None
    if dyn:
        params = {prop: value}  # Value null → external-param resolution
    else:
        cond["Value"] = value
    rule = RuleDefinition.from_dict({"Conditions": {"Conditions": [cond]}})
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    spark_out = apply_rule(orders, rule, external_params=params)
    sql = SqlGenerator(orders.schema, external_params=params).rule_sql(rule, "orders")
    assert_same_rows(spark_out, testdata_duck.sql(sql))


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(
    tree=_condition_tree,
    key=st.sampled_from(["c_mktsegment", "c_nationkey"]),
    func=st.sampled_from(["Min", "Max", "Count"]),
)
def test_random_filter_plus_aggregate_matches_oracle(tree, key, func, spark, testdata_duck):
    rule = RuleDefinition.from_dict(
        {
            "Name": "prop-agg",
            "Conditions": tree,
            "GroupBy": [key],
            "Aggregation": {
                "AggregateProperty": "c_acctbal" if func != "Count" else None,
                "AggregateFunction": func,
            },
        }
    )
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    spark_out = apply_rule(customer, rule)
    sql = SqlGenerator(customer.schema).rule_sql(rule, "customer")
    assert_same_rows(spark_out, testdata_duck.sql(sql))


# --- rule_exact_conjuncts equivalence (r11) -------------------------------
#
# vt_delete(rule=...) records a plain replayable predicate whenever
# rule_exact_conjuncts claims the rule is EXACTLY a skip-grammar
# conjunction — the streaming source then replays that predicate instead
# of the rule. Any over- or under-claim silently corrupts the streamed
# CDC, so the claim gets its own property net: for random AND-only trees
# built from exact-eligible leaves, the extractor must return conjuncts
# and the conjunction's row set must equal the fully-compiled rule's row
# set on the real customer table. (Inexact shapes — OR, negation,
# string-method leaves — are pinned to return None by
# tests/test_versioned.py::TestRuleDeleteReplayability.)

_exact_numeric = st.builds(
    lambda prop, op, val: {"Property": prop, "Operator": op, "Value": val},
    st.sampled_from(["c_acctbal", "c_nationkey", "c_custkey"]),
    st.sampled_from(
        ["Equal", "GreaterThan", "GreaterThanOrEqual", "LessThan",
         "LessThanOrEqual"]
    ),
    _NUMERIC_VALUES,
)
_exact_string_eq = st.builds(
    lambda val: {"Property": "c_mktsegment", "Operator": "Equal",
                 "Value": val},
    st.sampled_from(_SEGMENTS),
)
_exact_in = st.builds(
    lambda vals: {"Property": "c_mktsegment", "Operator": "In",
                  "Value": vals},
    st.lists(st.sampled_from(_SEGMENTS), min_size=1, max_size=4),
)
_exact_null = st.builds(
    lambda prop, op: {"Property": prop, "Operator": op},
    st.sampled_from(["c_name", "c_acctbal"]),
    st.sampled_from(["Null", "NotNull"]),
)
_exact_leaf = st.one_of(
    _exact_numeric, _exact_string_eq, _exact_in, _exact_null
)


def _and_group(children=None):
    subgroups = (
        st.lists(children, max_size=2)
        if children is not None
        else st.just([])
    )
    return st.builds(
        lambda conds, groups: {
            "LogicalOperator": "AND",
            "Conditions": conds,
            "Groups": groups,
            "Negate": False,
        },
        st.lists(_exact_leaf, min_size=1, max_size=3),
        subgroups,
    )


_exact_tree = st.recursive(_and_group(), _and_group, max_leaves=6)


@settings(
    max_examples=60,
    deadline=None,
    suppress_health_check=[
        HealthCheck.too_slow,
        HealthCheck.function_scoped_fixture,
    ],
)
@given(tree=_exact_tree)
def test_exact_conjuncts_equal_compiled_rule(tree, spark):
    from pyspark.sql import functions as F

    from dynamicqueryengine_spark.operators.predicates import (
        compile_predicate,
        rule_exact_conjuncts,
    )
    from dynamicqueryengine_spark.sources.versioned import _conjunct_column

    rule = RuleDefinition.from_dict({"Name": "prop", "Conditions": tree})
    df = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    conjuncts = rule_exact_conjuncts(rule, df.schema, None)
    # every tree this strategy builds is exact-eligible: an extractor
    # that refuses one under-claims and silently forces change-row
    # materialization — also a bug
    assert conjuncts is not None
    compiled = df.filter(
        F.coalesce(
            compile_predicate(rule.conditions, df.schema, None),
            F.lit(False),
        )
    )
    cond = None
    for col, op, value in conjuncts:
        c = _conjunct_column(col, op, value)
        cond = c if cond is None else (cond & c)
    replayed = df.filter(F.coalesce(cond, F.lit(False)))
    left = {tuple(r) for r in compiled.collect()}
    right = {tuple(r) for r in replayed.collect()}
    assert left == right
