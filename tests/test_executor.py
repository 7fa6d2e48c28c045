"""Multi-rule batch executor tests — union-distinct semantics
(RuleDefinitionExecutor.cs:8-28)."""

from __future__ import annotations

from dynamicqueryengine_spark import execute_rules

from .conftest import ids_of


def filt(prop, op, value):
    return {
        "Name": f"{prop}-{op}",
        "Conditions": {
            "Conditions": [{"Property": prop, "Operator": op, "Value": value}]
        },
    }


class TestExecuteRules:
    def test_union_distinct_of_overlapping_rules(self, users_df):
        rules = [
            filt("Title", "Equal", "Engineer"),      # u1,u4,u6,u8
            filt("CompanyCode", "Equal", "GLOBEX"),  # u4,u5,u6,u12
        ]
        got = execute_rules(users_df, rules)
        assert ids_of(got) == ["u1", "u12", "u4", "u5", "u6", "u8"]
        assert got.count() == 6  # u4/u6 overlap deduplicated

    def test_single_rule_batch(self, users_df):
        got = execute_rules(users_df, [filt("Title", "Equal", "Director")])
        assert ids_of(got) == ["u5"]

    def test_empty_rule_list_returns_empty(self, users_df):
        assert execute_rules(users_df, []).count() == 0

    def test_duplicate_rules_still_distinct(self, users_df):
        r = filt("Title", "Equal", "Director")
        got = execute_rules(users_df, [r, r, r])
        assert got.count() == 1

    def test_external_params_thread_through_all_rules(self, users_df):
        rules = [
            {
                "Name": "dyn",
                "Conditions": {
                    "Conditions": [
                        {"Property": "Title", "Operator": "DynamicEqual"}
                    ]
                },
            },
            filt("Title", "Equal", "Intern"),
        ]
        got = execute_rules(users_df, rules, external_params={"Title": "Director"})
        assert ids_of(got) == ["u10", "u12", "u5"]


class TestExecuteRulesSetModes:
    def test_intersect_keeps_rows_matching_every_rule(self, users_df):
        rules = [
            filt("Title", "Equal", "Engineer"),      # u1,u4,u6,u8
            filt("CompanyCode", "Equal", "GLOBEX"),  # u4,u5,u6,u12
        ]
        got = execute_rules(users_df, rules, combine="intersect")
        assert ids_of(got) == ["u4", "u6"]

    def test_except_keeps_first_minus_rest(self, users_df):
        rules = [
            filt("Title", "Equal", "Engineer"),      # u1,u4,u6,u8
            filt("CompanyCode", "Equal", "GLOBEX"),  # u4,u5,u6,u12
        ]
        got = execute_rules(users_df, rules, combine="except")
        assert ids_of(got) == ["u1", "u8"]

    def test_unknown_mode_raises(self, users_df):
        import pytest

        with pytest.raises(ValueError, match="unknown combine mode"):
            execute_rules(users_df, [filt("Title", "Equal", "x")], combine="xor")


class TestRegisterRuleView:
    def test_view_composes_with_sql(self, spark):
        from dynamicqueryengine_spark.operators.executor import (
            register_rule_view,
        )

        df = spark.createDataFrame(
            [(1, "US", 50), (2, "US", 150), (3, "DE", 200)],
            "id long, country string, score long",
        )
        rule = {
            "Conditions": {
                "Conditions": [
                    {"Property": "score", "Operator": "GreaterThan", "Value": 100}
                ]
            }
        }
        register_rule_view(df, "high_scores", rule)
        got = spark.sql(
            "SELECT country, count(*) AS n FROM high_scores "
            "GROUP BY country ORDER BY country"
        ).collect()
        assert [(r["country"], r["n"]) for r in got] == [("DE", 1), ("US", 1)]
