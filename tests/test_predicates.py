"""Predicate-operator unit tests — every operator family from SURVEY.md §2.2
against the reference-shaped ``users`` fixture, including the deliberate
oddities (tautological NotNullOrEmpty, vacuous-true If, numeric ordering on
string columns, case-sensitivity split)."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark import (
    RuleCompilationError,
    RuleDefinition,
    UnsupportedOperatorError,
    apply_rule,
)

from .conftest import ids_of


def rule(conditions, **kw):
    return RuleDefinition.from_dict({"Name": "t", "Conditions": conditions, **kw})


def run(df, conditions, params=None, **kw):
    return apply_rule(df, rule(conditions), external_params=params, **kw)


def cond(prop, op, value=None):
    return {"Conditions": [{"Property": prop, "Operator": op, "Value": value}]}


class TestComparisons:
    def test_equal(self, users_df):
        assert ids_of(run(users_df, cond("Title", "Equal", "Director"))) == ["u5"]

    def test_equal_case_insensitive_property_and_operator(self, users_df):
        got = run(users_df, cond("tItLe", "eQuAl", "Director"))
        assert ids_of(got) == ["u5"]

    def test_not_equal_excludes_nulls(self, users_df):
        # Spark/SQL semantics: NULL != 'Engineer' is NULL → dropped (u9 out)
        got = ids_of(run(users_df, cond("Title", "NotEqual", "Engineer")))
        assert got == ["u10", "u11", "u12", "u2", "u3", "u5", "u7"]

    def test_greaterthan_on_string_is_numeric_not_lexicographic(self, users_df):
        # "75" > "250" lexicographically, but numerically 75 < 250:
        # the reference decimal.Parses string columns for ordering ops
        # (IQueryableRuleEvaluator.cs:128-132)
        got = ids_of(run(users_df, cond("NationalIdNumber", "GreaterThan", 240)))
        assert got == ["u11", "u2", "u3", "u5"]  # 250,250,300,999 — not "75"

    def test_malformed_numeric_string_drops_row(self, users_df):
        # "abc" → TRY-cast NULL → dropped (documented divergence from
        # decimal.Parse throw, SURVEY.md §1.4)
        got = ids_of(run(users_df, cond("NationalIdNumber", "GreaterThanOrEqual", 0)))
        assert "u8" not in got and "u6" not in got and "u7" not in got

    def test_lessthan_string_numeric(self, users_df):
        got = ids_of(run(users_df, cond("NationalIdNumber", "LessThan", "42")))
        assert got == ["u10", "u12"]  # 7 and 0; "42" itself excluded (strict <)

    def test_boolean_equal(self, users_df):
        got = ids_of(run(users_df, cond("IsActive", "Equal", False)))
        assert got == ["u10", "u2", "u6"]

    def test_boolean_equal_from_string(self, users_df):
        got = ids_of(run(users_df, cond("IsActive", "Equal", "false")))
        assert got == ["u10", "u2", "u6"]

    def test_in(self, users_df):
        got = ids_of(run(users_df, cond("Title", "In", ["Director", "Intern"])))
        assert got == ["u10", "u12", "u5"]

    def test_not_in(self, users_df):
        got = ids_of(run(users_df, cond("Title", "NotIn", ["Engineer", "Manager"])))
        assert got == ["u10", "u12", "u5"]  # null Title (u9) dropped

    def test_in_numeric_elements_superset(self, users_df):
        # documented superset: reference only accepts string elements
        got = ids_of(run(users_df, cond("RegNo", "In", [10, 20])))
        assert got == ["u1", "u2"]

    def test_in_non_array_raises(self, users_df):
        with pytest.raises(RuleCompilationError, match="IN or NOTIN operator expects array."):
            run(users_df, cond("Title", "In", "Engineer")).collect()


class TestStringMethods:
    def test_contains_case_sensitive(self, users_df):
        assert ids_of(run(users_df, cond("LoginName", "Contains", "ob"))) == ["u2", "u3"]
        # "Bob" contains "ob" but not "OB"
        assert ids_of(run(users_df, cond("LoginName", "Contains", "OB"))) == []

    def test_not_contains(self, users_df):
        got = ids_of(run(users_df, cond("LoginName", "NotContains", "a")))
        # drops nulls (u9); keeps logins without lowercase 'a':
        # Bob,bobby? bobby has no 'a' → u3 stays; eve,frank? frank has 'a'
        assert "u9" not in got and "u1" not in got and "u4" not in got

    def test_startswith(self, users_df):
        assert ids_of(run(users_df, cond("LoginName", "StartsWith", "bo"))) == ["u3"]

    def test_endswith(self, users_df):
        assert ids_of(run(users_df, cond("LoginName", "EndsWith", "admin"))) == ["u12"]


class TestNullEmptyFamily:
    def test_null(self, users_df):
        assert ids_of(run(users_df, cond("NationalIdNumber", "Null"))) == ["u6"]

    def test_notnull(self, users_df):
        got = ids_of(run(users_df, cond("NationalIdNumber", "NotNull")))
        assert "u6" not in got and len(got) == 11

    def test_empty_string_counts_null_and_blank(self, users_df):
        assert ids_of(run(users_df, cond("NationalIdNumber", "Empty"))) == ["u6", "u7"]

    def test_notempty(self, users_df):
        got = ids_of(run(users_df, cond("NationalIdNumber", "NotEmpty")))
        assert got == sorted({f"u{i}" for i in range(1, 13)} - {"u6", "u7"})

    def test_nullorempty(self, users_df):
        assert ids_of(run(users_df, cond("LoginName", "NullOrEmpty"))) == ["u10", "u9"]

    def test_notnullorempty_is_tautology_in_strict_mode(self, users_df):
        # faithful reference bug (IQueryableRuleEvaluator.cs:210-216)
        got = run(users_df, cond("LoginName", "NotNullOrEmpty"))
        assert got.count() == 12

    def test_notnullorempty_sane_variant(self, users_df):
        got = run(users_df, cond("LoginName", "NotNullOrEmpty"), strict_compat=False)
        assert ids_of(got) == sorted({f"u{i}" for i in range(1, 13)} - {"u9", "u10"})

    def test_notempty_on_bool_is_has_value(self, users_df):
        got = ids_of(run(users_df, cond("IsActive", "NotEmpty")))
        assert "u8" not in got and len(got) == 11


class TestRegexCountFamily:
    def test_contain_if_count_greater(self, users_df):
        # logins with >1 'b': bobby (b,b,b → 3), Bob (1 lowercase b)
        got = ids_of(
            run(users_df, cond("LoginName", "ContainIfCountIsGreater",
                               {"Target": "b", "Threshold": "1"}))
        )
        assert got == ["u3"]

    def test_contain_if_count_less(self, users_df):
        got = ids_of(
            run(users_df, cond("LoginName", "ContainIfCountIsLess",
                               {"Target": "e", "Threshold": "1"}))
        )
        # zero 'e's and non-null: Bob, bobby, carol? carol has no e → included
        assert "u6" not in got and "u4" in got and "u2" in got

    def test_must_contain_required_is_case_insensitive(self, users_df):
        # Required "ADMIN" matches "ivan_admin" case-insensitively
        # (IQueryableRuleEvaluator.cs:451-456), while Contains (op #9) is
        # case-sensitive — the documented split.
        got = ids_of(
            run(users_df, cond("LoginName", "MustContainIfCountIsGreater",
                               {"Target": "i", "Required": "ADMIN", "Threshold": "1"}))
        )
        assert got == ["u12"]

    def test_threshold_is_strict(self, users_df):
        got = ids_of(
            run(users_df, cond("LoginName", "ContainIfCountIsGreater",
                               {"Target": "b", "Threshold": "3"}))
        )
        assert got == []  # bobby has exactly 3 → strict > fails

    def test_missing_target_raises(self, users_df):
        with pytest.raises(RuleCompilationError, match="Target field is mandatory."):
            run(users_df, cond("LoginName", "ContainIfCountIsGreater", {"Threshold": "1"}))


class TestIfOperator:
    def test_if_is_material_implication(self, users_df):
        # If Title == Manager then IsActive == True; non-managers pass vacuously
        c = cond("Title", "If", {
            "Check": {"Property": "Title", "Operator": "Equal", "Value": "Manager"},
            "Then": {"Property": "IsActive", "Operator": "Equal", "Value": True},
        })
        got = ids_of(run(users_df, c))
        assert "u2" not in got          # manager, inactive → fails
        assert "u3" in got and "u11" in got  # managers, active
        assert "u1" in got and "u5" in got   # non-managers pass vacuously

    def test_if_missing_branch_raises(self, users_df):
        with pytest.raises(RuleCompilationError, match="Both 'Check' and 'Then'"):
            run(users_df, cond("Title", "If", {"Check": {"Property": "Title", "Operator": "Null"}}))


class TestDynamicOperators:
    def test_dynamic_equal(self, users_df):
        got = run(users_df, cond("Title", "DynamicEqual"), params={"Title": "Director"})
        assert ids_of(got) == ["u5"]

    def test_dynamic_equal_null_param_matches_null_rows(self, users_df):
        got = run(users_df, cond("Title", "DynamicEqual"), params={"Title": None})
        assert ids_of(got) == ["u9"]

    def test_value_null_resolves_external_param(self, users_df):
        # non-Dynamic op with null Value also reads externalParams
        # (IQueryableRuleEvaluator.cs:236-247)
        got = run(users_df, cond("Title", "Equal", None), params={"Title": "Director"})
        assert ids_of(got) == ["u5"]

    def test_missing_param_raises_reference_message(self, users_df):
        with pytest.raises(
            RuleCompilationError,
            match="External parameter 'Title' is missing for 'DynamicEqual' operator.",
        ):
            run(users_df, cond("Title", "DynamicEqual"))

    def test_dynamic_nullorempty_is_row_independent(self, users_df):
        all_or_nothing = run(
            users_df, cond("p", "DynamicNullOrEmpty"), params={"p": "  "}
        )
        assert all_or_nothing.count() == 12  # whitespace param → TRUE for all rows
        none_pass = run(users_df, cond("p", "DynamicNullOrEmpty"), params={"p": "x"})
        assert none_pass.count() == 0

    def test_dynamic_notempty_collection_param(self, users_df):
        assert run(users_df, cond("p", "DynamicNotEmpty"), params={"p": [1]}).count() == 12
        assert run(users_df, cond("p", "DynamicNotEmpty"), params={"p": []}).count() == 0
        assert run(users_df, cond("p", "DynamicEmpty"), params={"p": []}).count() == 12


class TestBooleanCombinators:
    def test_nested_tree(self, users_df):
        conditions = {
            "LogicalOperator": "AND",
            "Conditions": [
                {"Property": "IsActive", "Operator": "Equal", "Value": True}
            ],
            "Groups": [
                {
                    "LogicalOperator": "OR",
                    "Conditions": [
                        {"Property": "Title", "Operator": "Equal", "Value": "Engineer"},
                        {"Property": "Title", "Operator": "Equal", "Value": "Intern"},
                    ],
                }
            ],
        }
        got = ids_of(run(users_df, conditions))
        assert got == ["u1", "u12", "u4"]

    def test_negate_group(self, users_df):
        conditions = {
            "Negate": True,
            "Conditions": [
                {"Property": "CompanyCode", "Operator": "In", "Value": ["ACME", "GLOBEX"]}
            ],
        }
        got = ids_of(run(users_df, conditions))
        # NOT(code IN (...)): null code (u10) → NOT(NULL) = NULL → dropped
        assert got == ["u7", "u8", "u9"]

    def test_empty_group_passes_everything(self, users_df):
        assert run(users_df, {"Conditions": [], "Groups": []}).count() == 12

    def test_no_conditions_at_all_skips_filter(self, users_df):
        got = apply_rule(users_df, RuleDefinition.from_dict({"Name": "nofilter"}))
        assert got.count() == 12

    def test_unknown_operator_raises(self, users_df):
        with pytest.raises(UnsupportedOperatorError):
            run(users_df, cond("Title", "Between", [1, 2]))


class TestSkipConjunctExtraction:
    """rule_skip_conjuncts (r9): the bridge from rule trees to versioned-
    table file pruning. Soundness = every returned conjunct is REQUIRED
    by the rule and compares in the stats' native ordering."""

    def _extract(self, df, conditions, params=None):
        from dynamicqueryengine_spark.operators.predicates import (
            rule_skip_conjuncts,
        )

        return rule_skip_conjuncts(rule(conditions), df.schema, params)

    def test_and_chain_extracts_all_eligible(self, spark):
        df = spark.createDataFrame([(1, "a")], "id long, name string")
        got = self._extract(
            df,
            {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "id", "Operator": "GreaterThan", "Value": 5},
                    {"Property": "id", "Operator": "LessThanOrEqual",
                     "Value": 9},
                    {"Property": "name", "Operator": "Equal", "Value": "x"},
                    {"Property": "name", "Operator": "Contains", "Value": "y"},
                ],
            },
        )
        assert got == [("id", ">", 5), ("id", "<=", 9), ("name", "=", "x")]

    def test_or_group_yields_nothing(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        got = self._extract(
            df,
            {
                "LogicalOperator": "OR",
                "Conditions": [
                    {"Property": "id", "Operator": "GreaterThan", "Value": 5},
                    {"Property": "id", "Operator": "LessThan", "Value": 2},
                ],
            },
        )
        assert got == []

    def test_single_child_or_is_required(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        got = self._extract(
            df,
            {
                "LogicalOperator": "OR",
                "Conditions": [
                    {"Property": "id", "Operator": "Equal", "Value": 3},
                ],
            },
        )
        assert got == [("id", "=", 3)]

    def test_negated_group_yields_nothing(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        got = self._extract(
            df,
            {
                "Negate": True,
                "Conditions": [
                    {"Property": "id", "Operator": "GreaterThan", "Value": 5},
                ],
            },
        )
        assert got == []

    def test_nested_and_recurses_or_subtree_skipped(self, spark):
        df = spark.createDataFrame([(1, 2)], "a long, b long")
        got = self._extract(
            df,
            {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "a", "Operator": "GreaterThan", "Value": 1},
                ],
                "Groups": [
                    {
                        "LogicalOperator": "AND",
                        "Conditions": [
                            {"Property": "b", "Operator": "LessThan",
                             "Value": 9},
                        ],
                    },
                    {
                        "LogicalOperator": "OR",
                        "Conditions": [
                            {"Property": "a", "Operator": "Equal", "Value": 0},
                            {"Property": "b", "Operator": "Equal", "Value": 0},
                        ],
                    },
                ],
            },
        )
        assert got == [("a", ">", 1), ("b", "<", 9)]

    def test_string_column_range_excluded_equal_kept(self, users_df):
        """Range ops on STRING columns compare NUMERICALLY in the
        reference, but footer stats are lexicographic — range conjuncts
        must not be emitted; string Equal is sound and kept."""
        got = self._extract(
            users_df,
            {
                "LogicalOperator": "AND",
                "Conditions": [
                    {"Property": "RegNo", "Operator": "GreaterThan",
                     "Value": "100"},
                    {"Property": "Title", "Operator": "Equal",
                     "Value": "Director"},
                ],
            },
        )
        assert got == [("Title", "=", "Director")]

    def test_in_coerces_and_drops_nulls(self, spark):
        df = spark.createDataFrame([(1,)], "id long")
        got = self._extract(
            df,
            cond("id", "In", ["3", None, 5]),
        )
        assert got == [("id", "in", [3, 5])]

    def test_value_coerced_to_column_type(self, spark):
        df = spark.createDataFrame([(1.5,)], "x double")
        got = self._extract(df, cond("x", "GreaterThanOrEqual", "2"))
        assert got == [("x", ">=", 2.0)]

    def test_dynamic_equal_resolves_param(self, users_df):
        got = self._extract(
            users_df,
            cond("Title", "DynamicEqual"),
            params={"Title": "Director"},
        )
        assert got == [("Title", "=", "Director")]

    def test_dynamic_equal_literal_value_never_drives_pruning(self, users_df):
        """compile_condition resolves DynamicEqual EXCLUSIVELY from the
        external params — a stray literal Value on the condition is dead
        to the compiled filter, so pruning on it would drop files the
        filter matches (r10 advice). The conjunct must follow the PARAM,
        and emit nothing when the param is absent."""
        got = self._extract(
            users_df,
            cond("Title", "DynamicEqual", "Manager"),
            params={"Title": "Director"},
        )
        assert got == [("Title", "=", "Director")]
        # no param at all: the real compile errors — nothing prunable,
        # and the literal "Manager" must NOT leak into a conjunct
        assert (
            self._extract(users_df, cond("Title", "DynamicEqual", "Manager"))
            == []
        )

    def test_accepts_rule_group_and_dict_inputs(self, spark):
        """rule_skip_conjuncts takes a RuleDefinition, a bare
        ConditionGroup, or raw rule/group dicts (r10 advice: the old
        duck-typed getattr('conditions') walked a ConditionGroup's LEAF
        LIST and crashed, and rejected Mapping inputs)."""
        from dynamicqueryengine_spark.operators.predicates import (
            rule_skip_conjuncts,
        )
        from dynamicqueryengine_spark.plans.model import ConditionGroup

        df = spark.createDataFrame([(1,)], "id long")
        leaf = {"Property": "id", "Operator": "GreaterThan", "Value": 30}
        group_dict = {"Conditions": [leaf]}
        rule_dict = {"Name": "t", "Conditions": group_dict}
        expect = [("id", ">", 30)]
        assert rule_skip_conjuncts(rule(group_dict), df.schema) == expect
        assert (
            rule_skip_conjuncts(
                ConditionGroup.from_dict(group_dict), df.schema
            )
            == expect
        )
        assert rule_skip_conjuncts(rule_dict, df.schema) == expect
        assert rule_skip_conjuncts(group_dict, df.schema) == expect

    def test_missing_param_and_null_equal_excluded(self, users_df):
        # a MISSING external param is the real compile's error — nothing
        # to prune on; an explicitly-NULL param compiles to isNull, which
        # r9 prunes on exact footer null counts
        assert self._extract(users_df, cond("Title", "Equal", None)) == []
        assert self._extract(users_df, cond("Title", "DynamicEqual")) == []
        got = self._extract(
            users_df, cond("Title", "DynamicEqual"), {"Title": None}
        )
        assert got and got[0][1] == "isnull"


class TestNestedDottedProperties:
    """r13 beyond-reference: Condition.Property walks struct children
    case-insensitively; SQL mirror renders the same dotted access; the
    reference error surface names the full dotted path."""

    @pytest.fixture()
    def nested_df(self, spark):
        return spark.createDataFrame(
            [(1, ("a", 5.0)), (2, ("b", 50.0)), (3, (None, None))],
            "id long, payload struct<tag string, amount double>",
        )

    def test_nested_compare_and_case_insensitive(self, spark, nested_df):
        from dynamicqueryengine_spark import RuleDefinition, apply_rule

        rule = RuleDefinition.from_dict(
            {
                "Conditions": {
                    "Conditions": [
                        {
                            "Property": "PAYLOAD.Amount",
                            "Operator": "GreaterThan",
                            "Value": 10,
                        }
                    ]
                }
            }
        )
        assert [r["id"] for r in apply_rule(nested_df, rule).collect()] == [2]

    def test_nested_null_and_string_ops(self, spark, nested_df):
        from dynamicqueryengine_spark import RuleDefinition, apply_rule

        nulls = RuleDefinition.from_dict(
            {
                "Conditions": {
                    "Conditions": [
                        {"Property": "payload.tag", "Operator": "Null"}
                    ]
                }
            }
        )
        assert [
            r["id"] for r in apply_rule(nested_df, nulls).collect()
        ] == [3]
        contains = RuleDefinition.from_dict(
            {
                "Conditions": {
                    "Conditions": [
                        {
                            "Property": "payload.tag",
                            "Operator": "Contains",
                            "Value": "b",
                        }
                    ]
                }
            }
        )
        assert [
            r["id"] for r in apply_rule(nested_df, contains).collect()
        ] == [2]

    def test_sql_mirror_renders_dotted_access(self, spark, nested_df):
        from dynamicqueryengine_spark import RuleDefinition, SqlGenerator

        rule = RuleDefinition.from_dict(
            {
                "Conditions": {
                    "Conditions": [
                        {
                            "Property": "payload.amount",
                            "Operator": "GreaterThanOrEqual",
                            "Value": 50,
                        }
                    ]
                }
            }
        )
        sql = SqlGenerator(nested_df.schema).rule_sql(rule, "t")
        assert "payload.amount >= " in sql

    def test_error_names_full_dotted_path(self, spark, nested_df):
        from dynamicqueryengine_spark import (
            RuleDefinition,
            RuleValidationError,
            apply_rule,
        )

        bad = RuleDefinition.from_dict(
            {
                "Conditions": {
                    "Conditions": [
                        {
                            "Property": "payload.nope",
                            "Operator": "Equal",
                            "Value": 1,
                        }
                    ]
                }
            }
        )
        with pytest.raises(RuleValidationError, match="payload.nope"):
            apply_rule(nested_df, bad)

    def test_literal_dotted_top_level_column_wins(self, spark):
        from dynamicqueryengine_spark.operators.predicates import (
            resolve_field,
        )
        from pyspark.sql.types import (
            DoubleType,
            StringType,
            StructField,
            StructType,
        )

        schema = StructType(
            [
                StructField("payload.amount", StringType()),
                StructField(
                    "payload",
                    StructType([StructField("amount", DoubleType())]),
                ),
            ]
        )
        f = resolve_field(schema, "payload.amount")
        assert isinstance(f.dataType, StringType)  # exact name beat walk
