"""Argmin/argmax null-ordering parity: min_by/max_by over the struct
ordering key must agree with the SQL oracle's ASC NULLS FIRST / DESC NULLS
LAST window formulation even when the aggregate column holds NULLs and
malformed numeric strings (try_cast → NULL)."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark import RuleDefinition, SqlGenerator, apply_rule

from .conftest import assert_same_rows


@pytest.mark.parametrize("func", ["Min", "Max"])
def test_argextreme_with_null_and_malformed_ordering(users_df, users_duck, func):
    rule = RuleDefinition.from_dict(
        {
            "GroupBy": ["CompanyCode"],
            "Aggregation": {
                "AggregateProperty": "NationalIdNumber",
                "AggregateFunction": func,
            },
        }
    )
    spark_out = apply_rule(users_df, rule)
    sql = SqlGenerator(users_df.schema).rule_sql(rule, "users")
    assert_same_rows(spark_out, users_duck.sql(sql))
