"""Schema validation of a rule against a DataFrame schema.

Replaces the reference's reflection-based validator
(DynamicQueryEngine.Core/Services/RuleValidator.cs:8-54): property names are
collected case-insensitively (RuleValidator.cs:10-13) and every condition
property (RuleValidator.cs:22-28) and group-by field (RuleValidator.cs:37-43)
must resolve; GroupBy without an Aggregation is rejected
(RuleValidator.cs:45-48). Error messages match the reference verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType

from ..errors import aggregation_required, group_by_invalid, property_not_found
from .model import RuleDefinition

# Operators whose Property is an external-parameter key only, never a column —
# the Dynamic* unary family tests the parameter value itself
# (IQueryableRuleEvaluator.cs:249-272); DynamicEqual compares a real column so
# it IS validated. The reference validates all of these against the row type,
# but its sample flows always use real property names; we validate DynamicEqual
# and skip pure-parameter ops to keep them usable with synthetic keys.
_PARAM_ONLY_OPS = frozenset(
    {"dynamicempty", "dynamicnotempty", "dynamicnullorempty", "dynamicnotnullorempty"}
)


def schema_fields_ci(schema: StructType) -> dict[str, str]:
    """lowercase name -> actual name, mirroring the case-insensitive
    HashSet of property names (RuleValidator.cs:10-13)."""
    return {f.name.lower(): f.name for f in schema.fields}


def validate_rule(
    rule: RuleDefinition,
    schema: StructType,
    type_name: str = "Row",
) -> None:
    """Raise RuleValidationError on the first invalid name, with the
    reference's exact message surface."""
    fields = schema_fields_ci(schema)

    if rule.conditions is not None:
        from ..operators.registry import lookup_operator

        for cond in rule.conditions.iter_conditions():
            op = cond.operator.lower()
            if op in _PARAM_ONLY_OPS:
                continue
            custom = lookup_operator(op)
            if custom is not None and custom.param_only:
                # registered param-only ops mirror the Dynamic* family:
                # their Property is a parameter key, never a column
                continue
            if cond.property and cond.property.lower() not in fields:
                # dotted properties walk struct children (beyond-
                # reference, r13) — delegate to the compiler's resolver,
                # which raises the same reference-shaped error
                from ..operators.predicates import resolve_field

                resolve_field(schema, cond.property, type_name)

    if rule.group_by:
        for gb in rule.group_by:
            if gb.lower() not in fields:
                raise group_by_invalid(gb)
        if rule.aggregation is None:
            raise aggregation_required()


def validate(rule: RuleDefinition, df: DataFrame, type_name: str = "Row") -> None:
    validate_rule(rule, df.schema, type_name)
