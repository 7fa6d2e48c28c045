"""Rule execution pipeline: validate → compile → filter → aggregate; plus the
multi-rule union-distinct batch executor.

Mirrors ``ApplyRule`` (IQueryableRuleEvaluator.cs:14-75) and
``RuleDefinitionExecutor`` (RuleDefinitionExecutor.cs:8-40). Everything here
is driver-side plan construction — Catalyst sees the whole pipeline
(including the multi-rule union) as ONE logical plan, so common scans
dedupe and filters push down across the union.
"""

from __future__ import annotations

from functools import reduce
from typing import Any, Mapping, Sequence

from pyspark.sql import DataFrame

from ..plans.model import RuleDefinition
from ..plans.validate import validate_rule
from .aggregate import apply_aggregation
from .predicates import compile_predicate


def apply_rule(
    df: DataFrame,
    rule: RuleDefinition | Mapping[str, Any],
    external_params: Mapping[str, Any] | None = None,
    strict_compat: bool = True,
    group_by_mode: str = "all",
    type_name: str = "Row",
) -> DataFrame:
    """Single-rule pipeline (IQueryableRuleEvaluator.cs:14-75).

    1. validate against the DataFrame schema (RuleValidator.cs:8-54)
    2. compile Conditions → boolean Column, apply ``.filter`` only when a
       condition/group exists (IQueryableRuleEvaluator.cs:23-28)
    3. group+aggregate only when GroupBy is non-empty AND Aggregation is set
       (gate at IQueryableRuleEvaluator.cs:31-34); otherwise return the
       filtered rows as-is.
    """
    if not isinstance(rule, RuleDefinition):
        rule = RuleDefinition.from_dict(rule)
    validate_rule(rule, df.schema, type_name)

    out = df
    if rule.conditions is not None and not rule.conditions.is_empty():
        predicate = compile_predicate(
            rule.conditions, df.schema, external_params, strict_compat, type_name
        )
        out = out.filter(predicate)

    if rule.group_by and rule.aggregation is not None:
        out = apply_aggregation(
            out, rule.group_by, rule.aggregation, group_by_mode=group_by_mode
        )
    return out


def execute_rules(
    df: DataFrame,
    rules: Sequence[RuleDefinition | Mapping[str, Any]],
    external_params: Mapping[str, Any] | None = None,
    strict_compat: bool = True,
    group_by_mode: str = "all",
    combine: str = "union",
) -> DataFrame:
    """Multi-rule batch. ``combine="union"`` (the reference semantics):
    per-rule results, UNION DISTINCT (RuleDefinitionExecutor.cs:8-28 —
    concat + HashSet dedupe). Spark: ``reduce(unionByName) →
    dropDuplicates()`` — one job; the shuffle for the distinct is the
    only extra exchange. The reference implicitly requires compatible
    result schemas via its ``Cast<T>`` (RuleDefinitionExecutor.cs:38);
    ``unionByName`` enforces that explicitly.

    Beyond-reference set modes over the same per-rule results (the
    reference has no set surface beyond the union — SURVEY.md §2.5):
    ``combine="intersect"`` → rows matching EVERY rule (``INTERSECT``
    semantics, distinct); ``combine="except"`` → rows matching the first
    rule and none of the rest (``EXCEPT`` semantics, distinct). All
    three compose into ONE logical plan, so the shared scan dedupes and
    per-rule filters still push down.
    """
    if combine not in ("union", "intersect", "except"):
        raise ValueError(f"unknown combine mode: {combine!r}")
    if not rules:
        return df.limit(0)
    results = [
        apply_rule(
            df,
            r,
            external_params,
            strict_compat=strict_compat,
            group_by_mode=group_by_mode,
        )
        for r in rules
    ]
    if combine == "intersect":
        return reduce(DataFrame.intersect, results)  # INTERSECT DISTINCT
    if combine == "except":
        return reduce(DataFrame.subtract, results)  # EXCEPT DISTINCT
    return reduce(DataFrame.unionByName, results).dropDuplicates()


def register_rule_view(
    df: DataFrame,
    view_name: str,
    rule: RuleDefinition | Mapping[str, Any],
    external_params: Mapping[str, Any] | None = None,
    strict_compat: bool = True,
    group_by_mode: str = "all",
) -> DataFrame:
    """Expose a compiled rule as a Spark SQL temp view, so rule results
    compose with plain ``spark.sql`` (joins, windows, CTEs) without
    touching the Python API again. The view wraps the LOGICAL plan —
    every downstream SQL query re-optimizes through it, keeping filter
    pushdown and column pruning intact (no materialization). Returns the
    underlying DataFrame."""
    result = apply_rule(
        df,
        rule,
        external_params,
        strict_compat=strict_compat,
        group_by_mode=group_by_mode,
    )
    result.createOrReplaceTempView(view_name)
    return result
