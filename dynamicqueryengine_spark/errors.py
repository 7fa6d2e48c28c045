"""Typed error surface of the engine.

Mirrors the reference's analysis/compile error behavior where every failure
surfaces as an exception with a specific message and the HTTP facade maps any
exception to a 400 ``{Error: msg}`` payload
(reference: DynamicQueryEngine.WebApi/Controllers/RuleController.cs:24-27).

Error messages replicate the reference verbatim so the validation-error test
suite (SURVEY.md §5 item 3) can assert on them:

- "Property '{p}' not found on '{t}'"        (RuleValidator.cs:26)
- "GroupBy field '{g}' invalid"              (RuleValidator.cs:41)
- "Aggregation must be defined when GroupBy is provided." (RuleValidator.cs:47)
- "IN or NOTIN operator expects array."      (IQueryableRuleEvaluator.cs:179)
- "External parameter '{p}' is missing for '{op}' operator."
                                             (IQueryableRuleEvaluator.cs:320)
- "AggregateProperty must be provided for Min/Max aggregation."
                                             (IQueryableRuleEvaluator.cs:45)
"""

from __future__ import annotations


class RuleEngineError(Exception):
    """Base class for every engine-raised error (maps to HTTP 400)."""


class RuleValidationError(RuleEngineError):
    """Schema/analysis-time failure (bad property, bad group-by, ...)."""


class RuleCompilationError(RuleEngineError):
    """Rule-to-plan compile failure (bad value shape, unknown operator, ...)."""


class UnsupportedOperatorError(RuleCompilationError):
    """Unknown operator name (IQueryableRuleEvaluator.cs:308 NotSupportedException)."""


def property_not_found(prop: str, type_name: str) -> RuleValidationError:
    return RuleValidationError(f"Property '{prop}' not found on '{type_name}'")


def group_by_invalid(field: str) -> RuleValidationError:
    return RuleValidationError(f"GroupBy field '{field}' invalid")


def aggregation_required() -> RuleValidationError:
    return RuleValidationError("Aggregation must be defined when GroupBy is provided.")


def in_expects_array() -> RuleCompilationError:
    return RuleCompilationError("IN or NOTIN operator expects array.")


def missing_external_param(prop: str, op: str) -> RuleCompilationError:
    return RuleCompilationError(
        f"External parameter '{prop}' is missing for '{op}' operator."
    )


def aggregate_property_required() -> RuleValidationError:
    return RuleValidationError(
        "AggregateProperty must be provided for Min/Max aggregation."
    )
