"""Rule document model — the engine's "query language".

Mirrors the JSON shape of the reference's rule AST
(DynamicQueryEngine.Core/Models/RuleModels.cs:3-52):

- ``RuleDefinition``: metadata passthrough fields + ``Conditions`` (a boolean
  tree), ``GroupBy`` (list of column names) and ``Aggregation``.
- ``ConditionGroup``: ``LogicalOperator`` ("AND"/"OR", default AND),
  ``Conditions`` (leaves), ``Groups`` (nested subtrees, arbitrary depth),
  ``Negate``.
- ``Condition``: ``Property`` / ``Operator`` / ``Value`` — value stays
  late-typed (any JSON value) exactly like the reference keeps a raw
  ``JsonElement`` until compile time (IQueryableRuleEvaluator.cs:165).
- ``AggregationDefinition``: ``AggregateProperty`` + function
  ``Min | Max | Count`` (RuleModels.cs:35-46).

JSON key lookup is case-insensitive (ASP.NET model binding accepts
``conditions``/``Conditions`` interchangeably; enum values arrive as strings
via JsonStringEnumConverter, Program.cs:7), so ``from_dict`` accepts any
casing of the documented key names.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any, Mapping


class AggregateFunction(str, Enum):
    """RuleModels.cs:35-40. ``Count`` is declared in the live model but only
    implemented in the reference's excluded legacy path
    (AggregationEngine.cs:45-46); we implement it as first-class."""

    MIN = "Min"
    MAX = "Max"
    COUNT = "Count"

    @classmethod
    def parse(cls, value: "AggregateFunction | str") -> "AggregateFunction":
        if isinstance(value, AggregateFunction):
            return value
        for member in cls:
            if member.value.lower() == str(value).lower():
                return member
        raise ValueError(f"Aggregate function '{value}' not supported.")


# The full, closed operator namespace of the reference:
# SqlComparableOperator (IQueryableRuleEvaluator.cs:579-589) +
# MethodBasedOperator (IQueryableRuleEvaluator.cs:591-612).
# Matched case-insensitively (IQueryableRuleEvaluator.cs:135).
OPERATORS = frozenset(
    op.lower()
    for op in (
        # comparisons
        "Equal",
        "NotEqual",
        "GreaterThan",
        "GreaterThanOrEqual",
        "LessThan",
        "LessThanOrEqual",
        "In",
        "NotIn",
        # string methods (ordinal, case-sensitive)
        "Contains",
        "NotContains",
        "StartsWith",
        "EndsWith",
        # null / empty family
        "Null",
        "NotNull",
        "Empty",
        "NotEmpty",
        "NullOrEmpty",
        "NotNullOrEmpty",
        # regex-count family
        "ContainIfCountIsGreater",
        "ContainIfCountIsLess",
        "MustContainIfCountIsGreater",
        # conditional
        "If",
        # dynamic (external-parameter) family
        "DynamicEqual",
        "DynamicEmpty",
        "DynamicNotEmpty",
        "DynamicNullOrEmpty",
        "DynamicNotNullOrEmpty",
    )
)


def _ci_get(d: Mapping[str, Any], *names: str, default: Any = None) -> Any:
    """Case-insensitive dict lookup across accepted key spellings."""
    lowered = {str(k).lower(): v for k, v in d.items()}
    for name in names:
        if name.lower() in lowered:
            return lowered[name.lower()]
    return default


@dataclass
class Condition:
    """A leaf predicate (RuleModels.cs:28-33)."""

    property: str
    operator: str
    value: Any = None  # late-typed; None triggers external-param resolution

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "Condition":
        return cls(
            property=_ci_get(d, "Property", default="") or "",
            operator=_ci_get(d, "Operator", default="") or "",
            value=_ci_get(d, "Value"),
        )


@dataclass
class ConditionGroup:
    """A boolean subtree (RuleModels.cs:20-26)."""

    logical_operator: str = "AND"
    conditions: list[Condition] = field(default_factory=list)
    groups: list["ConditionGroup"] = field(default_factory=list)
    negate: bool = False

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "ConditionGroup":
        return cls(
            logical_operator=str(_ci_get(d, "LogicalOperator", default="AND") or "AND"),
            conditions=[
                Condition.from_dict(c)
                for c in (_ci_get(d, "Conditions", default=None) or [])
            ],
            groups=[
                ConditionGroup.from_dict(g)
                for g in (_ci_get(d, "Groups", default=None) or [])
            ],
            negate=bool(_ci_get(d, "Negate", default=False)),
        )

    def is_empty(self) -> bool:
        """Empty group compiles to TRUE (IQueryableRuleEvaluator.cs:103-106)."""
        return not self.conditions and not self.groups

    def iter_conditions(self):
        """Yield every leaf condition in the subtree (validator walk,
        RuleValidator.cs:16-33), including `If` sub-conditions."""
        for c in self.conditions:
            yield c
            # `If` nests two full conditions inside its value
            # (IQueryableRuleEvaluator.cs:379-411); validate those too.
            if c.operator.lower() == "if" and isinstance(c.value, Mapping):
                for key in ("Check", "Then"):
                    sub = _ci_get(c.value, key)
                    if isinstance(sub, Mapping):
                        yield Condition.from_dict(sub)
        for g in self.groups:
            yield from g.iter_conditions()


@dataclass
class AggregationDefinition:
    """RuleModels.cs:42-46."""

    aggregate_property: str | None
    aggregate_function: AggregateFunction

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "AggregationDefinition":
        return cls(
            aggregate_property=_ci_get(d, "AggregateProperty"),
            aggregate_function=AggregateFunction.parse(
                _ci_get(d, "AggregateFunction", default="Count")
            ),
        )


@dataclass
class RuleDefinition:
    """RuleModels.cs:3-18. Only ``conditions``/``group_by``/``aggregation``
    are consumed by the engine; the rest are registry metadata kept as
    passthrough (verified unused in the reference — SURVEY.md §1.3)."""

    name: str = ""
    conditions: ConditionGroup | None = None
    group_by: list[str] | None = None
    aggregation: AggregationDefinition | None = None
    # passthrough metadata
    comment: str | None = None
    version: float | None = None
    is_active: bool = True
    created_by: str | None = None
    created_at: str | None = None
    source_type: str | None = None
    target_type: str | None = None
    integration: Mapping[str, Any] | None = None
    error_message: str | None = None

    @classmethod
    def from_dict(cls, d: Mapping[str, Any]) -> "RuleDefinition":
        conditions = _ci_get(d, "Conditions")
        aggregation = _ci_get(d, "Aggregation")
        return cls(
            name=str(_ci_get(d, "Name", default="") or ""),
            conditions=(
                ConditionGroup.from_dict(conditions) if conditions is not None else None
            ),
            group_by=list(_ci_get(d, "GroupBy", default=None) or []) or None,
            aggregation=(
                AggregationDefinition.from_dict(aggregation)
                if aggregation is not None
                else None
            ),
            comment=_ci_get(d, "Comment"),
            version=_ci_get(d, "Version"),
            is_active=bool(_ci_get(d, "IsActive", default=True)),
            created_by=_ci_get(d, "CreatedBy"),
            created_at=_ci_get(d, "CreatedAt"),
            source_type=_ci_get(d, "SourceType"),
            target_type=_ci_get(d, "TargetType"),
            integration=_ci_get(d, "Integration"),
            error_message=_ci_get(d, "ErrorMessage"),
        )

    @classmethod
    def from_json(cls, text: str) -> "RuleDefinition":
        return cls.from_dict(json.loads(text))
