"""Custom predicate-operator registry — opening the reference's CLOSED
operator set.

The reference dispatches conditions through a fixed switch
(IQueryableRuleEvaluator.cs:591-612): an operator outside the enum can
only ever raise "Operator 'X' not supported." A real engine wants an
extension point, so ``register_operator`` lets a deployment add leaf
operators that participate in the full pipeline with BUILT-IN parity:

* compiled by ``PredicateCompiler.compile_condition`` (so custom ops
  nest inside AND/OR/Negate groups, ``If`` implications, and multi-rule
  batches, and Catalyst still folds/pushes them — the compile hook
  returns a plain boolean ``Column``);
* validated by ``plans/validate.validate_rule`` (property resolution,
  unless the op is declared ``param_only`` like the Dynamic* family);
* transpiled by ``plans/sqlgen.SqlGenerator`` when a ``sql_fn`` mirror
  is supplied — registered ops stay value-ORACLE-able, the repo's
  correctness contract (a registered op without a mirror fails oracle
  generation loudly rather than silently drifting).

Built-in operator names cannot be shadowed: the built-ins are the
reference-parity surface, and the unknown-operator error message is part
of that surface — both stay byte-identical whether or not the registry
is populated.

Registry state is process-global (like Spark's own UDF registration),
driver-side only: compile hooks build Column expressions, they never
ship Python to executors unless the hook itself chooses to.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Mapping

from pyspark.sql import Column
from pyspark.sql.types import StructField

__all__ = [
    "CustomOperator",
    "register_operator",
    "unregister_operator",
    "lookup_operator",
    "registered_operators",
]

# Every operator name the built-in compiler dispatches
# (operators/predicates.py) — the reference-parity surface that must
# never be shadowed. Kept in lockstep by tests/test_custom_operators.py.
BUILTIN_OPERATORS = frozenset(
    {
        "equal",
        "notequal",
        "greaterthan",
        "greaterthanorequal",
        "lessthan",
        "lessthanorequal",
        "in",
        "notin",
        "contains",
        "notcontains",
        "startswith",
        "endswith",
        "null",
        "notnull",
        "notempty",
        "empty",
        "nullorempty",
        "notnullorempty",
        "containifcountisgreater",
        "containifcountisless",
        "mustcontainifcountisgreater",
        "if",
        "dynamicequal",
        "dynamicnullorempty",
        "dynamicnotnullorempty",
        "dynamicnotempty",
        "dynamicempty",
    }
)


@dataclass(frozen=True)
class CustomOperator:
    """A registered leaf operator.

    ``compile_fn(field, value, params) -> Column``: ``field`` is the
    resolved ``StructField`` of the condition's Property (``None`` for
    ``param_only`` ops, whose Property is an external-parameter key, not
    a column), ``value`` the condition's raw Value, ``params`` the
    external-parameter mapping. Must return a boolean ``Column``.

    ``sql_fn(field, value, params) -> str``: optional DuckDB mirror with
    the same signature, returning a boolean SQL expression — required
    for the op to appear in generated oracle SQL.
    """

    name: str
    compile_fn: Callable[[StructField | None, Any, Mapping[str, Any]], Column]
    sql_fn: Callable[[StructField | None, Any, Mapping[str, Any]], str] | None = None
    param_only: bool = False


_REGISTRY: dict[str, CustomOperator] = {}


def register_operator(
    name: str,
    compile_fn: Callable[[StructField | None, Any, Mapping[str, Any]], Column],
    sql_fn: Callable[[StructField | None, Any, Mapping[str, Any]], str] | None = None,
    param_only: bool = False,
) -> CustomOperator:
    """Register ``name`` (case-insensitive, like built-in dispatch).
    Re-registering a custom name replaces it; built-in names are
    rejected — reference parity is not overridable."""
    key = name.strip().lower()
    if not key:
        raise ValueError("operator name must be non-empty")
    if key in BUILTIN_OPERATORS:
        raise ValueError(
            f"cannot shadow built-in operator '{name}' — built-ins are the "
            "reference-parity surface"
        )
    op = CustomOperator(key, compile_fn, sql_fn, param_only)
    _REGISTRY[key] = op
    return op


def unregister_operator(name: str) -> bool:
    """Remove a registered operator; returns whether it existed."""
    return _REGISTRY.pop(name.strip().lower(), None) is not None


def lookup_operator(name: str) -> CustomOperator | None:
    return _REGISTRY.get(name.strip().lower())


def registered_operators() -> dict[str, CustomOperator]:
    """Snapshot of the current registry (copy — mutation-safe)."""
    return dict(_REGISTRY)
