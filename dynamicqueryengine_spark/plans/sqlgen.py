"""Rule → ANSI/DuckDB SQL transpiler.

Generates the DuckDB oracle query for a rule document from the SAME parsed
rule the Spark compiler consumes (SURVEY.md §7 Phase 3) — one source of
truth, so the oracle can't drift from the engine.

Every mapping mirrors ``operators/predicates.py`` (which itself mirrors
IQueryableRuleEvaluator.cs — citations there). Null-semantics parity notes:

* Spark ``col.cast(decimal)`` on a malformed string yields NULL; DuckDB
  ``CAST`` throws — so the transpiler emits ``TRY_CAST`` to match Spark.
* ``WHERE`` drops NULL predicates in both engines; CASE WHEN NULL falls to
  ELSE in both — the ``If`` (implication) op therefore agrees.
* argmin/argmax ties: ORDER BY (agg value, then every remaining column in
  schema order), ASC NULLS FIRST for Min / DESC NULLS LAST for Max — exactly
  Spark's default null ordering and the same lexicographic tuple the engine's
  ``min_by``/``max_by`` struct key uses (operators/aggregate.py).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Mapping, Sequence

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DataType,
    DateType,
    NumericType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..errors import RuleCompilationError, UnsupportedOperatorError, in_expects_array
from ..operators.predicates import (
    _NUMERIC_OPS,
    _is_null_or_whitespace,
    _param_not_empty,
    _parse_threshold,
    resolve_field,
)
from .model import AggregateFunction, Condition, ConditionGroup, RuleDefinition, _ci_get

_DECIMAL_SQL = "DECIMAL(38,10)"


def _sql_str(value: Any) -> str:
    return "'" + str(value).replace("'", "''") + "'"


def _sql_literal(value: Any, dtype: DataType) -> str:
    """Render a rule literal for DuckDB AFTER running it through the SAME
    coercion the Spark compiler applies (predicates._coerce_literal) — the
    two engines must compare against the identical constant (e.g. the
    reference's Convert.ChangeType rounds 0.5 → 0 for int columns)."""
    from ..operators.predicates import _coerce_literal

    if value is None:
        return "NULL"
    coerced = _coerce_literal(value, dtype)
    if isinstance(dtype, BooleanType):
        return "TRUE" if coerced else "FALSE"
    if isinstance(dtype, TimestampType):
        return f"TIMESTAMP {_sql_str(coerced.isoformat(sep=' '))}"
    if isinstance(dtype, DateType):
        return f"DATE {_sql_str(coerced.isoformat())}"
    if isinstance(dtype, NumericType):
        import decimal

        if isinstance(coerced, decimal.Decimal):
            return str(coerced)
        return repr(int(coerced) if isinstance(coerced, bool) else coerced)
    return _sql_str(coerced)


class SqlGenerator:
    """Transpiles one rule against one table's Spark schema to DuckDB SQL."""

    def __init__(
        self,
        schema: StructType,
        external_params: Mapping[str, Any] | None = None,
        strict_compat: bool = True,
    ) -> None:
        self.schema = schema
        self.params = dict(external_params or {})
        self.strict_compat = strict_compat

    def _require_param(self, cond: Condition) -> Any:
        """Same external-parameter resolution as the engine
        (FindExternalConstant, IQueryableRuleEvaluator.cs:313-329)."""
        if cond.property in self.params:
            return self.params[cond.property]
        lowered = {k.lower(): v for k, v in self.params.items()}
        if cond.property.lower() in lowered:
            return lowered[cond.property.lower()]
        from ..errors import missing_external_param

        raise missing_external_param(cond.property, cond.operator)

    def _not_empty_sql(self, field: StructField) -> str:
        """NotEmpty SQL mirroring predicates._not_empty_column."""
        p = field.name
        if isinstance(field.dataType, StringType):
            return f"({p} IS NOT NULL AND {p} <> '')"
        if isinstance(field.dataType, ArrayType):
            return f"({p} IS NOT NULL AND len({p}) > 0)"
        return f"({p} IS NOT NULL)"

    # -- predicates ------------------------------------------------------

    def group_sql(self, group: ConditionGroup | None) -> str:
        if group is None or group.is_empty():
            return "TRUE"
        parts = [self.condition_sql(c) for c in group.conditions]
        parts += [self.group_sql(g) for g in group.groups]
        joiner = " OR " if group.logical_operator.strip().upper() == "OR" else " AND "
        body = "(" + joiner.join(parts) + ")"
        return f"(NOT {body})" if group.negate else body

    def condition_sql(self, cond: Condition) -> str:
        op = cond.operator.strip().lower()

        # registered custom operators stay oracle-able via their sql_fn
        # mirror (operators/registry.py); a missing mirror fails LOUDLY —
        # a silent skip would let the oracle drift from the engine
        from ..operators.registry import lookup_operator as _lookup_custom

        custom = _lookup_custom(op)
        if custom is not None:
            if custom.sql_fn is None:
                raise RuleCompilationError(
                    f"Custom operator '{cond.operator}' has no SQL mirror "
                    "registered — pass sql_fn to register_operator for "
                    "oracle generation."
                )
            field = (
                None
                if custom.param_only
                else resolve_field(self.schema, cond.property)
            )
            return custom.sql_fn(field, cond.value, dict(self.params))

        if op in (
            "dynamicnullorempty",
            "dynamicnotnullorempty",
            "dynamicnotempty",
            "dynamicempty",
        ):
            param = self._require_param(cond)
            if op == "dynamicnullorempty":
                result = _is_null_or_whitespace(param)
            elif op == "dynamicnotnullorempty":
                result = not _is_null_or_whitespace(param)
            elif op == "dynamicnotempty":
                result = _param_not_empty(param)
            else:
                result = not _param_not_empty(param)
            return "TRUE" if result else "FALSE"

        field = resolve_field(self.schema, cond.property)
        p = field.name

        if op == "null":
            return f"({p} IS NULL)"
        if op == "notnull":
            return f"({p} IS NOT NULL)"
        if op == "notempty":
            return self._not_empty_sql(field)
        if op == "empty":
            return f"(NOT {self._not_empty_sql(field)})"
        if op == "nullorempty":
            if isinstance(field.dataType, StringType):
                return f"({p} IS NULL OR {p} = '')"
            return f"({p} IS NULL)"
        if op == "notnullorempty":
            if self.strict_compat:
                return "TRUE"  # faithful tautology (predicates.py)
            if isinstance(field.dataType, StringType):
                return f"({p} IS NOT NULL AND {p} <> '')"
            return f"({p} IS NOT NULL)"

        if op == "if":
            check_raw = _ci_get(cond.value or {}, "Check")
            then_raw = _ci_get(cond.value or {}, "Then")
            if not isinstance(check_raw, Mapping) or not isinstance(then_raw, Mapping):
                raise RuleCompilationError(
                    "Both 'Check' and 'Then' properties are required for 'If' operator."
                )
            check = self.condition_sql(Condition.from_dict(check_raw))
            then = self.condition_sql(Condition.from_dict(then_raw))
            return f"(CASE WHEN {check} THEN {then} ELSE TRUE END)"

        if op in (
            "containifcountisgreater",
            "containifcountisless",
            "mustcontainifcountisgreater",
        ):
            value = cond.value if isinstance(cond.value, Mapping) else {}
            target = _ci_get(value, "Target")
            required = _ci_get(value, "Required")
            threshold = _parse_threshold(_ci_get(value, "Threshold", default=0))
            if not target:
                raise RuleCompilationError("Target field is mandatory.")
            count = (
                f"len(regexp_extract_all(CAST({p} AS VARCHAR), {_sql_str(target)}))"
            )
            if op == "containifcountisgreater":
                return f"({count} > {threshold})"
            if op == "containifcountisless":
                return f"({count} < {threshold})"
            if not required:
                raise RuleCompilationError("Target and Required fields are mandatory.")
            req = _sql_str(str(required).lower())
            return (
                f"({count} > {threshold} AND "
                f"contains(lower(CAST({p} AS VARCHAR)), {req}))"
            )

        if op in ("in", "notin"):
            values = cond.value
            if values is None:
                values = self._require_param(cond)
            if not isinstance(values, (list, tuple)):
                raise in_expects_array()
            rendered = ", ".join(_sql_literal(v, field.dataType) for v in values)
            body = f"({p} IN ({rendered}))"
            return f"(NOT {body})" if op == "notin" else body

        value = cond.value
        if value is None or op == "dynamicequal":
            value = self._require_param(cond)

        if op in ("equal", "dynamicequal"):
            if value is None:
                return f"({p} IS NULL)"
            return f"({p} = {_sql_literal(value, field.dataType)})"
        if op == "notequal":
            if value is None:
                return f"({p} IS NOT NULL)"
            return f"({p} <> {_sql_literal(value, field.dataType)})"

        if op in _NUMERIC_OPS:
            sym = {
                "greaterthan": ">",
                "greaterthanorequal": ">=",
                "lessthan": "<",
                "lessthanorequal": "<=",
            }[op]
            if isinstance(field.dataType, StringType):
                lhs = f"TRY_CAST({p} AS {_DECIMAL_SQL})"
                rhs = f"CAST({_sql_str(value)} AS {_DECIMAL_SQL})"
            else:
                lhs = p
                rhs = _sql_literal(value, field.dataType)
            return f"({lhs} {sym} {rhs})"

        if op in ("contains", "notcontains", "startswith", "endswith"):
            text = p if isinstance(field.dataType, StringType) else f"CAST({p} AS VARCHAR)"
            needle = _sql_str("" if value is None else str(value))
            if op == "contains":
                return f"contains({text}, {needle})"
            if op == "notcontains":
                return f"(NOT contains({text}, {needle}))"
            if op == "startswith":
                return f"starts_with({text}, {needle})"
            return f"ends_with({text}, {needle})"

        raise UnsupportedOperatorError(f"Operator '{cond.operator}' not supported.")

    # -- full queries ----------------------------------------------------

    def rule_sql(
        self,
        rule: RuleDefinition,
        table: str,
        group_by_mode: str = "all",
    ) -> str:
        """Full oracle SELECT for one rule (filter [+ group/agg])."""
        where = self.group_sql(rule.conditions)
        base = f"SELECT * FROM {table}" + (
            f" WHERE {where}" if where != "TRUE" else ""
        )
        if not rule.group_by or rule.aggregation is None:
            return base

        keys = [resolve_field(self.schema, k).name for k in rule.group_by]
        if group_by_mode == "first":
            keys = keys[:1]
        fn = rule.aggregation.aggregate_function
        if fn == AggregateFunction.COUNT:
            key_list = ", ".join(keys)
            return (
                f"SELECT {key_list}, COUNT(*) AS count FROM ({base}) "
                f"GROUP BY {key_list}"
            )

        agg_field = resolve_field(self.schema, rule.aggregation.aggregate_property or "")
        return self.arg_extreme_sql(
            base, keys, agg_field, descending=(fn == AggregateFunction.MAX)
        )

    def arg_extreme_sql(
        self,
        base: str,
        keys: Sequence[str],
        agg_field: StructField,
        descending: bool,
    ) -> str:
        """argmin/argmax oracle — identical ordering tuple to
        operators/aggregate.py::_arg_extreme (agg value then remaining columns
        in schema order; all DESC for Max), Spark null ordering."""
        if isinstance(agg_field.dataType, StringType):
            ord0 = f"TRY_CAST({agg_field.name} AS {_DECIMAL_SQL})"
        else:
            ord0 = agg_field.name
        tie = [f.name for f in self.schema.fields if f.name != agg_field.name]
        direction = "DESC NULLS LAST" if descending else "ASC NULLS FIRST"
        order_by = ", ".join(f"{c} {direction}" for c in [ord0] + tie)
        partition = ", ".join(keys) if keys else "1"
        return (
            f"SELECT * FROM ({base}) QUALIFY "
            f"ROW_NUMBER() OVER (PARTITION BY {partition} ORDER BY {order_by}) = 1"
        )

    def rules_union_sql(
        self,
        rules: Sequence[RuleDefinition],
        table: str,
        group_by_mode: str = "all",
    ) -> str:
        """Multi-rule UNION DISTINCT oracle (RuleDefinitionExecutor.cs:22-27)."""
        selects = [self.rule_sql(r, table, group_by_mode) for r in rules]
        return " UNION ".join(f"({s})" for s in selects)

    def rules_set_sql(
        self,
        rules: Sequence[RuleDefinition],
        table: str,
        combine: str,
        group_by_mode: str = "all",
    ) -> str:
        """Beyond-reference set-mode oracles: ``INTERSECT`` / ``EXCEPT``
        (both DISTINCT, left-associative — exactly DataFrame.intersect /
        DataFrame.subtract chained by reduce)."""
        op = {"intersect": " INTERSECT ", "except": " EXCEPT "}[combine]
        selects = [self.rule_sql(r, table, group_by_mode) for r in rules]
        return op.join(f"({s})" for s in selects)
