"""Declarative data-quality constraints — the Deequ/Great-Expectations
pattern (Schelter et al., "Automating Large-Scale Data Quality
Verification", VLDB 2018) as plain DataFrame aggregation: a constraint
spec list compiles to ONE conditional-aggregation pass over the table
(plus one keyed join per referential constraint), producing a
(constraint, n_checked, n_violations, passed) report row per check.

This is the validation layer a 100 TB pipeline runs before anything
else, and the natural extension of the rule engine's predicate surface
(operators/predicates.py): the same boolean-Column machinery, but
aggregated into a contract report instead of filtering rows.

Scale shape: every ROW-LEVEL check (not_null / range / accepted values /
regex) is one `count(CASE WHEN violated)` inside a single aggregation —
one scan, one map-side-combined reduction onto a |constraints|-row
result, regardless of table size. UNIQUENESS is `count(*) −
count(DISTINCT key-struct)` in the SAME pass (Catalyst plans the
multi-distinct through one Expand). REFERENTIAL checks are one
broadcast/hash anti-join each, counting orphans — the only per-check
join, keyed and AQE-planned.

Constraint spec (dicts, JSON-friendly like the rule documents):

    {"name": ..., "kind": "not_null",        "col": c}
    {"name": ..., "kind": "range",           "col": c, "lo": x, "hi": y}
    {"name": ..., "kind": "accepted_values", "col": c, "values": [...]}
    {"name": ..., "kind": "regex",           "col": c, "pattern": p}
    {"name": ..., "kind": "expr",            "expr": "<boolean SQL>"}
    {"name": ..., "kind": "unique",          "cols": [c, ...]}
    {"name": ..., "kind": "foreign_key",     "cols": [...],
     "parent": DataFrame, "parent_cols": [...]}   # SQL: parent_table
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["constraint_report", "constraint_report_sql"]


def validate_expr_types(
    df: DataFrame,
    constraints: Sequence[Mapping],
    on_nonboolean: str = "raise",
) -> list:
    """Resolve every ``expr`` constraint against ``df``'s schema —
    driver-side analysis only, no job — and return the (possibly
    rewritten) spec list. Without this, a spec typo (``"amount"``
    instead of ``"amount > 0"``) would be silently coerced by a boolean
    cast into nonzero-is-true semantics, and the SQL mirror could
    disagree (Delta parses CHECK expressions and rejects non-boolean
    results the same way).

    ``on_nonboolean`` picks the policy for a non-boolean expression:

    * ``"raise"`` — refuse with ``ValueError`` (registration-time
      strictness: new specs entering a table's manifest must be
      boolean predicates);
    * ``"coerce"`` — mark the spec ``_legacy_coerce`` so
      :func:`_row_violation` applies the pre-r13 ``cast('boolean')``
      nonzero-is-true semantics. This is the COMPATIBILITY path for
      specs already recorded in a table manifest before boolean-ness
      was enforced: such tables stay writable (appends/merges/updates
      keep enforcing the constraint exactly as the version that
      recorded it did) instead of hard-failing with no migration path.
      Dropping and re-adding the constraint upgrades it to the strict
      form.
    """
    from pyspark.sql.types import BooleanType

    out: list = []
    for c in constraints:
        if c.get("kind") == "expr":
            dt = df.select(
                F.expr(c["expr"]).alias("_e")
            ).schema[0].dataType
            if not isinstance(dt, BooleanType):
                if on_nonboolean == "coerce":
                    c = {**c, "_legacy_coerce": True}
                else:
                    raise ValueError(
                        f"CHECK constraint {c.get('name')!r}: expression "
                        f"{c['expr']!r} resolves to {dt.simpleString()}, "
                        "not boolean — a CHECK expression must be a "
                        "boolean predicate (legacy tables with a "
                        "recorded non-boolean constraint keep their "
                        "original coercing semantics on the write path; "
                        "DROP and re-ADD the constraint to upgrade it)"
                    )
        out.append(c)
    return out


def _row_violation(c: Mapping) -> F.Column:
    """Boolean Column: TRUE when the row VIOLATES the constraint.
    NULL handling follows the warehouse convention: only ``not_null``
    flags NULLs; the value checks pass NULL rows (they are the
    completeness check's job)."""
    kind = c["kind"]
    if kind == "expr":
        # arbitrary SQL CHECK (Delta's CHECK constraint semantics):
        # violated only when the expression evaluates FALSE on the row;
        # NULL passes (unknown is not a violation). The expression's
        # boolean-ness is enforced by validate_expr_types at every
        # enforcement/registration site; the only cast is the
        # _legacy_coerce marker that validate set for a pre-strictness
        # RECORDED spec (nonzero-is-true, the semantics its table was
        # written under).
        e = F.expr(c["expr"])
        if c.get("_legacy_coerce"):
            e = e.cast("boolean")
        return ~F.coalesce(e, F.lit(True))
    col = F.col(c["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "range":
        ok = F.lit(True)
        if c.get("lo") is not None:
            ok = ok & (col >= F.lit(c["lo"]))
        if c.get("hi") is not None:
            ok = ok & (col <= F.lit(c["hi"]))
        return col.isNotNull() & ~ok
    if kind == "accepted_values":
        return col.isNotNull() & ~col.isin(list(c["values"]))
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(c["pattern"])
    raise ValueError(f"unknown row constraint kind: {kind!r}")


def constraint_report(df: DataFrame, constraints: Sequence[Mapping]) -> DataFrame:
    """(name, kind, n_checked, n_violations, passed) per constraint.
    Strict on expr boolean-ness (pass specs through
    ``validate_expr_types(df, specs, on_nonboolean="coerce")`` first to
    audit a legacy table's recorded non-boolean constraint)."""
    constraints = validate_expr_types(df, constraints)
    row_cs = [c for c in constraints if c["kind"] not in ("unique", "foreign_key")]
    uniq_cs = [c for c in constraints if c["kind"] == "unique"]
    fk_cs = [c for c in constraints if c["kind"] == "foreign_key"]

    aggs = [F.count(F.lit(1)).alias("_n")]
    for i, c in enumerate(row_cs):
        aggs.append(
            F.count(F.when(_row_violation(c), F.lit(1))).alias(f"_v_{i}")
        )
    for i, c in enumerate(uniq_cs):
        aggs.append(
            F.countDistinct(F.struct(*[F.col(k) for k in c["cols"]])).alias(
                f"_u_{i}"
            )
        )
    row = df.agg(*aggs)

    entries = []
    for i, c in enumerate(row_cs):
        entries.append(
            F.struct(
                F.lit(c["name"]).alias("name"),
                F.lit(c["kind"]).alias("kind"),
                F.col("_n").alias("n_checked"),
                F.col(f"_v_{i}").alias("n_violations"),
            )
        )
    for i, c in enumerate(uniq_cs):
        entries.append(
            F.struct(
                F.lit(c["name"]).alias("name"),
                F.lit("unique").alias("kind"),
                F.col("_n").alias("n_checked"),
                (F.col("_n") - F.col(f"_u_{i}")).alias("n_violations"),
            )
        )
    if entries:
        report = row.select(F.explode(F.array(*entries)).alias("e")).select(
            "e.name", "e.kind", "e.n_checked", "e.n_violations"
        )
    else:
        # FK-only (or empty) spec: explode(array()) would type as
        # array<null> and break the struct-field select — start from an
        # empty frame with the report schema and union the FK rows on.
        report = df.sparkSession.createDataFrame(
            [], "name string, kind string, n_checked long, n_violations long"
        )

    for c in fk_cs:
        keys = list(c["cols"])
        pkeys = list(c["parent_cols"])
        child = df.select(*keys).na.drop(subset=keys)
        parent = c["parent"].select(
            *[F.col(p).alias(k) for k, p in zip(keys, pkeys)]
        ).distinct()
        orphans = child.join(parent, keys, "left_anti")
        fk_row = child.agg(F.count(F.lit(1)).alias("n_checked")).crossJoin(
            orphans.agg(F.count(F.lit(1)).alias("n_violations"))
        )
        report = report.unionByName(
            fk_row.select(
                F.lit(c["name"]).alias("name"),
                F.lit("foreign_key").alias("kind"),
                "n_checked",
                "n_violations",
            )
        )
    return report.withColumn("passed", F.col("n_violations") == 0)


def _sql_lit(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def constraint_report_sql(table: str, constraints: Sequence[Mapping]) -> str:
    """DuckDB mirror: one aggregation CTE for the row-level + uniqueness
    checks, one orphan-count subquery per referential check, UNION ALLed
    in spec order. ``foreign_key`` constraints use ``parent_table``
    (a table/view name) in place of the DataFrame."""
    selects = []
    for c in constraints:
        kind = c["kind"]
        if kind == "unique":
            key = ", ".join(c["cols"])
            selects.append(
                f"SELECT {_sql_lit(c['name'])} AS name, 'unique' AS kind,"
                f" count(*) AS n_checked,"
                f" count(*) - count(DISTINCT ({key})) AS n_violations"
                f" FROM {table}"
            )
            continue
        if kind == "foreign_key":
            keys = list(c["cols"])
            pkeys = list(c["parent_cols"])
            notnull = " AND ".join(f"c.{k} IS NOT NULL" for k in keys)
            on = " AND ".join(
                f"p.{pk} = c.{k}" for k, pk in zip(keys, pkeys)
            )
            selects.append(
                f"SELECT {_sql_lit(c['name'])} AS name,"
                f" 'foreign_key' AS kind, count(*) AS n_checked,"
                f" count(*) FILTER (WHERE NOT EXISTS ("
                f"SELECT 1 FROM {c['parent_table']} p WHERE {on}))"
                f" AS n_violations"
                f" FROM {table} c WHERE {notnull}"
            )
            continue
        if kind == "expr":
            # the expression is recorded in portable ANSI form by
            # contract (column refs + comparisons + arithmetic); the
            # mirror applies it verbatim
            selects.append(
                f"SELECT {_sql_lit(c['name'])} AS name, 'expr' AS kind,"
                f" count(*) AS n_checked,"
                f" count(*) FILTER (WHERE NOT coalesce(({c['expr']}),"
                f" TRUE)) AS n_violations"
                f" FROM {table}"
            )
            continue
        col = c["col"]
        if kind == "not_null":
            viol = f"{col} IS NULL"
        elif kind == "range":
            ok = []
            if c.get("lo") is not None:
                ok.append(f"{col} >= {_sql_lit(c['lo'])}")
            if c.get("hi") is not None:
                ok.append(f"{col} <= {_sql_lit(c['hi'])}")
            viol = f"{col} IS NOT NULL AND NOT ({' AND '.join(ok)})"
        elif kind == "accepted_values":
            vals = ", ".join(_sql_lit(v) for v in c["values"])
            viol = f"{col} IS NOT NULL AND {col} NOT IN ({vals})"
        elif kind == "regex":
            # Spark rlike = find-anywhere; DuckDB regexp_matches is the
            # same partial-match semantics (full_match would diverge)
            viol = (
                f"{col} IS NOT NULL AND NOT regexp_matches("
                f"{col}, {_sql_lit(c['pattern'])})"
            )
        else:
            raise ValueError(f"unknown constraint kind: {kind!r}")
        selects.append(
            f"SELECT {_sql_lit(c['name'])} AS name, {_sql_lit(kind)} AS kind,"
            f" count(*) AS n_checked,"
            f" count(CASE WHEN {viol} THEN 1 END) AS n_violations"
            f" FROM {table}"
        )
    body = "\nUNION ALL\n".join(selects)
    return (
        f"SELECT name, kind, CAST(n_checked AS BIGINT) AS n_checked,"
        f" CAST(n_violations AS BIGINT) AS n_violations,"
        f" n_violations = 0 AS passed FROM (\n{body}\n)"
    )
