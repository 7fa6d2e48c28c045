"""Custom-operator registry (operators/registry.py): registered ops flow
through validate -> compile -> filter (apply_rule), the HTTP facade, and
the sqlgen oracle; built-in parity (names + unknown-op message) is
untouchable."""

from __future__ import annotations

import json
import urllib.request

import duckdb
import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark import (
    RuleCompilationError,
    RuleDefinition,
    SqlGenerator,
    UnsupportedOperatorError,
    apply_rule,
    register_operator,
    unregister_operator,
)
from dynamicqueryengine_spark.operators.registry import (
    BUILTIN_OPERATORS,
    lookup_operator,
)


def _length_between_compile(field, value, params):
    return (F.length(F.col(field.name)) >= F.lit(int(value["Lo"]))) & (
        F.length(F.col(field.name)) <= F.lit(int(value["Hi"]))
    )


def _length_between_sql(field, value, params):
    return (
        f"(length({field.name}) >= {int(value['Lo'])}"
        f" AND length({field.name}) <= {int(value['Hi'])})"
    )


@pytest.fixture()
def length_between():
    register_operator(
        "LengthBetween", _length_between_compile, _length_between_sql
    )
    yield "LengthBetween"
    unregister_operator("LengthBetween")


def _users(spark):
    return spark.createDataFrame(
        [("u1", "Engineer"), ("u2", "Manager"), ("u3", "VP")],
        "Id string, Title string",
    )


def _rule(op="LengthBetween", prop="Title", value=None):
    return RuleDefinition.from_dict(
        {
            "Conditions": {
                "Conditions": [
                    {
                        "Property": prop,
                        "Operator": op,
                        "Value": value if value is not None else {"Lo": 3, "Hi": 7},
                    }
                ]
            }
        }
    )


class TestCustomOperators:
    def test_apply_rule_end_to_end(self, spark, length_between):
        out = apply_rule(_users(spark), _rule())
        assert sorted(r["Id"] for r in out.collect()) == ["u2"]

    def test_nested_in_groups_and_negate(self, spark, length_between):
        rule = RuleDefinition.from_dict(
            {
                "Conditions": {
                    "Negate": True,
                    "Conditions": [
                        {
                            "Property": "Title",
                            "Operator": "lengthbetween",  # case-insensitive
                            "Value": {"Lo": 3, "Hi": 7},
                        }
                    ],
                }
            }
        )
        out = apply_rule(_users(spark), rule)
        assert sorted(r["Id"] for r in out.collect()) == ["u1", "u3"]

    def test_sqlgen_oracle_differential(self, spark, length_between):
        df = _users(spark)
        rule = _rule()
        got = sorted(r["Id"] for r in apply_rule(df, rule).collect())
        sql = SqlGenerator(df.schema).rule_sql(rule, "users")
        con = duckdb.connect()
        con.execute("CREATE TABLE users (Id VARCHAR, Title VARCHAR)")
        con.executemany(
            "INSERT INTO users VALUES (?, ?)",
            [(r["Id"], r["Title"]) for r in df.collect()],
        )
        oracle = sorted(r[0] for r in con.execute(sql).fetchall())
        con.close()
        assert got == oracle == ["u2"]

    def test_http_api_end_to_end(self, spark, length_between):
        from dynamicqueryengine_spark.api import serve

        server = serve(spark, port=0)
        try:
            port = server.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/rules/evaluate",
                data=json.dumps(
                    {
                        "Rule": {
                            "Conditions": {
                                "Conditions": [
                                    {
                                        "Property": "Title",
                                        "Operator": "LengthBetween",
                                        "Value": {"Lo": 3, "Hi": 7},
                                    }
                                ]
                            }
                        },
                        "Users": [
                            {"Id": "u1", "Title": "Engineer"},
                            {"Id": "u2", "Title": "Manager"},
                        ],
                    }
                ).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=60) as resp:
                assert resp.status == 200
                rows = json.loads(resp.read())
            assert [r["Id"] for r in rows] == ["u2"]
        finally:
            server.shutdown()

    def test_param_only_custom_op_skips_schema_validation(self, spark):
        register_operator(
            "FlagEnabled",
            lambda field, value, params: F.lit(bool(params.get("feature"))),
            lambda field, value, params: (
                "TRUE" if bool(params.get("feature")) else "FALSE"
            ),
            param_only=True,
        )
        try:
            # Property names a parameter key, NOT a column — validation
            # must not raise Property-not-found (Dynamic*-family parity)
            rule = _rule(op="FlagEnabled", prop="feature", value=1)
            on = apply_rule(
                _users(spark), rule, external_params={"feature": True}
            )
            assert on.count() == 3
            off = apply_rule(
                _users(spark), rule, external_params={"feature": False}
            )
            assert off.count() == 0
        finally:
            unregister_operator("FlagEnabled")

    def test_unknown_operator_message_unchanged(self, spark):
        with pytest.raises(UnsupportedOperatorError) as exc:
            apply_rule(_users(spark), _rule(op="Frobnicate", value=1)).collect()
        assert str(exc.value) == "Operator 'Frobnicate' not supported."

    def test_builtins_cannot_be_shadowed(self):
        for name in ("Equal", "in", "NotNullOrEmpty", "dynamicequal", "If"):
            with pytest.raises(ValueError):
                register_operator(name, lambda f, v, p: F.lit(True))

    def test_builtin_set_matches_compiler_dispatch(self, spark):
        """Every name in BUILTIN_OPERATORS must dispatch WITHOUT hitting
        the unknown-operator error — the lockstep check that keeps the
        no-shadow list honest as operators are added."""
        from dynamicqueryengine_spark import PredicateCompiler
        from dynamicqueryengine_spark.plans.model import Condition

        schema = _users(spark).schema
        for name in sorted(BUILTIN_OPERATORS):
            compiler = PredicateCompiler(
                schema, external_params={"Title": "x"}
            )
            cond = Condition.from_dict(
                {"Property": "Title", "Operator": name, "Value": None}
            )
            try:
                compiler.compile_condition(cond)
            except UnsupportedOperatorError:
                raise AssertionError(
                    f"BUILTIN_OPERATORS lists '{name}' but the compiler "
                    "does not dispatch it"
                )
            except Exception:
                pass  # wrong value shape etc. — fine, it IS dispatched

    def test_compiler_dispatch_matches_builtin_set(self):
        """REVERSE lockstep (r6 advisor finding): every operator name the
        compiler's leaf dispatch actually handles must appear in
        BUILTIN_OPERATORS. Custom lookup runs BEFORE built-in dispatch
        (predicates.py compile_condition), so a new built-in missing from
        the frozenset would silently become registrable — and a
        registration could then shadow reference-parity behavior.
        Extract the dispatched names from the compile_condition source
        AST (string constants compared against ``op``, plus the
        _NUMERIC_OPS frozenset) and require exact set equality."""
        import ast
        import inspect

        from dynamicqueryengine_spark.operators import predicates as pred_mod
        from dynamicqueryengine_spark.operators.predicates import (
            PredicateCompiler,
        )

        src = inspect.getsource(PredicateCompiler.compile_condition)
        tree = ast.parse("class _C:\n" + src)
        dispatched: set[str] = set()
        for node in ast.walk(tree):
            if not isinstance(node, ast.Compare):
                continue
            if not (
                isinstance(node.left, ast.Name) and node.left.id == "op"
            ):
                continue
            for comp in node.comparators:
                if isinstance(comp, ast.Constant) and isinstance(
                    comp.value, str
                ):
                    dispatched.add(comp.value)
                elif isinstance(comp, (ast.Tuple, ast.List, ast.Set)):
                    dispatched.update(
                        e.value
                        for e in comp.elts
                        if isinstance(e, ast.Constant)
                        and isinstance(e.value, str)
                    )
                elif isinstance(comp, ast.Name):
                    # `op in _NUMERIC_OPS` — resolve from the module
                    members = getattr(pred_mod, comp.id, None)
                    assert members is not None and all(
                        isinstance(m, str) for m in members
                    ), f"cannot resolve dispatch collection {comp.id!r}"
                    dispatched.update(members)
        assert dispatched, "AST extraction found no dispatched operators"
        missing_from_set = dispatched - BUILTIN_OPERATORS
        assert not missing_from_set, (
            "compiler dispatches operators absent from BUILTIN_OPERATORS "
            f"(registrable → shadowable!): {sorted(missing_from_set)}"
        )
        stale_in_set = BUILTIN_OPERATORS - dispatched
        assert not stale_in_set, (
            f"BUILTIN_OPERATORS lists undispatched names: {sorted(stale_in_set)}"
        )

    def test_missing_sql_mirror_fails_oracle_generation(self, spark):
        register_operator("NoMirror", lambda f, v, p: F.lit(True))
        try:
            with pytest.raises(RuleCompilationError, match="no SQL mirror"):
                SqlGenerator(_users(spark).schema).rule_sql(
                    _rule(op="NoMirror", value=1), "users"
                )
        finally:
            unregister_operator("NoMirror")

    def test_unregister_restores_unknown_error(self, spark):
        register_operator("Ephemeral", lambda f, v, p: F.lit(True))
        assert lookup_operator("ephemeral") is not None
        assert unregister_operator("Ephemeral")
        with pytest.raises(UnsupportedOperatorError):
            apply_rule(_users(spark), _rule(op="Ephemeral", value=1)).collect()


class TestCustomOperatorStreaming:
    def test_registered_op_filters_a_stream(self, spark, length_between):
        """Rules compile identically for batch and stream (one Column
        tree), so a REGISTERED custom operator must work inside a
        streaming rule filter with no extra wiring — and match the batch
        row set on the same finite data."""
        from dynamicqueryengine_spark.sources.registry import load_table
        from dynamicqueryengine_spark.streaming.rules import (
            apply_rule_stream,
            run_stream_to_memory,
            stream_events,
        )

        rule = {
            "Conditions": {
                "Conditions": [
                    {
                        "Property": "event_type",
                        "Operator": "LengthBetween",
                        "Value": {"Lo": 4, "Hi": 5},
                    }
                ]
            }
        }
        sf = "/root/testdata/sf0.001"
        filtered = apply_rule_stream(stream_events(spark, sf), rule)
        counts = filtered.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        )
        run_stream_to_memory(counts, "t_custom_stream", output_mode="complete")
        got = {
            r["event_type"]: r["n"]
            for r in spark.table("t_custom_stream").collect()
        }
        batch = {
            r["event_type"]: r["n"]
            for r in load_table(spark, sf, "events")
            .filter(F.length("event_type").between(4, 5))
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert got == batch and got  # nonempty and stream ≡ batch
