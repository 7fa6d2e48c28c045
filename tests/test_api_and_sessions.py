"""Tests for the HTTP facade (reference entry point #1) and the
sessionization operator (batch + applyInPandasWithState streaming twin)."""

from __future__ import annotations

import json
import urllib.request

import pytest

from dynamicqueryengine_spark.api import evaluate_request, serve
from dynamicqueryengine_spark.functions.sessions import session_stats

from .conftest import SF_DIR

USERS_PAYLOAD = [
    {"Id": "u1", "Title": "Engineer", "Score": 10},
    {"Id": "u2", "Title": "Manager", "Score": 30},
    {"Id": "u3", "Title": "Engineer", "Score": 20},
]


class TestEvaluateRequest:
    def test_single_rule(self, spark):
        res = evaluate_request(
            spark,
            {
                "Rule": {
                    "Conditions": {
                        "Conditions": [
                            {"Property": "Title", "Operator": "Equal", "Value": "Engineer"}
                        ]
                    }
                },
                "Users": USERS_PAYLOAD,
            },
        )
        assert res["status"] == 200
        assert sorted(r["Id"] for r in res["rows"]) == ["u1", "u3"]

    def test_multi_rule_batch(self, spark):
        res = evaluate_request(
            spark,
            {
                "Rules": [
                    {"Conditions": {"Conditions": [
                        {"Property": "Id", "Operator": "Equal", "Value": "u1"}]}},
                    {"Conditions": {"Conditions": [
                        {"Property": "Score", "Operator": "GreaterThan", "Value": 15}]}},
                ],
                "Users": USERS_PAYLOAD,
            },
        )
        assert res["status"] == 200
        assert sorted(r["Id"] for r in res["rows"]) == ["u1", "u2", "u3"]

    def test_error_envelope(self, spark):
        res = evaluate_request(
            spark,
            {
                "Rule": {
                    "Conditions": {
                        "Conditions": [
                            {"Property": "Nope", "Operator": "Equal", "Value": 1}
                        ]
                    }
                },
                "Users": USERS_PAYLOAD,
            },
        )
        assert res["status"] == 400
        assert "Property 'Nope' not found" in res["Error"]

    def test_missing_rows(self, spark):
        res = evaluate_request(spark, {"Rule": {}})
        assert res["status"] == 400

    def test_group_aggregate_over_http_shape(self, spark):
        res = evaluate_request(
            spark,
            {
                "Rule": {
                    "GroupBy": ["Title"],
                    "Aggregation": {
                        "AggregateProperty": "Score",
                        "AggregateFunction": "Max",
                    },
                },
                "Users": USERS_PAYLOAD,
            },
        )
        assert res["status"] == 200
        got = {r["Title"]: r["Id"] for r in res["rows"]}
        assert got == {"Engineer": "u3", "Manager": "u2"}


class TestHttpServer:
    def test_post_roundtrip(self, spark):
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
                                        "Operator": "Equal",
                                        "Value": "Manager",
                                    }
                                ]
                            }
                        },
                        "Users": USERS_PAYLOAD,
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

    def test_bad_rule_gives_400(self, spark):
        server = serve(spark, port=0)
        try:
            port = server.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/rules/evaluate",
                data=json.dumps(
                    {"Rule": {"Conditions": {"Conditions": [
                        {"Property": "Id", "Operator": "Frobnicate"}]}},
                     "Users": USERS_PAYLOAD}
                ).encode(),
            )
            with pytest.raises(urllib.error.HTTPError) as err:
                urllib.request.urlopen(req, timeout=60)
            assert err.value.code == 400
        finally:
            server.shutdown()


class TestSessionization:
    def test_batch_sessions_shape(self, spark):
        from dynamicqueryengine_spark.sources.registry import load_table

        out = session_stats(load_table(spark, SF_DIR, "events"), gap_seconds=1800)
        rows = out.collect()
        assert len(rows) > 0
        assert out.columns == [
            "user_id", "session_idx", "session_start", "session_end",
            "n_events", "sum_value",
        ]
        for r in rows:
            assert r["session_start"] <= r["session_end"]
            assert r["n_events"] >= 1

    def test_streaming_sessions_are_prefix_of_batch(self, spark):
        """Closed streaming sessions must agree exactly with batch sessions;
        only the final (still-open) session per user may be missing."""
        from dynamicqueryengine_spark.sources.registry import load_table
        from dynamicqueryengine_spark.streaming.rules import (
            run_stream_to_memory,
            stream_events,
        )
        from dynamicqueryengine_spark.streaming.sessionize import (
            streaming_sessionize,
        )

        stream = streaming_sessionize(
            stream_events(spark, SF_DIR).select("user_id", "ts", "value"),
            gap_seconds=1800,
        )
        run_stream_to_memory(stream, "sessions_out", output_mode="append")
        got = {
            (r["user_id"], r["session_idx"]): (r["n_events"], r["sum_value"])
            for r in spark.sql("SELECT * FROM sessions_out").collect()
        }
        assert len(got) > 0
        batch = {
            (r["user_id"], r["session_idx"]): (r["n_events"], round(r["sum_value"], 6))
            for r in session_stats(
                load_table(spark, SF_DIR, "events"), gap_seconds=1800
            ).collect()
        }
        for key, (n, s) in got.items():
            assert key in batch
            assert batch[key] == (n, round(s, 6))

    def test_idle_session_closes_via_event_time_timeout(self, spark, tmp_path):
        """r5: an idle session must emit WITHOUT a follow-up event from
        its key — a later event from a DIFFERENT key advances the
        watermark past last+gap and the event-time timeout fires,
        emitting the session closed at its true last event with the
        same aggregates the batch twin computes."""
        import datetime as dt
        import glob
        import shutil

        from dynamicqueryengine_spark.streaming.rules import (
            run_stream_to_memory,
        )
        from dynamicqueryengine_spark.streaming.sessionize import (
            streaming_sessionize,
        )

        def ts(h, m=0):
            return dt.datetime(2024, 1, 1, h, m)

        src = tmp_path / "src"
        schema = "user_id long, ts timestamp, value double"

        def stage(rows, name):
            stagedir = tmp_path / f"stage_{name}"
            spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
                str(stagedir)
            )
            src.mkdir(exist_ok=True)
            shutil.move(
                glob.glob(str(stagedir / "part-*.parquet"))[0],
                str(src / name),
            )

        # user 1: two events then silence; user 2: two later events whose
        # arrival (in separate micro-batches) advances the watermark
        stage([(1, ts(10, 0), 2.5), (1, ts(10, 10), 1.0)], "a.parquet")
        stage([(2, ts(12, 0), 9.0)], "b.parquet")
        stage([(2, ts(14, 0), 9.0)], "c.parquet")

        stream = streaming_sessionize(
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src)),
            gap_seconds=1800,
        )
        run_stream_to_memory(stream, "idle_sessions_out", output_mode="append")
        rows = {
            r["user_id"]: r
            for r in spark.sql("SELECT * FROM idle_sessions_out").collect()
        }
        assert 1 in rows, "idle session never closed"
        r = rows[1]
        assert r["n_events"] == 2
        assert r["sum_value"] == 3.5
        assert r["session_start"] == ts(10, 0)
        assert r["session_end"] == ts(10, 10)  # closed at its TRUE last event


class TestDescribeEndpoint:
    def test_get_describe(self, spark):
        server = serve(spark, port=0)
        try:
            port = server.server_address[1]
            with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/rules/describe"
            ) as resp:
                body = json.loads(resp.read())
            assert resp.status == 200
            assert len(body["operators"]) == 27
            assert "POST /rules/evaluate" in body["endpoints"]
            assert body["aggregate_functions"] == ["Min", "Max", "Count"]
        finally:
            server.shutdown()

    def test_get_unknown_path_404(self, spark):
        server = serve(spark, port=0)
        try:
            port = server.server_address[1]
            import urllib.error

            try:
                urllib.request.urlopen(f"http://127.0.0.1:{port}/nope")
                raise AssertionError("expected 404")
            except urllib.error.HTTPError as e:
                assert e.code == 404
        finally:
            server.shutdown()


class TestExplainEndpoint:
    PAYLOAD = {
        "Rule": {
            "Conditions": {
                "Conditions": [
                    {"Property": "Age", "Operator": "GreaterThan", "Value": 30}
                ]
            }
        },
        "Users": [{"Name": "a", "Age": 25}, {"Name": "b", "Age": 40}],
    }

    def test_explain_returns_plans_without_executing(self, spark):
        from dynamicqueryengine_spark.api import explain_request

        out = explain_request(spark, self.PAYLOAD)
        assert out["status"] == 200
        assert "Filter" in out["optimized_plan"]
        assert "Age" in out["optimized_plan"]
        assert "rows" not in out  # no execution, no materialized rows

    def test_explain_http_route(self, spark):
        server = serve(spark, port=0)
        try:
            port = server.server_address[1]
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/rules/explain",
                data=json.dumps(self.PAYLOAD).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                body = json.loads(resp.read())
            assert resp.status == 200
            assert "physical_plan" in body and "optimized_plan" in body
        finally:
            server.shutdown()

    def test_explain_bad_rule_gives_400(self, spark):
        from dynamicqueryengine_spark.api import explain_request

        out = explain_request(
            spark, {"Users": [{"Name": "a"}]}  # no Rule
        )
        assert out["status"] == 400 and "Error" in out
