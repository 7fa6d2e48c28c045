"""Tests for PII redaction (functions/redact.py)."""

from __future__ import annotations

from dynamicqueryengine_spark.functions.redact import redact_pii


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestRedactPii:
    def test_all_categories(self, spark):
        df = _docs(
            spark,
            [(1, "mail a.b+c@ex-ample.co.uk call 555-123-4567 ip 10.0.0.1 end")],
        )
        r = redact_pii(df).collect()[0]
        assert (r["n_email"], r["n_phone"], r["n_ip"]) == (1, 1, 1)
        assert r["redacted"] == "mail <EMAIL> call <PHONE> ip <IP> end"

    def test_clean_text_untouched(self, spark):
        df = _docs(spark, [(1, "no pii here at all")])
        r = redact_pii(df).collect()[0]
        assert (r["n_email"], r["n_phone"], r["n_ip"]) == (0, 0, 0)
        assert r["redacted"] == "no pii here at all"

    def test_multiple_matches_counted(self, spark):
        df = _docs(spark, [(1, "a@b.io c@d.io 1.2.3.4 5.6.7.8 9.10.11.12")])
        r = redact_pii(df).collect()[0]
        assert r["n_email"] == 2 and r["n_ip"] == 3
        assert r["redacted"] == "<EMAIL> <EMAIL> <IP> <IP> <IP>"
