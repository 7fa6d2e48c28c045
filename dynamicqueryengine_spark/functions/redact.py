"""PII detection and redaction — the scrubbing pass every production
pretraining pipeline runs before training (emails, phone numbers, IP
addresses → placeholder tokens), plus per-document match counts for
audit metrics.

Pure ``regexp_replace`` / ``regexp_count`` Column expressions — JVM-side
codegen, embarrassingly parallel, zero shuffles; at 100 TB this is a
map-only stage. Patterns are written in the common subset of Java regex
and RE2 (no lookaround, no backreferences) so the DuckDB oracle runs the
IDENTICAL patterns and the redacted text is value-checked byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "redact_pii_sql"]

# (name, pattern, replacement) — Java/RE2 common subset only.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
    ("ip", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
)


def redact_pii(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, n_email, n_phone, n_ip, redacted) — match counts per category
    and the text with every match replaced by its placeholder. Patterns
    apply in declaration order (emails first, so phone/IP matches inside
    an already-redacted span can't double-fire)."""
    counts = [
        F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}")
        for name, pat, _ in PII_PATTERNS
    ]
    redacted: Column = F.col(text_col)
    for _, pat, repl in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, repl)
    return df.select(id_col, *counts, redacted.alias("redacted"))


def redact_pii_sql(
    table: str, text_col: str = "text", id_col: str = "doc_id"
) -> str:
    """DuckDB mirror of :func:`redact_pii` — identical patterns; DuckDB
    needs the explicit 'g' flag for global replacement (Spark is global
    by default)."""
    count_cols = ", ".join(
        f"len(regexp_extract_all({text_col}, '{pat}')) AS n_{name}"
        for name, pat, _ in PII_PATTERNS
    )
    redacted = text_col
    for _, pat, repl in PII_PATTERNS:
        redacted = f"regexp_replace({redacted}, '{pat}', '{repl}', 'g')"
    return (
        f"SELECT {id_col}, {count_cols}, {redacted} AS redacted "
        f"FROM {table}"
    )
