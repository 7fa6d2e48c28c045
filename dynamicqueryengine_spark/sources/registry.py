"""Table registry: named Parquet tables → DataFrames / temp views.

The reference has no storage layer at all — rows arrive inline in the HTTP
body (RuleController.cs:31-35) or as in-process collections
(RuleDefinitionExecutor.cs:8-13). The Spark-native equivalent of "one request
= one dataset + one rule" is "registered table + rule document", with
``spark.createDataFrame`` covering the inline-payload path (see
``inline_table``).

Scale notes: tables load lazily via ``spark.read.parquet`` — scans stay
declarative so Catalyst pushes filters/column pruning into the Parquet
reader; nothing is cached by default (at 100 TB you want pushdown, not
driver-side caching).
"""

from __future__ import annotations

import os
from typing import Any, Iterable, Mapping

from pyspark.sql import DataFrame, SparkSession, functions as F

# The driver's synthetic star schema (TESTDATA.md).
DEFAULT_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


class TableRegistry:
    """Lazy name → DataFrame catalog over a directory of ``{name}.parquet``."""

    def __init__(
        self,
        spark: SparkSession,
        base_dir: str,
        tables: Iterable[str] = DEFAULT_TABLES,
    ) -> None:
        self.spark = spark
        self.base_dir = base_dir
        self.tables = tuple(tables)
        self._cache: dict[str, DataFrame] = {}

    def path(self, name: str) -> str:
        return os.path.join(self.base_dir, f"{name}.parquet")

    def table(self, name: str) -> DataFrame:
        if name not in self._cache:
            if name not in self.tables and not os.path.exists(self.path(name)):
                raise KeyError(f"Unknown table '{name}' under {self.base_dir}")
            self._cache[name] = load_table(self.spark, self.base_dir, name)
        return self._cache[name]

    def __getitem__(self, name: str) -> DataFrame:
        return self.table(name)

    def register_views(self) -> None:
        """Expose every table as a temp view for ``spark.sql`` access."""
        for name in self.tables:
            self.table(name).createOrReplaceTempView(name)


def load_table(spark: SparkSession, base_dir: str, name: str) -> DataFrame:
    """Load one parquet table, normalizing known footer quirks.

    Some generations of the synthetic ``events`` table store ``ts`` as
    INT64 TIMESTAMP(NANOS), which Spark's Parquet reader rejects; read it
    as long (``spark.sql.legacy.parquet.nanosAsLong``) and rebuild a µs
    timestamp with integer division (``div`` — float division would lose
    precision above 2^53 ns). Other generations already store µs; the
    rebuild is gated on the loaded dtype so both footers work. Either way
    the result matches DuckDB's ``CAST(ts AS TIMESTAMP)`` (a no-op on µs,
    truncation on nanos), which oracle SQL applies on its side.
    """
    path = os.path.join(base_dir, f"{name}.parquet")
    # timestamp literals compile against the session timezone; pin UTC so
    # rule timestamps mean the same instant under any caller's session
    # (DuckDB oracle timestamps are naive-UTC)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":  # nanos footer
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        else:
            # µs footer arrives as TIMESTAMP_NTZ; with the session pinned
            # to UTC the cast to TIMESTAMP is wall-clock identity and keeps
            # every downstream window/watermark/unix_micros type stable
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def inline_table(
    spark: SparkSession,
    rows: Iterable[Mapping[str, Any]],
    schema: Any = None,
) -> DataFrame:
    """Inline row payloads (the reference's HTTP-body ``List<User>`` path,
    RuleController.cs:31-35) → DataFrame."""
    return spark.createDataFrame(list(rows), schema=schema)


_FORMATS = ("parquet", "csv", "json", "orc")


def read_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: Any = None,
    **options: Any,
) -> DataFrame:
    """Format-dispatching reader: parquet / csv / json / orc → DataFrame.

    Column pruning reaches every format; filter PUSHDOWN only the columnar
    ones (parquet/orc — check ``PushedFilters`` in ``.explain``), which is
    why they are the recommended lake format and csv/json are ingest
    formats you convert ONCE (``writers.write_parquet``) rather than scan
    repeatedly at 100 TB. For csv/json, pass an explicit ``schema``:
    schema inference reads the data twice and types drift between files —
    a pinned schema is both faster and stable. csv defaults to
    ``header=true`` to round-trip ``writers.write_csv``.
    """
    if fmt not in _FORMATS:
        raise ValueError(f"Unsupported format '{fmt}' (one of {_FORMATS})")
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if fmt == "csv" and "header" not in options:
        options["header"] = "true"
    if options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})
    return getattr(reader, fmt)(path)
