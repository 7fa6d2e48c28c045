"""Streaming sink half of the vt Python DataSource (r14, verdict ask
#2): ``df.writeStream.format("vt")`` appends every micro-batch through
the same Arrow split/materialize/commit path as the batch writer,
marked with the exactly-once txn guard ``(txnAppId, batchId)`` — a
restarted query replaying a committed batch is a clean no-op, so the
sink is idempotent under Spark's at-least-once micro-batch replay
(sources/datasource.py, _VtStreamWriter)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.sources.datasource import (
    VersionedTableDataSource,
    vt_register,
)
from dynamicqueryengine_spark.sources.versioned import (
    _read_manifest,
    vt_read,
    vt_versions,
    vt_write,
)


@pytest.fixture()
def registered(spark):
    vt_register(spark)
    return spark


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, g string, x double")


def _arrow_batches(df, schema):
    from pyspark.sql.pandas.types import to_arrow_schema

    return list(
        df.toArrow().cast(to_arrow_schema(schema)).to_batches()
    )


class TestStreamSinkEndToEnd:
    def test_change_stream_to_vt_sink_exactly_once(
        self, registered, tmp_path
    ):
        """vt source → vt sink, availableNow: each restart delivers
        exactly the new changes; an idle restart commits nothing."""
        from dynamicqueryengine_spark.streaming.source import (
            vt_change_stream,
        )

        spark = registered
        src = str(tmp_path / "src")
        dst = str(tmp_path / "dst")
        ck = str(tmp_path / "ck")
        vt_write(spark, src, _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]))
        vt_write(
            spark, src, _df(spark, [(3, "c", 3.0)]), mode="append"
        )

        def run():
            q = (
                vt_change_stream(spark, src)
                .select("id", "g", "x")
                .writeStream.format("vt")
                .option("path", dst)
                .option("checkpointLocation", ck)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

        run()
        assert sorted(
            r["id"] for r in vt_read(spark, dst).collect()
        ) == [1, 2, 3]
        head = vt_versions(dst)[-1]
        # idle restart: zero-row batches commit nothing
        run()
        assert vt_versions(dst)[-1] == head
        # new source data flows through on the next restart, once
        vt_write(
            spark, src, _df(spark, [(4, "d", 4.0)]), mode="append"
        )
        run()
        assert sorted(
            r["id"] for r in vt_read(spark, dst).collect()
        ) == [1, 2, 3, 4]
        # the sink recorded its txn markers under the checkpoint app
        m = _read_manifest(dst, vt_versions(dst)[-1])
        assert any(
            app.startswith("vtstream:") for app in m.get("txns", {})
        )

    def test_append_only_modes_enforced(self, registered, tmp_path):
        spark = registered
        src = VersionedTableDataSource(
            {"path": str(tmp_path / "t"), "txnappid": "app"}
        )
        schema = _df(spark, [(1, "a", 1.0)]).schema
        with pytest.raises(ValueError, match="APPEND output"):
            src.streamWriter(schema, True)
        with pytest.raises(ValueError, match="exactly-once identity"):
            VersionedTableDataSource(
                {"path": str(tmp_path / "t")}
            ).streamWriter(schema, False)


class TestStreamSinkReplay:
    """Micro-batch replay semantics driven directly through the writer
    object (the same calls Spark's commit runner makes)."""

    def _writer(self, spark, path, app="app1"):
        src = VersionedTableDataSource({"path": path, "txnappid": app})
        schema = _df(spark, [(1, "a", 1.0)]).schema
        return src.streamWriter(schema, False), schema

    def test_replayed_batch_is_noop(self, registered, tmp_path):
        spark = registered
        path = str(tmp_path / "t")
        w, schema = self._writer(spark, path)
        b0 = _arrow_batches(
            _df(spark, [(1, "a", 1.0), (2, "b", 2.0)]), schema
        )
        m0 = w.write(iter(b0))
        w.commit([m0], 0)
        assert vt_read(spark, path).count() == 2
        v_after = vt_versions(path)[-1]
        # the restarted query re-runs batch 0 through a FRESH writer
        # (Spark re-instantiates the source per worker): same staging,
        # same batchId — must be a no-op
        w2, _ = self._writer(spark, path)
        m0b = w2.write(iter(b0))
        w2.commit([m0b], 0)
        assert vt_versions(path)[-1] == v_after
        assert vt_read(spark, path).count() == 2
        # the next batch commits normally
        m1 = w2.write(
            iter(_arrow_batches(_df(spark, [(3, "c", 3.0)]), schema))
        )
        w2.commit([m1], 1)
        assert vt_read(spark, path).count() == 3

    def test_abort_clears_attempt_keeps_staging(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        w, schema = self._writer(spark, path)
        m0 = w.write(
            iter(_arrow_batches(_df(spark, [(1, "a", 1.0)]), schema))
        )
        w.abort([m0], 0)
        assert os.path.isdir(w._staged)
        assert os.listdir(w._staged) == []
        assert vt_versions(path) == []
        # the retried batch succeeds into an empty table
        m0b = w.write(
            iter(_arrow_batches(_df(spark, [(1, "a", 1.0)]), schema))
        )
        w.commit([m0b], 0)
        assert vt_read(spark, path).count() == 1

    def test_partitioned_stream_appends_split_per_value(
        self, registered, tmp_path
    ):
        spark = registered
        path = str(tmp_path / "t")
        vt_write(
            spark,
            path,
            _df(spark, [(0, "a", 0.0), (1, "b", 1.0)]),
            partition_by=["g"],
        )
        w, schema = self._writer(spark, path)
        m0 = w.write(
            iter(
                _arrow_batches(
                    _df(
                        spark,
                        [(2, "a", 2.0), (3, "b", 3.0), (4, "c", 4.0)],
                    ),
                    schema,
                )
            )
        )
        w.commit([m0], 0)
        m = _read_manifest(path, vt_versions(path)[-1])
        assert set(m["dirs"]) == set(m["partitions"])
        assert sorted(
            {pv["g"] for pv in m["partitions"].values()}
        ) == ["a", "b", "c"]
        got = sorted(
            r["id"]
            for r in vt_read(
                spark, path, predicate=("g", "=", "a")
            ).collect()
        )
        assert got == [0, 2]
