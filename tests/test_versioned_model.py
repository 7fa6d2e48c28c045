"""Model-based property test for the versioned table (sources/
versioned.py): hypothesis drives random operation sequences — write,
append, merge (with and without txn markers), optimize, checkpoint
(plain and DV-consolidating), reorg, compact, DML in both modes,
vacuum, analyze, shallow clone, drift diff — against a trivial in-memory model (a list-of-rows multiset per
version), and after EVERY step the real table must agree with the model
on:

* the committed version list (modulo vacuum retention),
* the full row multiset of every retained version (snapshot isolation +
  time travel survive arbitrary interleavings),
* predicate reads equal to model-side filtering (file/dir pruning can
  never change results, whatever layout history produced),
* vt_head (checkpoint fast path included) naming the true head,
* vt_last_txn surviving vacuum (the carried txns map).

Spark actions dominate runtime, so the sequences are short and few;
hypothesis explores the ORDERINGS, which is where the r6 advisor bugs
(stale checkpoint after vacuum, txn markers vacuumed away) lived.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from dynamicqueryengine_spark.sources.versioned import (
    vt_checkpoint,
    vt_rename_column,
    vt_widen_column,
    vt_head,
    vt_last_txn,
    vt_merge,
    vt_optimize,
    vt_read,
    vt_restore,
    vt_vacuum,
    vt_versions,
    vt_write,
)

_OP = st.one_of(
    st.tuples(st.just("append"), st.integers(0, 4)),
    st.tuples(st.just("overwrite"), st.integers(0, 4)),
    st.tuples(st.just("merge"), st.integers(0, 4)),
    st.tuples(st.just("merge_txn"), st.integers(0, 4)),
    st.tuples(st.just("append_race"), st.integers(0, 4)),
    st.tuples(st.just("optimize"), st.just(0)),
    st.tuples(st.just("checkpoint"), st.just(0)),
    st.tuples(st.just("vacuum"), st.integers(1, 3)),
    # payload = how far back to restore (clamped to retained versions)
    st.tuples(st.just("restore"), st.integers(1, 4)),
    # r9 metadata-only commits/reads: ANALYZE advances the head without
    # changing data; clone/diff never touch the source at all
    st.tuples(st.just("analyze"), st.just(0)),
    st.tuples(st.just("clone_check"), st.just(0)),
    st.tuples(st.just("diff_check"), st.integers(1, 4)),
    # r10 file-granular DML: predicate delete/update over whatever
    # layout the history produced (partial dirs, optimize output,
    # multi-dir appends) must equal model-side list surgery
    st.tuples(st.just("delete"), st.integers(0, 9)),
    st.tuples(st.just("update"), st.integers(0, 9)),
    st.tuples(st.just("merge_del"), st.integers(0, 4)),
    # r11 merge-on-read: the DV variants must be row-for-row
    # indistinguishable from their rewrite twins under ANY history —
    # vectors survive appends/optimize/restore/vacuum interleavings,
    # union across repeated deletes, and materialize on rewrite
    st.tuples(st.just("delete_dv"), st.integers(0, 9)),
    st.tuples(st.just("update_dv"), st.integers(0, 9)),
    st.tuples(st.just("merge_dv"), st.integers(0, 4)),
    st.tuples(st.just("merge_dv_del"), st.integers(0, 4)),
    # incremental compaction: layout-only, possibly a no-op
    st.tuples(st.just("compact"), st.just(0)),
    # r12 DV lifecycle: targeted purge (layout-only, no-op without
    # vectors) and checkpoint sidecar consolidation (metadata-only
    # commit when >1 live sidecar, plain checkpoint otherwise) — both
    # must be row-for-row invisible under ANY interleaving with the
    # DV-writing ops above
    st.tuples(st.just("reorg"), st.just(0)),
    st.tuples(st.just("checkpoint_dv"), st.just(0)),
    # r12 schema DDL: RENAME (toggles the value column's logical name —
    # metadata-only, per-version schemas, physical identity stable) and
    # TYPE WIDENING (int id → bigint once; re-widening must refuse) —
    # both must be row-for-row invisible under ANY interleaving with
    # appends/DML/optimize/restore/vacuum, including restores that
    # travel back to the narrow / old-name schema
    st.tuples(st.just("rename"), st.just(0)),
    st.tuples(st.just("widen"), st.just(0)),
    # r13 partition columns: toggle PARTITIONED BY via overwrite (the
    # only legal way to change it), then every later append/overwrite
    # auto-splits; partition-value deletes must equal model-side list
    # surgery whether they hit pure partition dirs (metadata drop) or
    # DML-rewrite leftovers (file rewrites) — the model cannot tell the
    # difference, which is the invariant
    st.tuples(st.just("partition_toggle"), st.just(0)),
    st.tuples(st.just("partition_drop"), st.integers(0, 4)),
    # r14 partition-spec EVOLUTION: toggle PARTITIONED BY metadata-only
    # (vt_set_partition_spec — Iceberg's lazy-migration semantics). Old
    # dirs keep their recorded values and prune on the OLD spec's
    # columns; later appends split under the new spec; partition_drop
    # over the MIXED layout must equal model-side list surgery whether
    # it hits old-spec dirs (row scan), new-spec dirs (metadata drop)
    # or both — the model cannot tell, which is the invariant
    st.tuples(st.just("spec_evolve"), st.just(0)),
    # r14 replaceWhere: atomic (previous MINUS region) + incoming.
    # The id-range variant exercises stats classification and boundary
    # rewrites; the partition-value variant exercises the metadata-only
    # directory drop on partitioned states and the valued landing of
    # the incoming rows — under ANY interleaving with DML/DDL/restore,
    # including mapped (post-rename) and widened states
    st.tuples(st.just("replace_where"), st.integers(0, 9)),
    st.tuples(st.just("replace_partition"), st.integers(0, 4)),
)


def _payload(seed: int, step: int) -> list[tuple[int, str]]:
    """3 rows keyed off (seed, step) — overlapping ids across steps so
    merges both update and insert, and appends create duplicate ids."""
    base = seed * 2 + step
    return [(base + i, f"s{step}v{seed + i}") for i in range(3)]


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[
        HealthCheck.function_scoped_fixture,
        HealthCheck.too_slow,
    ],
)
@given(ops=st.lists(_OP, min_size=3, max_size=7))
def test_random_histories_match_model(spark, tmp_path_factory, ops):
    path = str(tmp_path_factory.mktemp("vtm") / "t")
    versions: dict[int, list] = {}  # the model: version -> row multiset
    # per-version logical schema state: (value column name, id widened)
    meta: dict[int, tuple] = {}
    head = 0
    last_txn: int | None = None
    next_txn = 1

    def df_of(rows, name="v"):
        # ids are small: writing them int exercises the append-side
        # store assignment (auto-upcast) once the table widens
        return spark.createDataFrame(rows, f"id int, {name} string")

    first = _payload(0, 0)
    vt_write(spark, path, df_of(first))
    head = 1
    versions[1] = list(first)
    meta[1] = ("v", False, False)

    for step, (kind, seed) in enumerate(ops, start=1):
        rows = _payload(seed, step)
        vn, wide, pby = meta[head]
        if kind == "append":
            vt_write(spark, path, df_of(rows, vn), mode="append")
            head += 1
            versions[head] = versions[head - 1] + rows
            meta[head] = (vn, wide, pby)
        elif kind == "overwrite":
            vt_write(spark, path, df_of(rows, vn), mode="overwrite")
            head += 1
            versions[head] = list(rows)
            # overwrite replaces the schema with the incoming frame's:
            # the id column narrows back to int (and the mapping resets)
            meta[head] = (vn, False, pby)
        elif kind == "append_race":
            # two racing appends, deterministically interleaved: the
            # winner commits between the loser's data write and commit;
            # the loser must retry on the advanced head so BOTH land
            import dynamicqueryengine_spark.sources.versioned as V

            rows_w = _payload(seed + 7, step)
            # partitioned appends write via _write_partitioned_dirs;
            # plain ones via _write_data_dir — hook whichever this
            # table's state routes through, so the race fires either way
            attr = (
                "_write_partitioned_dirs" if pby else "_write_data_dir"
            )
            real = getattr(V, attr)
            injected: list = []

            def racy(df, p, *a, _real=real, _inj=injected, _rw=rows_w,
                     _vn=vn, **kw):
                out = _real(df, p, *a, **kw)
                if not _inj:
                    _inj.append(True)
                    vt_write(spark, path, df_of(_rw, _vn), mode="append")
                return out

            setattr(V, attr, racy)
            try:
                vt_write(spark, path, df_of(rows, vn), mode="append")
            finally:
                setattr(V, attr, real)
            head += 1
            versions[head] = versions[head - 1] + rows_w  # winner
            meta[head] = (vn, wide, pby)
            head += 1
            versions[head] = versions[head - 1] + rows  # retried loser
            meta[head] = (vn, wide, pby)
        elif kind in ("merge", "merge_txn"):
            txn = ("app", next_txn) if kind == "merge_txn" else None
            vt_merge(spark, path, df_of(rows, vn), ["id"], txn=txn)
            if txn:
                last_txn = next_txn
                next_txn += 1
            upd_ids = {r[0] for r in rows}
            head += 1
            versions[head] = [
                t for t in versions[head - 1] if t[0] not in upd_ids
            ] + rows
            meta[head] = (vn, wide, pby)
        elif kind in ("delete", "delete_dv"):
            from dynamicqueryengine_spark.sources.versioned import (
                vt_delete,
            )

            survivors = [t for t in versions[head] if not (t[0] < seed)]
            v = vt_delete(
                spark,
                path,
                ("id", "<", seed),
                mode="dv" if kind == "delete_dv" else "rewrite",
            )
            if len(survivors) == len(versions[head]):
                # provably-empty delete is a no-op commit
                assert v == head
            else:
                head += 1
                versions[head] = survivors
                meta[head] = (vn, wide, pby)
        elif kind in ("update", "update_dv"):
            from dynamicqueryengine_spark.sources.versioned import (
                vt_update,
            )

            new_rows = [
                (t[0], t[1] + "!") if t[0] >= seed else t
                for t in versions[head]
            ]
            v = vt_update(
                spark,
                path,
                ("id", ">=", seed),
                {vn: f"concat({vn}, '!')"},
                mode="dv" if kind == "update_dv" else "rewrite",
            )
            if new_rows == versions[head]:
                assert v == head
            else:
                head += 1
                versions[head] = new_rows
                meta[head] = (vn, wide, pby)
        elif kind in ("merge_del", "merge_dv", "merge_dv_del"):
            # merge (optionally merge-on-read) where, in the _del
            # variants, every odd-id update row is a tombstone
            has_del = kind != "merge_dv"
            vt_merge(
                spark,
                path,
                df_of(rows, vn),
                ["id"],
                delete_where="id % 2 = 1" if has_del else None,
                mode="rewrite" if kind == "merge_del" else "dv",
            )
            upd_ids = {r[0] for r in rows}
            keep_rows = (
                [r for r in rows if r[0] % 2 == 0] if has_del else rows
            )
            head += 1
            versions[head] = [
                t for t in versions[head - 1] if t[0] not in upd_ids
            ] + keep_rows
            meta[head] = (vn, wide, pby)
        elif kind == "compact":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_compact,
            )

            v = vt_compact(
                spark, path, small_file_bytes=1 << 30, min_files=2
            )
            if v != head:
                head += 1
                versions[head] = list(versions[head - 1])
                meta[head] = (vn, wide, pby)
        elif kind == "optimize":
            vt_optimize(spark, path, ["id"], n_partitions=2)
            head += 1
            versions[head] = list(versions[head - 1])
            meta[head] = (vn, wide, pby)
        elif kind == "restore":
            retained = sorted(versions)
            target = retained[max(0, len(retained) - 1 - seed)]
            vt_restore(spark, path, target)
            head += 1
            versions[head] = list(versions[target])
            # restore resurrects the TARGET's schema state: logical
            # names AND declared types travel with the manifest
            meta[head] = meta[target]
        elif kind == "analyze":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_analyze,
                vt_table_stats,
            )

            vt_analyze(spark, path, columns=["id"])
            head += 1
            versions[head] = list(versions[head - 1])
            meta[head] = (vn, wide, pby)
            st_ = vt_table_stats(path)
            assert st_["analyze"]["rows"] == len(versions[head])
            assert st_["analyze_stale"] is False
        elif kind == "clone_check":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_clone,
            )

            cpath = f"{path}_clone{step}"
            vt_clone(spark, path, cpath)
            got = Counter(
                (r["id"], r[vn]) for r in vt_read(spark, cpath).collect()
            )
            assert got == Counter(versions[head]), f"clone after {kind}"
            # the clone is a separate table: source log untouched
        elif kind == "diff_check":
            from dynamicqueryengine_spark.sources.versioned import vt_diff

            retained = sorted(versions)
            target = retained[max(0, len(retained) - 1 - seed)]
            d = vt_diff(path, target, head)
            if d["rows_old"] is not None:
                assert d["rows_old"] == len(versions[target])
            if d["rows_new"] is not None:
                assert d["rows_new"] == len(versions[head])
        elif kind == "reorg":
            from dynamicqueryengine_spark.sources.versioned import vt_reorg

            v = vt_reorg(spark, path)
            if v != head:  # purged something: layout-only commit
                head += 1
                versions[head] = list(versions[head - 1])
                meta[head] = (vn, wide, pby)
        elif kind == "checkpoint_dv":
            v = vt_checkpoint(spark, path, consolidate_dv=True)
            assert v in (head, head + 1)
            if v != head:  # folded >1 sidecar: metadata-only commit
                head += 1
                versions[head] = list(versions[head - 1])
                meta[head] = (vn, wide, pby)
        elif kind == "rename":
            other = "w" if vn == "v" else "v"
            if pby:
                import pytest as _pytest

                with _pytest.raises(ValueError, match="pinned by"):
                    vt_rename_column(path, vn, other)
            else:
                vt_rename_column(path, vn, other)
                head += 1
                versions[head] = list(versions[head - 1])
                meta[head] = (other, wide, pby)
        elif kind == "widen":
            if wide:
                import pytest as _pytest

                with _pytest.raises(ValueError, match="cannot widen"):
                    vt_widen_column(path, "id", "bigint")
            else:
                vt_widen_column(path, "id", "bigint")
                head += 1
                versions[head] = list(versions[head - 1])
                meta[head] = (vn, True, pby)
        elif kind == "partition_toggle":
            snap_rows = list(versions[head])
            vt_write(
                spark,
                path,
                df_of(snap_rows, vn),
                mode="overwrite",
                partition_by=([] if pby else [vn]),
            )
            head += 1
            versions[head] = snap_rows
            meta[head] = (vn, False, not pby)
        elif kind == "spec_evolve":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_set_partition_spec,
            )

            vt_set_partition_spec(path, [] if pby else [vn])
            head += 1
            versions[head] = list(versions[head - 1])
            meta[head] = (vn, wide, not pby)
        elif kind == "partition_drop":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_delete,
            )

            vals = sorted({t[1] for t in versions[head]})
            if vals:
                victim = vals[seed % len(vals)]
                survivors = [
                    t for t in versions[head] if t[1] != victim
                ]
                v = vt_delete(spark, path, (vn, "=", victim))
                if len(survivors) == len(versions[head]):
                    assert v == head
                else:
                    head += 1
                    versions[head] = survivors
                    meta[head] = (vn, wide, pby)
        elif kind == "replace_where":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_replace_where,
            )

            incoming = [
                (i, f"rw{step}n{i}") for i in range(min(seed, 3))
            ]
            vt_replace_where(
                spark, path, df_of(incoming, vn), ("id", "<", seed)
            )
            head += 1
            versions[head] = [
                t for t in versions[head - 1] if not (t[0] < seed)
            ] + incoming
            meta[head] = (vn, wide, pby)
        elif kind == "replace_partition":
            from dynamicqueryengine_spark.sources.versioned import (
                vt_replace_where,
            )

            vals = sorted({t[1] for t in versions[head]})
            if vals:
                victim = vals[seed % len(vals)]
                incoming = [
                    (900 + step * 3 + i, victim) for i in range(2)
                ]
                vt_replace_where(
                    spark, path, df_of(incoming, vn),
                    (vn, "=", victim),
                )
                head += 1
                versions[head] = [
                    t for t in versions[head - 1] if t[1] != victim
                ] + incoming
                meta[head] = (vn, wide, pby)
        elif kind == "checkpoint":
            vt_checkpoint(spark, path)
        elif kind == "vacuum":
            vt_vacuum(spark, path, keep_last=seed, grace_seconds=0)
            keep = sorted(versions)[-seed:]
            versions = {v: r for v, r in versions.items() if v in keep}
            meta = {v: m for v, m in meta.items() if v in keep}

        # ---- invariants after every step ----
        assert vt_versions(path) == sorted(versions)
        assert vt_head(path) == head
        for v, expected in versions.items():
            name_v = meta[v][0]
            got = Counter(
                (r["id"], r[name_v])
                for r in vt_read(spark, path, v).collect()
            )
            assert got == Counter(expected), f"version {v} after {kind}"
        head_name = meta[head][0]
        pruned = Counter(
            (r["id"], r[head_name])
            for r in vt_read(spark, path, predicate=("id", ">", 4)).collect()
        )
        assert pruned == Counter(
            t for t in versions[head] if t[0] > 4
        ), f"pruned head read after {kind}"
        if last_txn is not None:
            assert vt_last_txn(path, "app") == last_txn


def test_scripted_dv_history_regression(spark, tmp_path_factory):
    """Deterministic mixed history pinning the merge-on-read
    interleavings the random draw may not hit every run: DV delete →
    append → DV update → optimize (materialize) → DV merge with
    tombstones → restore past it all → vacuum. After every step the
    table equals the model."""
    from dynamicqueryengine_spark.sources.versioned import (
        vt_compact,
        vt_delete,
        vt_restore,
        vt_update,
    )

    path = str(tmp_path_factory.mktemp("vtdv") / "t")

    def df_of(rows):
        return spark.createDataFrame(rows, "id long, v string")

    model: dict[int, list] = {}
    rows0 = [(i, f"v{i}") for i in range(8)]
    vt_write(spark, path, df_of(rows0))
    model[1] = list(rows0)
    vt_optimize(spark, path, ["id"], n_partitions=2)
    model[2] = list(model[1])
    vt_delete(spark, path, ("id", "=", 3), mode="dv")
    model[3] = [t for t in model[2] if t[0] != 3]
    vt_write(spark, path, df_of([(100, "x")]), mode="append")
    model[4] = model[3] + [(100, "x")]
    vt_update(spark, path, ("id", "=", 5), {"v": "'FIVE'"}, mode="dv")
    model[5] = [(t[0], "FIVE") if t[0] == 5 else t for t in model[4]]
    vt_compact(spark, path, small_file_bytes=1 << 30, min_files=2)
    model[6] = list(model[5])
    vt_merge(
        spark,
        path,
        df_of([(0, "ZERO"), (1, "gone"), (200, "new")]),
        ["id"],
        delete_where="v = 'gone'",
        mode="dv",
    )
    model[7] = [
        t for t in model[6] if t[0] not in (0, 1)
    ] + [(0, "ZERO"), (200, "new")]
    vt_restore(spark, path, 3)
    model[8] = list(model[3])
    for v, expected in model.items():
        got = Counter(
            (r["id"], r["v"]) for r in vt_read(spark, path, v).collect()
        )
        assert got == Counter(expected), f"version {v}"
    vt_vacuum(spark, path, keep_last=2, grace_seconds=0)
    assert vt_versions(path) == [7, 8]
    got = Counter(
        (r["id"], r["v"]) for r in vt_read(spark, path).collect()
    )
    assert got == Counter(model[8])
