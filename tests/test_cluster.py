"""Tests for connected-components dedup clustering (functions/cluster.py):
propagation fixpoint vs a Python union-find reference on chains, cliques,
multiple components, and singleton handling."""

from __future__ import annotations

import pytest

from dynamicqueryengine_spark.functions.cluster import (
    cluster_assign,
    connected_components,
)


def _union_find(n_ids, pairs):
    parent = {i: i for i in n_ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min member id per component
    comp = {}
    for i in n_ids:
        comp.setdefault(find(i), []).append(i)
    return {i: min(members) for r, members in comp.items() for i in members}


class TestConnectedComponents:
    @pytest.mark.parametrize(
        "edges",
        [
            [(1, 2), (2, 3), (3, 4)],               # chain
            [(1, 2), (1, 3), (2, 3)],               # clique
            [(1, 2), (5, 6), (8, 9), (9, 5)],       # two components
            [(10, 1), (2, 10), (7, 3)],             # min id not first seen
        ],
    )
    def test_matches_union_find(self, spark, edges):
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(pairs).collect()
        }
        ids = sorted({x for e in edges for x in e})
        expected = _union_find(ids, edges)
        assert got == expected

    def test_long_chain_converges(self, spark):
        # 30-node chain — diameter forces many propagation rounds
        edges = [(i, i + 1) for i in range(30)]
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {r["id"]: r["component"] for r in connected_components(pairs, max_iter=40).collect()}
        assert set(got.values()) == {0}


class TestSchemaParity:
    """Both paths must emit the same schema, derived from the input id
    type — the driver fast path used to hardcode long/long."""

    @pytest.mark.parametrize("force_distributed", [False, True])
    def test_string_ids_both_paths(self, spark, monkeypatch, force_distributed):
        from dynamicqueryengine_spark.functions import cluster as C

        if force_distributed:
            monkeypatch.setattr(C, "DRIVER_CC_MAX_EDGES", 0)
        pairs = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("x", "y")], "id_a string, id_b string"
        )
        out = connected_components(pairs, max_iter=10)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "string",
            "string",
        ]
        got = {r["id"]: r["component"] for r in out.collect()}
        assert got == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x"}

    def test_empty_pairs_schema(self, spark):
        pairs = spark.createDataFrame([], "id_a long, id_b long")
        out = connected_components(pairs)
        assert [f.dataType.simpleString() for f in out.schema.fields] == [
            "bigint",
            "bigint",
        ]
        assert out.count() == 0


class TestClusterAssign:
    def test_singletons_and_sizes(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
        pairs = spark.createDataFrame(
            [(1, 2), (2, 4)], "id_a long, id_b long"
        )
        got = {
            r["doc_id"]: (r["cluster_id"], r["cluster_size"])
            for r in cluster_assign(docs, pairs).collect()
        }
        assert got == {
            0: (0, 1),
            1: (1, 3),
            2: (1, 3),
            3: (3, 1),
            4: (1, 3),
            5: (5, 1),
        }


class TestDistributedPath:
    """The driver union-find gate covers every small unit graph; force the
    distributed pointer-jumping loop by zeroing the gate so both paths
    stay verified against the same reference."""

    @pytest.fixture(autouse=True)
    def _force_distributed(self, monkeypatch):
        from dynamicqueryengine_spark.functions import cluster as C

        monkeypatch.setattr(C, "DRIVER_CC_MAX_EDGES", 0)

    @pytest.mark.parametrize(
        "edges",
        [
            [(1, 2), (2, 3), (3, 4)],
            [(1, 2), (5, 6), (8, 9), (9, 5)],
            [(10, 1), (2, 10), (7, 3)],
            [(i, i + 1) for i in range(30)],  # chain: pointer jumping
        ],
    )
    def test_matches_union_find(self, spark, edges):
        pairs = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r["id"]: r["component"]
            for r in connected_components(pairs, max_iter=40).collect()
        }
        ids = sorted({x for e in edges for x in e})
        assert got == _union_find(ids, edges)
