"""PageRank semantics (functions/pagerank.py) on hand-built graphs:
symmetry, conservation, and centrality ordering."""

from __future__ import annotations

import pytest


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _run(spark, edges, **kw):
    from dynamicqueryengine_spark.functions.pagerank import pagerank

    return {
        r["node"]: r["rank"] for r in pagerank(_pairs(spark, edges), **kw).collect()
    }


def test_ring_is_uniform(spark):
    # 4-cycle: perfect symmetry -> equal ranks, summing to 1
    ranks = _run(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert len(ranks) == 4
    for v in ranks.values():
        assert v == pytest.approx(0.25, rel=1e-9)
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-9)


def test_star_center_dominates(spark):
    # star: center 0 linked to 1..5 -> center rank strictly highest,
    # leaves all equal
    ranks = _run(spark, [(0, i) for i in range(1, 6)])
    assert ranks[0] > max(v for k, v in ranks.items() if k != 0) * 2
    leaves = [v for k, v in ranks.items() if k != 0]
    assert max(leaves) == pytest.approx(min(leaves), rel=1e-12)
    # symmetrized graph has no dangling nodes -> total mass conserved
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-9)


def test_two_components_split_mass(spark):
    # a 2-clique and a 3-clique; per-node rank inside each component is
    # uniform (vertex-transitive), so mass splits 2/5 vs 3/5
    ranks = _run(spark, [(0, 1), (10, 11), (11, 12), (10, 12)])
    assert ranks[0] == pytest.approx(ranks[1], rel=1e-12)
    assert ranks[10] == pytest.approx(ranks[11], rel=1e-12)
    assert ranks[0] == pytest.approx(1 / 5, rel=1e-9)
    assert ranks[10] == pytest.approx(1 / 5, rel=1e-9)


def test_empty_graph(spark):
    assert _run(spark, []) == {}


EDGES = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 4)]


def test_driver_route_equals_distributed_exactly(spark):
    # the OPT-IN driver fast path must match the distributed join/agg
    # loop (same decimal-quantized contributions, Decimal(repr(c)) =
    # Spark's shortest-repr double→decimal cast). The default route is
    # distributed at every size — the driver loop needs the explicit gate.
    fast = _run(spark, EDGES, iterations=5, driver_max_edges=500_000)
    dist = _run(spark, EDGES, iterations=5)  # default: distributed
    assert fast == dist


def test_default_route_is_distributed(spark):
    # driver_max_edges defaults to 0: even a tiny graph must go through
    # the join/agg loop (lazy plan, no eager count/collect on call).
    # Note the CONTRACT QUERY opts into the driver gate at bench SF
    # (r14), so the bench's coverage of the distributed route comes
    # from bench.py's code-frozen gate-off probe
    # (_distributed_route_probe_seconds), not from the contract query.
    from dynamicqueryengine_spark.functions.pagerank import pagerank

    out = pagerank(_pairs(spark, EDGES), iterations=3)
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" in plan, "default pagerank route must be the join/agg loop"


def test_checkpoint_preserves_ranks_exactly(spark):
    # lineage truncation must be value-invariant: bit-identical ranks
    # with and without checkpointing at several cadences (distributed
    # route forced — the driver route never builds iteration lineage)
    base = _run(
        spark, EDGES, iterations=7, checkpoint_every=None, driver_max_edges=0
    )
    for every in (1, 2, 3):
        assert base == _run(
            spark,
            EDGES,
            iterations=7,
            checkpoint_every=every,
            driver_max_edges=0,
        )


def test_checkpoint_bounds_plan_depth(spark):
    # T=20 with the default cadence must complete AND return a plan whose
    # lineage is truncated at the last checkpoint (t=15): only 5
    # iterations of joins remain. Measured: ~16 Join nodes per remaining
    # iteration (edges/nodes lineage re-expands at every reference), so
    # the truncated plan holds ~80 while an uncheckpointed T=8 already
    # carries ~136 — pin "5 iterations' worth", not the raw constant.
    from dynamicqueryengine_spark.functions.pagerank import pagerank

    out = pagerank(
        _pairs(spark, EDGES),
        iterations=20,
        checkpoint_every=5,
        driver_max_edges=0,
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Join") <= 90, "lineage not truncated at checkpoint"
    ranks = {r["node"]: r["rank"] for r in out.collect()}
    assert sum(ranks.values()) == pytest.approx(1.0, rel=1e-9)
