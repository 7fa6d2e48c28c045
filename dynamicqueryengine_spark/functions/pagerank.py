"""Fixed-iteration PageRank over an edge list — the iterative-graph
pattern (power iteration) expressed as plain DataFrame joins/aggregates,
with every per-iteration float sum made engine-exact so the whole
T-iteration computation is value-oracle-checkable in DuckDB.

Used for authority scoring over document-similarity graphs (the
near-dup pair lists from functions/dedup.py) — "which documents sit at
the center of a duplicate cluster" is the canonical keep-the-canonical
signal after near-dup detection.

Numeric parity: rank_{t+1}(v) = (1-d)/N + d·Σ_{u→v} rank_t(u)/outdeg(u).
The Σ is a shuffle-order-dependent double sum, so each contribution is
cast to DECIMAL(38,12) per row and summed exactly (the repo-wide
decimal-sum discipline); the (1-d)/N + d·s combination is one shared
IEEE formula. Both engines therefore produce bit-identical ranks at
every iteration, and after T of them.

Plan shape at scale: per iteration, ONE join of the edge list against
the N-row rank table (both keyed by node — co-partitioned across
iterations) and ONE aggregation onto N rows. State never exceeds
O(nodes + edges); T is fixed. Lineage is cut with an eager
``localCheckpoint`` every ``checkpoint_every`` iterations (default 5 —
inactive for the contract query's T=5, active for any deeper run), so
the lazy plan depth is bounded regardless of T. The final ranks are
materialized inside the function so the edge/node caches can be
released before returning (no storage leak across a long session —
the repo-wide persist/unpersist discipline).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import DoubleType, StructField, StructType

__all__ = ["pagerank", "pagerank_sql"]

_DEC = "decimal(38,12)"

# Driver fast path gate: below this many symmetrized edges the whole
# graph is driver-resident state anyway (the rank table and edge list both
# fit trivially, ≈16 MB collected at the gate), and the T×(join+agg)
# stage overhead of the distributed loop dominates wall time ~100:1
# (measured at sf0.1: 4.8–6.3 s distributed vs 1.8 s gated for a
# 512-edge graph — the distributed plan carries ~15 tiny exchanges).
# Same measured-gate philosophy as functions/cluster.py's union-find
# (DRIVER_CC_MAX_EDGES) and the dense-jaccard tile: data ONE round
# would broadcast anyway is cheaper to finish on the driver; bigger
# graphs take the distributed pointer-free power iteration unchanged.
# Both routes produce bit-identical ranks (the driver loop quantizes
# contributions to DECIMAL(38,12) HALF_UP exactly like the engine;
# tests/test_pagerank.py pins the equivalence), so the gate is a pure
# execution-route choice, never a semantic one. The gated route makes
# pagerank() eager (one limit-collect job on call); driver_max_edges=0
# keeps the fully-lazy distributed path.
DRIVER_PAGERANK_MAX_EDGES = 500_000


def _pagerank_driver(spark, rows, node_type, damping, iterations):
    """Exact driver-side twin of the distributed loop: contributions are
    double divisions quantized to DECIMAL(38,12) HALF_UP, summed exactly,
    cast back to double for the shared IEEE combine. Spark's
    double→decimal cast goes through BigDecimal.valueOf(double) — the
    SHORTEST decimal representation (Python ``repr``), not the exact
    binary expansion — so the quantize input is ``Decimal(repr(c))``;
    ``Decimal(c)`` could round the 12th digit differently when the exact
    expansion and the shortest repr straddle a half-way point."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    twelve = Decimal("1e-12")
    outdeg: dict = defaultdict(int)
    for src, dst in rows:
        outdeg[src] += 1
    nodes = sorted(outdeg)
    n = len(nodes)
    schema = StructType(
        [
            StructField("node", node_type, True),
            StructField("rank", DoubleType(), True),
        ]
    )
    if n == 0:
        return spark.createDataFrame([], schema)
    base = (1.0 - damping) / float(n)
    ranks = {v: 1.0 / float(n) for v in nodes}
    for _ in range(iterations):
        sums: dict = defaultdict(lambda: Decimal(0))
        for src, dst in rows:
            c = ranks[src] / float(outdeg[src])
            sums[dst] += Decimal(repr(c)).quantize(twelve, rounding=ROUND_HALF_UP)
        ranks = {
            v: base + damping * (float(sums[v]) if v in sums else 0.0)
            for v in nodes
        }
    return spark.createDataFrame(
        [(v, ranks[v]) for v in nodes], schema
    )


def pagerank(
    pairs: DataFrame,
    damping: float = 0.85,
    iterations: int = 5,
    a_col: str = "id_a",
    b_col: str = "id_b",
    checkpoint_every: int | None = 5,
    driver_max_edges: int = 0,
) -> DataFrame:
    """(node, rank) after ``iterations`` power steps over the UNDIRECTED
    graph given as (a_col, b_col) pairs (symmetrized internally, so every
    node has outdeg ≥ 1 — no dangling-mass term needed).

    ``checkpoint_every``: eager ``localCheckpoint`` cadence that truncates
    the per-iteration join lineage (a T-deep lazy plan otherwise grows
    unboundedly — analyzer/optimizer time alone goes superlinear past
    ~10 joins). ``None`` disables (identical ranks either way — the
    checkpoint only cuts lineage, it never changes values).

    ``driver_max_edges`` opts INTO the exact driver fast path for tiny
    graphs (default 0 = always distributed — the 100 TB design, and the
    route benchmarks measure); both routes produce matching ranks
    (tests/test_pagerank.py pins the equivalence)."""
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
    )
    if driver_max_edges > 0:
        # ONE gate job (r14): a limit(max+1) collect both sizes the edge
        # list and fetches it — the separate count() the gate used to pay
        # was a full second pass over the symmetrized-distinct stream.
        # Oversized graphs spill past the limit and fall through to the
        # distributed loop having collected at most max+1 rows (~16 MB).
        probe = edges.limit(driver_max_edges + 1).collect()
        if len(probe) <= driver_max_edges:
            rows = [(r[0], r[1]) for r in probe]  # gate-bounded
            return _pagerank_driver(
                edges.sparkSession,
                rows,
                edges.schema["src"].dataType,
                damping,
                iterations,
            )
        # fall-through: release the collected probe (up to max+1 Row
        # objects, well beyond the raw bytes once per-Row Python
        # overhead counts) before the iterative rounds (r15, ADVICE r14)
        del probe
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
    edges = edges.join(outdeg, "src").persist()
    nodes = edges.select(F.col("src").alias("node")).distinct().persist()
    n = nodes.count()  # bounded scalar (graph node count), like the
    # centroid-seed collects — not a corpus-sized materialization
    if n == 0:
        edges.unpersist()
        return nodes.select("node", F.lit(0.0).alias("rank"))
    base = (1.0 - damping) / float(n)
    ranks = nodes.select("node", F.lit(1.0 / float(n)).alias("rank"))
    for t in range(1, iterations + 1):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .select(
                "dst",
                (F.col("rank") / F.col("outdeg").cast("double")).alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum(F.col("c").cast(_DEC)).cast("double").alias("s"))
        )
        ranks = nodes.join(
            contrib, nodes["node"] == contrib["dst"], "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("s"), F.lit(0.0))
            ).alias("rank"),
        )
        if checkpoint_every and t % checkpoint_every == 0 and t < iterations:
            # eager: executes the prefix NOW and replaces the lineage
            # with the materialized N-row result — bounded plan depth
            ranks = ranks.localCheckpoint(eager=True)
    # materialize the final ranks while the edge/node caches are hot,
    # then RELEASE those caches — the returned frame no longer needs
    # them (recomputable from the cached ranks on eviction only)
    ranks = ranks.persist()
    ranks.count()
    edges.unpersist()
    nodes.unpersist()
    return ranks


def pagerank_sql(
    pairs_sql: str,
    damping: float = 0.85,
    iterations: int = 5,
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> str:
    """DuckDB mirror of :func:`pagerank`: same symmetrized edges, same
    decimal-exact contribution sums, same shared double formula, T
    unrolled iteration CTEs. ``pairs_sql`` selects the (a_col, b_col)
    pair list."""
    d = repr(float(damping))
    iters = []
    prev = "r0"
    for t in range(1, iterations + 1):
        iters.append(
            f"""r{t} AS (
  SELECT n.node,
         (1.0 - {d}) / nn.n + {d} * coalesce(s.s, 0.0) AS rank
  FROM nodes n CROSS JOIN ncount nn
  LEFT JOIN (
    SELECT e.dst,
           CAST(sum(CAST(r.rank / CAST(e.outdeg AS DOUBLE)
                         AS DECIMAL(38,12))) AS DOUBLE) AS s
    FROM edges e JOIN {prev} r ON r.node = e.src
    GROUP BY e.dst
  ) s ON s.dst = n.node
)"""
        )
        prev = f"r{t}"
    chain = ",\n".join(iters)
    return f"""
WITH pairs AS ({pairs_sql}),
sym AS (
  SELECT {a_col} AS src, {b_col} AS dst FROM pairs
  UNION
  SELECT {b_col} AS src, {a_col} AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS outdeg FROM sym GROUP BY 1),
edges AS (SELECT sym.src, sym.dst, deg.outdeg FROM sym JOIN deg USING (src)),
nodes AS (SELECT DISTINCT src AS node FROM sym),
ncount AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS (
  SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN ncount nn
),
{chain}
SELECT node, rank FROM {prev}
""".strip()
