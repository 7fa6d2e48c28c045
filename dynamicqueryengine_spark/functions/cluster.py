"""Connected components over a pair graph — the transitive-closure step
that turns near-duplicate PAIRS into duplicate CLUSTERS (pair emission
alone under-merges: a~b and b~c must collapse a,b,c to one exemplar).

Implementation: distributed min-label propagation with pointer jumping.
Every node starts labeled with its own id; each round every node takes
the min of its own and its neighbors' labels (one edge join + min
aggregate), then adopts its label's OWN label (a second self-join — the
pointer-jumping step of Shiloach-Vishkin). Plain propagation needs
O(diameter) rounds; pointer jumping halves the remaining chain depth
every round, so convergence is O(log n) even on pathological chains,
and 2-3 rounds on the dense quasi-cliques real near-dup graphs form.
Each round shuffles the EDGE list and label table only — no full-corpus
state — and ends in ``localCheckpoint`` to truncate lineage: without
it the logical plan nests every prior round and the driver OOMs
compiling round ~20 (observed). The same primitives extend to the
large-star/small-star contraction of Kiveris et al., "Connected
Components in MapReduce and Beyond" (SoCC'14) if edge-list contraction
is ever needed at 100 TB; label-only state suffices for dedup graphs.

The whole computation is SQL-expressible (DuckDB ``WITH RECURSIVE``
reachability + min-aggregate), so cluster assignments get a full value
oracle rather than a rows-only check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "cluster_assign"]

# Edge-count gate for the driver union-find fast path (≈16 MB collected).
# Tests pin both paths by patching this to 0.
DRIVER_CC_MAX_EDGES = 1_000_000


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 20,
) -> DataFrame:
    """(id, component) for every node appearing in ``pairs``; component =
    min node id reachable through the undirected pair graph."""
    base = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .persist()
    )
    # Driver fast path: below ~1M edges the graph fits in MBs and a
    # union-find computes min-label components in microseconds, where the
    # iterative plan pays ~8 scheduled jobs of pure latency (measured
    # ~3 s for 256 edges at sf0.1). Same gating philosophy as the dense-
    # jaccard tile: the data a SINGLE round would broadcast anyway is
    # cheaper to finish on the driver; bigger graphs take the distributed
    # pointer-jumping path unchanged. ONE gate job (r14): limit(max+1)
    # sizes AND fetches the edge list in a single pass — the separate
    # count() the gate used to pay re-ran the symmetrize+distinct
    # stream; oversized graphs spill past the limit having collected at
    # most max+1 rows (~16 MB) and fall through.
    probe = base.limit(DRIVER_CC_MAX_EDGES + 1).collect()
    if len(probe) <= DRIVER_CC_MAX_EDGES:
        parent: dict = {}

        def find(x):
            r = x
            while parent.get(r, r) != r:
                r = parent[r]
            while parent.get(x, x) != x:  # path compression
                parent[x], x = r, parent[x]
            return r

        rows = [(r[0], r[1]) for r in probe]
        base.unpersist()
        for s, d in rows:
            parent.setdefault(s, s)
            parent.setdefault(d, d)
            rs, rd = find(s), find(d)
            if rs != rd:
                parent[rs] = rd
        comp_min: dict = {}
        for node in parent:
            r = find(node)
            comp_min[r] = min(comp_min.get(r, node), node)
        labels = [(node, comp_min[find(node)]) for node in parent]
        # Derive the output schema from the (union-reconciled) id type so
        # the driver path and the distributed path — which inherits types
        # from the input via least(src, dst) — agree for non-long ids.
        from pyspark.sql.types import StructField, StructType

        id_type = base.schema["src"].dataType
        return pairs.sparkSession.createDataFrame(
            labels or [],
            StructType(
                [
                    StructField("id", id_type),
                    StructField("component", id_type),
                ]
            ),
        )
    # Fall-through: release the collected probe (up to 1,000,001 Row
    # objects — far more driver heap than the raw ~16 MB once per-Row
    # Python overhead is counted) BEFORE the iterative rounds start,
    # instead of holding it live for the whole distributed computation
    # (r15, ADVICE r14).
    del probe
    # Size-aware parallelism for the distributed path: iterative rounds
    # pay fixed cost per task — one partition per ~2M edges (the label
    # table is ≤ the edge table), bounded by the session's parallelism.
    # The count here is the at-scale path only (past the 1M-edge gate),
    # where one extra pass over the edge list is noise.
    n_edges = base.count()
    parts = max(1, min(base.sparkSession.sparkContext.defaultParallelism,
                       n_edges // 2_000_000 + 1))
    edges = base.repartition(parts, "dst").localCheckpoint()
    base.unpersist()
    # Seed every node at min(self, direct neighbors) — one propagation
    # round folded into initialization as a single agg over the edge list
    # (no join): the edge table carries both directions, so grouping by
    # src covers every node and min(dst) is the true neighbor minimum.
    # Dense quasi-cliques (the shape real near-dup graphs take) converge
    # at the seed; the loop then only pays for verification.
    labels = (
        edges.groupBy("src")
        .agg(F.min("dst").alias("_m"))
        .select(
            F.col("src").alias("id"),
            F.least("src", "_m").alias("component"),
        )
        .repartition(parts, "id")
        .localCheckpoint()
    )

    for it in range(max_iter):
        nbr = (
            edges.join(labels, edges.dst == labels.id)
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        stepped = labels.join(nbr, labels.id == nbr.src, "left").select(
            labels.id.alias("id"),
            F.least(
                "component", F.coalesce("nbr_component", "component")
            ).alias("component"),
        )
        # Pointer jump: component values are themselves node ids, so every
        # row finds its label's current label — chain depth halves per round.
        parents = stepped.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_component")
        )
        new_labels = (
            stepped.join(parents, stepped.component == parents.p_id)
            .select("id", F.least("component", "p_component").alias("component"))
            .localCheckpoint()
        )
        prev, labels = labels, new_labels
        # Convergence check every OTHER round: the equality count is a
        # join+count job costing as much as a propagation round, so at the
        # small-graph per-job floor halving the checks beats detecting
        # convergence one round earlier. (Seeded labels make round 1 a
        # no-op on clique-shaped graphs, so the first check fires at it=1.)
        if it % 2 == 0:
            continue
        changed = (
            labels.alias("n")
            .join(prev.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        if changed == 0:
            break
    return labels


def cluster_assign(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Every document with its duplicate-cluster exemplar and cluster
    size: (id, cluster_id, cluster_size). Docs in no pair are singleton
    clusters of themselves. The final attach is a PLAIN left join: the
    components table holds every doc that appears in any near-dup pair,
    which on web-scale corpora is 30-50%% of the corpus — forcing a
    broadcast there OOMs every executor exactly when dedup matters most.
    AQE turns the join into a broadcast at runtime whenever the measured
    size actually fits, so the clean-corpus case still skips the shuffle
    without hard-coding the catastrophic one."""
    comp = connected_components(pairs, id_a, id_b)
    sizes = comp.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    comp_sized = comp.join(sizes, "component").select(
        F.col("id").alias(id_col),
        F.col("component").alias("cluster_id"),
        "cluster_size",
    )
    return docs.select(id_col).join(
        comp_sized, id_col, "left"
    ).select(
        id_col,
        F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id"),
        F.coalesce("cluster_size", F.lit(1)).alias("cluster_size"),
    )


def cluster_assign_sql(pairs_sql: str, docs_table: str = "documents",
                       id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`cluster_assign`: WITH RECURSIVE
    reachability over the undirected pair graph, component = min reachable
    id. Exact on any graph; quadratic in component size, which is the
    usual oracle trade (naive but certain)."""
    return f"""
WITH RECURSIVE pairs AS ({pairs_sql}),
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION
  SELECT id_b AS src, id_a AS dst FROM pairs
),
reach(id, r) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.src, rc.r FROM edges e JOIN reach rc ON rc.id = e.dst
),
comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
sized AS (
  SELECT c.id, c.cluster_id, s.cluster_size
  FROM comp c JOIN (
    SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY 1
  ) s USING (cluster_id)
)
SELECT d.{id_col},
       COALESCE(sized.cluster_id, d.{id_col}) AS cluster_id,
       COALESCE(sized.cluster_size, 1) AS cluster_size
FROM {docs_table} d LEFT JOIN sized ON d.{id_col} = sized.id
""".strip()
