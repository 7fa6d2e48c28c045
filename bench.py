#!/usr/bin/env python
"""Benchmark harness: runs every declared query from __spark_entry__ at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:

    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}

Each query is forced with ``df.count()`` (full pipeline execution, no
driver-side materialization cost). A warmup pass primes the JVM/codegen and
OS page cache so the timed pass measures engine throughput, not startup.
"""

from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import __spark_entry__ as entry_mod  # noqa: E402
from dynamicqueryengine_spark import get_spark  # noqa: E402


def _shuffle_probe_seconds(spark) -> float:
    """CODE-FROZEN shuffle-class calibration probe (r13 verdict ask #5:
    the three scan/Arrow probes read flat while the shuffle/memory-bound
    pair-mining family swung 3× under tenancy — contention on shuffle
    and memory bandwidth is invisible to scan thermometers). Fixed-size
    synthetic self-equijoin in the banded pair-mining shape: 4M rows,
    ~10 per key, sort-merge-hinted so the plan always shuffles both
    sides, ~18M joined pairs compared and aggregated. Data derives from
    ``spark.range`` so the probe is identical at every SF and immune to
    testdata regeneration. DO NOT EDIT — its cross-round comparability
    is the point."""
    from pyspark.sql import functions as F

    start = time.perf_counter()
    n, k = 4_000_000, 400_009
    base = spark.range(n).select(
        (F.col("id") % k).alias("k"),
        F.col("id").alias("a"),
        F.md5(F.col("id").cast("string")).alias("h"),
    )
    (
        base.alias("l")
        .hint("merge")
        .join(base.alias("r"), "k")
        .filter(F.col("l.a") < F.col("r.a"))
        .select(
            F.when(F.col("l.h") < F.col("r.h"), 1)
            .otherwise(0)
            .alias("c")
        )
        .agg(F.sum("c").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    )
    return time.perf_counter() - start


def _distributed_route_probe_seconds(spark) -> dict:
    """CODE-FROZEN distributed graph-route probe (r14 verdict ask #2):
    at bench SF every pair-mining contract query resolves to a driver
    fast path (union-find CC gate since r9, DRIVER_PAGERANK_MAX_EDGES
    since r14, the dense jaccard tile), so no bench number exercised
    the distributed power-iteration / pointer-jumping plans — a
    regression in the 100 TB graph routes was invisible. This probe
    runs BOTH distributed routes with their driver gates forced OFF
    over a fixed synthetic graph derived from ``spark.range`` (60k
    nodes in 16-node chain components plus deterministic star links
    inside each 64-node group — bounded diameter, so the probe times
    the per-round distributed machinery, not a pathological round
    count), identical at every SF and immune to testdata regeneration.
    DO NOT EDIT — cross-round comparability is the point. Returns
    {"pagerank": sec, "cc": sec} for one timed run."""
    from pyspark.sql import functions as F

    from dynamicqueryengine_spark.functions import cluster as _cluster
    from dynamicqueryengine_spark.functions.pagerank import pagerank

    n = 60_000
    base = spark.range(n)
    chains = base.filter((F.col("id") + 1) % 16 != 0).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    stars = base.filter(F.col("id") % 64 != 0).select(
        (F.col("id") - F.col("id") % 64).alias("id_a"),
        F.col("id").alias("id_b"),
    )
    pairs = chains.unionByName(stars)

    out: dict = {}
    start = time.perf_counter()
    pagerank(pairs, iterations=5, driver_max_edges=0).count()
    out["pagerank"] = round(time.perf_counter() - start, 4)

    gate = _cluster.DRIVER_CC_MAX_EDGES
    _cluster.DRIVER_CC_MAX_EDGES = 0  # force the pointer-jumping route
    try:
        start = time.perf_counter()
        _cluster.connected_components(pairs).count()
        out["cc"] = round(time.perf_counter() - start, 4)
    finally:
        _cluster.DRIVER_CC_MAX_EDGES = gate
    return out


def main() -> None:
    run_started = time.time()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    # the result JSON must be the SOLE stdout line (the driver's parser
    # reads a bounded tail of combined output — r2's total had to be
    # reconstructed after progress noise pushed the JSON head out of its
    # window): no console progress bar, everything else to stderr.
    spark = get_spark(
        "dqe-bench",
        cpus=cpus,
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries = entry_mod.queries()

    def scrub() -> None:
        """Release cross-query state: clearCache drops persisted plans, but
        broadcasts, localCheckpoint RDDs, and temp shuffle files are only
        reclaimed by the ContextCleaner AFTER their Python-side DataFrames
        are garbage-collected (py4j holds JVM refs until then). Without the
        explicit gc + JVM gc, ~150 query executions accumulate into heap
        pressure that inflates every later timing ~2×.

        The cross-query mined-pair memo (workloads/llm.py _PAIR_MEMO) is
        also cleared: it is a legitimate shared-computation optimization
        for production sessions, but inside the timing protocol it would
        let the memo-fed graph/dedup queries skip the mining work they
        semantically perform — every timed query must pay its own cost."""
        from dynamicqueryengine_spark.workloads import llm as _llm

        _llm._PAIR_MEMO.clear()
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()

    # warmup: prime codegen + page cache (untimed).
    for name, fn in queries.items():
        try:
            fn(spark, sf_dir).count()
        except Exception as exc:  # pragma: no cover - surfaced in timed pass
            print(f"warmup {name} failed: {exc}", file=sys.stderr)
        scrub()

    # Two timed passes, min per query: single-shot timings on this box
    # swing ±2-4× (full-GC scrub + shared tenancy); the min of two
    # scrubbed runs is a stable steady-state measure and costs one extra
    # pass over an already-warm session. BOTH the pass-1 (single-pass)
    # total and the min-of-2 total are emitted, with the protocol named
    # explicitly ("passes"/"stat"), so round-over-round comparisons never
    # depend on knowing which protocol a given round used.
    from dynamicqueryengine_spark.streaming.rules import STREAM_PROGRESS

    per_pass: list[dict[str, float]] = [{}, {}]
    stream_compute: dict[str, float] = {}
    for p in range(2):
        for name, fn in queries.items():
            scrub()  # measure the engine, not the previous query's garbage
            STREAM_PROGRESS.clear()
            start = time.perf_counter()
            try:
                fn(spark, sf_dir).count()
                per_pass[p][name] = round(time.perf_counter() - start, 4)
            except Exception as exc:
                print(f"query {name} failed: {exc}", file=sys.stderr)
                per_pass[p][name] = -1.0
                continue
            if STREAM_PROGRESS:
                # compute-only time for streaming queries: the engine's own
                # per-microbatch triggerExecution total, excluding stream
                # planning / sink setup / await polling — the overhead that
                # amortizes away on a real unbounded stream.
                compute = round(
                    sum(v["compute_ms"] for v in STREAM_PROGRESS.values())
                    / 1000.0,
                    4,
                )
                prev = stream_compute.get(name)
                stream_compute[name] = (
                    compute if prev is None else min(prev, compute)
                )

    timings = {
        name: (
            min(t for t in (per_pass[0][name], per_pass[1][name]) if t >= 0)
            if max(per_pass[0][name], per_pass[1][name]) >= 0
            else -1.0
        )
        for name in per_pass[0]
    }
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    total_single = round(sum(t for t in per_pass[0].values() if t >= 0), 4)

    # ---- tenancy calibration (r13, judge ask #4) ----------------------
    # Three probes whose CODE has been untouched since r7 (pure JVM
    # scan-agg, broadcast join, Arrow decode) act as a host thermometer:
    # their quiet-host min-of-2 reference values are pinned below (the
    # cross-round minima from BENCH_DETAIL_r11/r12, measured on an idle
    # box), so any run's host_factor = median(observed / reference)
    # separates shared-tenancy slowdown from code regressions —
    # structurally, instead of the per-round forensics r12 needed.
    # total_min2_normalized = total_min2 / host_factor is the
    # round-over-round comparable number.
    _CALIBRATION_REF = {
        "lineitem_stats": 0.22,
        "join_revenue_by_nation": 0.41,
        "multimodal_bmp_decode": 0.72,
    }
    probe_obs = {
        k: timings[k]
        for k in _CALIBRATION_REF
        if timings.get(k, -1.0) >= 0
    }
    ratios = sorted(
        probe_obs[k] / _CALIBRATION_REF[k] for k in probe_obs
    )
    host_factor = (
        round(ratios[len(ratios) // 2], 3) if ratios else None
    )
    # shuffle-class thermometer (r13 verdict ask #5): run the frozen
    # probe warmup + 2 timed (min), same scrub protocol as the queries.
    # Reference = idle-host min observed when the probe was pinned
    # (r14). A run where shuffle_factor diverges from host_factor is a
    # contended-host run on exactly the workload class the scan probes
    # cannot see — the per-class factors make that legible in the
    # artifact instead of needing per-round forensics.
    _SHUFFLE_REF = 2.36
    shuffle_runs: list[float] = []
    try:
        for i in range(3):
            scrub()
            t = _shuffle_probe_seconds(spark)
            if i > 0:  # first run pays codegen warmup
                shuffle_runs.append(round(t, 4))
    except Exception as exc:  # pragma: no cover - probe is best-effort
        print(f"shuffle probe failed: {exc}", file=sys.stderr)
    shuffle_obs = min(shuffle_runs) if shuffle_runs else None
    shuffle_factor = (
        round(shuffle_obs / _SHUFFLE_REF, 3) if shuffle_obs else None
    )
    # distributed graph-route probe (r15, r14 verdict ask #2): the
    # driver fast paths took the pagerank/CC contract queries off the
    # distributed plans at bench SF, so these two gate-off runs are the
    # ONLY per-round numbers covering the 100 TB power-iteration and
    # pointer-jumping routes. Same protocol as the shuffle probe: one
    # codegen-warmup run discarded, then 2 timed runs, min recorded.
    # References pinned r15 (min-of-2 on the r15 measurement host).
    _DISTRIBUTED_REF = {"pagerank": 2.44, "cc": 3.08}
    dist_runs: list[dict] = []
    try:
        for i in range(3):
            scrub()
            r = _distributed_route_probe_seconds(spark)
            if i > 0:  # first run pays codegen warmup
                dist_runs.append(r)
    except Exception as exc:  # pragma: no cover - probe is best-effort
        print(f"distributed route probe failed: {exc}", file=sys.stderr)
    dist_obs = (
        {k: min(r[k] for r in dist_runs) for k in _DISTRIBUTED_REF}
        if dist_runs
        else None
    )
    dist_factor = (
        round(
            sum(dist_obs[k] / _DISTRIBUTED_REF[k] for k in dist_obs)
            / len(dist_obs),
            3,
        )
        if dist_obs
        else None
    )
    calibration = {
        "probes": probe_obs,
        "reference": _CALIBRATION_REF,
        "host_factor": host_factor,
        "classes": {
            "scan_arrow": {
                "probes": probe_obs,
                "reference": _CALIBRATION_REF,
                "factor": host_factor,
            },
            "shuffle": {
                "probes": {"synthetic_pair_join": shuffle_obs},
                "runs": shuffle_runs,
                "reference": {"synthetic_pair_join": _SHUFFLE_REF},
                "factor": shuffle_factor,
            },
            "distributed_graph": {
                "probes": dist_obs,
                "runs": dist_runs,
                "reference": _DISTRIBUTED_REF,
                "factor": dist_factor,
            },
        },
        "total_min2_normalized": (
            round(total / host_factor, 4)
            if host_factor and host_factor > 0
            else None
        ),
    }
    # Field ORDER is part of the contract: the driver's capture keeps only
    # a bounded TAIL of the output line (r2-r4 all recorded parsed:null
    # because the headline totals sat at the HEAD and were truncated
    # away), so the big per-query map goes FIRST and every headline
    # scalar (totals, count, protocol, sf) goes LAST — inside any
    # reasonable tail window, making the artifact self-verifying.
    line = json.dumps(
        {
            "metric": "total_query_wall_clock",
            "queries": timings,
            "streaming_compute_sec": stream_compute,
            "unit": "sec",
            "passes": 2,
            "stat": "min",
            "calibration": calibration,
            "n_queries": len(queries),  # THE query count — docs cite this
            "total_single": total_single,
            "total_min2": total,
            "value": total,
            "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        }
    )
    print(line, flush=True)
    print(line, file=sys.stderr, flush=True)  # survives stdout truncation

    # Persist the COMPLETE per-query detail next to the driver artifact
    # (r9 verdict ask #7: the driver's bounded tail truncates the
    # per-query map, which made carried-query regression diffs
    # impossible two rounds running). Round number: explicit
    # $SPARK_GRAFT_ROUND when the caller provides it; otherwise 1 + the
    # highest existing BENCH_r{N}.json (the driver writes its artifact
    # AFTER this run, so the file lands as BENCH_DETAIL_r{N} for the
    # SAME round the driver is about to record). Re-runs within a round
    # NEVER overwrite prior detail (r10 advice + verdict ask #7: the
    # triplicate-tenancy runs were only disclosed in prose): every
    # invocation APPENDS its per-pass maps to the file's "runs" array,
    # so multi-run variance is auditable from the artifact alone. The
    # write is atomic (tmp + os.replace) so a crashed run can't tear it.
    import glob as _glob
    import re as _re

    here = os.path.dirname(os.path.abspath(__file__))
    rnd_env = os.environ.get("SPARK_GRAFT_ROUND")
    if rnd_env and rnd_env.isdigit():
        rnd = int(rnd_env)
    else:
        rounds = [
            int(m.group(1))
            for p in _glob.glob(os.path.join(here, "BENCH_r*.json"))
            if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
        ]
        rnd = (max(rounds) + 1) if rounds else 0
    this_run = {
        "started_unix": round(run_started, 1),
        "total_single": total_single,
        "total_min2": total,
        "calibration": calibration,
        "queries_pass1": per_pass[0],
        "queries_pass2": per_pass[1],
        "streaming_compute_sec": stream_compute,
    }
    detail_path = os.path.join(here, f"BENCH_DETAIL_r{rnd:02d}.json")
    prior_runs: list = []
    try:
        with open(detail_path) as f:
            prior_runs = json.load(f).get("runs", [])
    except (OSError, ValueError):
        prior_runs = []
    detail = {
        "round": rnd,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "n_queries": len(queries),
        "passes": 2,
        "stat": "min",
        # headline fields describe the LATEST run; "runs" carries every
        # run of this round in order, one entry per bench.py invocation
        "total_single": total_single,
        "total_min2": total,
        "calibration": calibration,
        "queries_min2": timings,
        "queries_pass1": per_pass[0],
        "queries_pass2": per_pass[1],
        "streaming_compute_sec": stream_compute,
        "runs": prior_runs + [this_run],
    }
    try:
        tmp = detail_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(detail, f, indent=1, sort_keys=True)
        os.replace(tmp, detail_path)
    except OSError as exc:  # pragma: no cover - detail is best-effort
        print(f"bench detail write failed: {exc}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
