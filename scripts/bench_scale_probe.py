#!/usr/bin/env python
"""Scale-linearity probe (r5): run three representative plan shapes —
hash aggregation, per-key window, and the DAU/WAU explode-equi-join —
over the sf0.1 events table replicated ×1/×2/×4/×8 (ids and timestamps
shifted so key cardinalities scale with the data), and report wall
time per scale. A plan that survives 100× shows ~linear growth here;
a quadratic or nested-loop shape shows immediately.

Prints one JSON line: {"rows": {...}, "<probe>": {"x1": s, ...}}.
Numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window, functions as F  # noqa: E402

from dynamicqueryengine_spark import get_spark  # noqa: E402
from dynamicqueryengine_spark.sources.registry import load_table  # noqa: E402

_DEC = "decimal(38,12)"
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default ×8..×64: below ~1M rows the per-stage fixed overhead (~0.2 s
# on local[32]) swamps compute and every probe reads flat
SCALES = tuple(
    int(x) for x in os.environ.get("SCALE_PROBE", "8,16,32,64").split(",")
)


def scaled(events: DataFrame, k: int) -> DataFrame:
    """k shifted copies: user/event ids offset per copy (cardinalities
    scale), timestamps shifted by copy index days (the day range grows,
    so per-day state scales too)."""
    parts = []
    for i in range(k):
        parts.append(
            events.select(
                (F.col("event_id") + F.lit(i) * 10_000_000).alias("event_id"),
                (F.col("user_id") + F.lit(i) * 1_000_000).alias("user_id"),
                (F.col("ts") + F.expr(f"INTERVAL {i} DAYS")).alias("ts"),
                "event_type",
                "value",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def probe_hash_agg(df: DataFrame) -> int:
    return (
        df.groupBy("event_type", F.hour("ts").alias("h"))
        .agg(F.sum(F.col("value").cast(_DEC)).alias("s"))
        .count()
    )


def probe_window(df: DataFrame) -> int:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        df.select("user_id", F.lead("event_type").over(w).alias("nxt"))
        .filter(F.col("nxt").isNotNull())
        .count()
    )


def probe_dau_wau(df: DataFrame) -> int:
    du = df.select(
        F.date_trunc("day", F.col("ts")).alias("day"), "user_id"
    ).distinct()
    days = du.select("day").distinct()
    cover = du.select(
        F.explode(
            F.sequence(F.to_date("day"), F.date_add(F.to_date("day"), 6))
        ).alias("d"),
        "user_id",
    ).select(F.col("d").cast("timestamp").alias("day"), "user_id")
    return (
        cover.join(F.broadcast(days), "day")
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("wau"))
        .count()
    )


def scaled_docs(docs: DataFrame, k: int) -> DataFrame:
    """k copies of the documents table modeling a GROWING corpus: copy 0
    is the original; copy i shifts doc_ids and applies a rot-i alphabet
    SUBSTITUTION CIPHER to the text — a bijection, so every copy's
    internal near-dup structure is exactly the original's, while the
    CHARACTER-level k-gram shingles dedup hashes are disjoint across
    copies (token-suffix salting is not enough: char-5 shingles barely
    change, and naive replication makes everything a duplicate of
    everything, inflating candidates quadratically and measuring the
    dup explosion instead of the index)."""
    alpha = "abcdefghijklmnopqrstuvwxyz"
    parts = []
    for i in range(k):
        rot = alpha[i % 26 :] + alpha[: i % 26]
        text = (
            F.col("text")
            if i == 0
            else F.translate(F.lower(F.col("text")), alpha, rot)
        )
        parts.append(
            docs.select(
                (F.col("doc_id") + F.lit(i) * 10_000_000).alias("doc_id"),
                text.alias("text"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def incremental_index_probe(spark) -> dict:
    """Incremental-vs-full dedup cost as the ACCUMULATED corpus grows
    with a FIXED delta (today's crawl): the incremental path signs only
    the delta and probes the persisted base signatures, so its cost
    should stay near-flat while the full path re-signs everything and
    grows linearly. The base signature build is excluded from the
    incremental timing — it is the persisted index, paid once at
    ingestion. Run via ``--incremental``; numbers go to SCALE.md."""
    from dynamicqueryengine_spark.functions import dedup as D

    docs0 = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    delta = docs0.filter(F.col("doc_id") % 4 == 0).persist()
    n_delta = delta.count()
    out: dict = {"delta_docs": n_delta, "base_docs": {},
                 "incremental_s": {}, "full_s": {}}
    for k in (4, 8, 16):
        base = scaled_docs(docs0, k).filter(F.col("doc_id") % 4 != 0).persist()
        out["base_docs"][f"x{k}"] = base.count()
        all_docs = base.unionByName(delta)
        base_sigs = D.minhash_signatures(base).persist()
        base_sigs.count()  # the persisted index — built at ingestion

        def t_inc():
            t0 = time.perf_counter()
            D.minhash_lsh_pairs_delta(
                all_docs, base_sigs, delta, k=5, threshold=0.7
            ).count()
            dt = time.perf_counter() - t0
            # drop the miner's internal survivor/hash-set caches between
            # passes — the min-of-2 loop otherwise accumulates them for
            # the process lifetime (r7 advisor finding)
            D.release_internal_caches()
            return dt

        def t_full():
            t0 = time.perf_counter()
            D.minhash_lsh_pairs(all_docs, k=5, threshold=0.7).count()
            dt = time.perf_counter() - t0
            D.release_internal_caches()
            return dt

        # warm pass first (python-worker spawn, codegen), then min-of-2
        t_inc(), t_full()
        out["incremental_s"][f"x{k}"] = round(min(t_inc(), t_inc()), 2)
        out["full_s"][f"x{k}"] = round(min(t_full(), t_full()), 2)
        base_sigs.unpersist()
        base.unpersist()
    return out


def main() -> None:
    spark = get_spark(
        "scale-probe",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if "--incremental" in sys.argv:
        print(json.dumps(incremental_index_probe(spark)))
        spark.stop()
        return
    events = load_table(spark, SF_DIR, "events")
    results: dict = {"rows": {}}
    probes = {
        "hash_agg": probe_hash_agg,
        "window_lead": probe_window,
        "dau_wau_explode": probe_dau_wau,
    }
    for k in SCALES:
        df = scaled(events, k).persist()
        results["rows"][f"x{k}"] = df.count()  # materialize the input once
        for name, fn in probes.items():
            fn(df)  # warm (codegen)
            t0 = time.perf_counter()
            fn(df)
            results.setdefault(name, {})[f"x{k}"] = round(
                time.perf_counter() - t0, 2
            )
        df.unpersist()
    print(json.dumps(results))
    spark.stop()


if __name__ == "__main__":
    main()
