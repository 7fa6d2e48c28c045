#!/usr/bin/env python
"""Skewed-join demonstration (r4 verdict stretch ask #9): measure the
same hot-key join three ways on a synthetic skewed fact table —

1. plain sort-merge join, AQE OFF  (the naive plan: one reducer gets
   the hot key's entire partition)
2. plain sort-merge join, AQE ON   (Spark's runtime skew-join split)
3. salted_join (operators/skew.py), AQE OFF (the manual lever for when
   both sides are big or AQE can't see the skew)

Fact: N rows, ``hot_frac`` of them on ONE key, remainder uniform over
``n_keys``. Dim: one row per key. Broadcast is disabled so the join
actually shuffles — at 100 TB the dim side of a genuinely skewed join
is rarely broadcastable, which is exactly when salting matters.

Prints one JSON line; numbers are recorded in SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from dynamicqueryengine_spark import get_spark  # noqa: E402
from dynamicqueryengine_spark.operators.skew import salted_join  # noqa: E402

N = int(os.environ.get("SKEW_N", 20_000_000))
N_KEYS = 1000
HOT_FRAC = 0.9


def build(spark):
    # deterministic skew: first 90% of ids land on key 0, rest uniform
    fact = spark.range(N).select(
        F.when(F.col("id") < int(N * HOT_FRAC), F.lit(0))
        .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
        .cast("long")
        .alias("k"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    dim = spark.range(N_KEYS).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("w")
    )
    return fact, dim


def timed(fn):
    start = time.perf_counter()
    out = fn()
    return out, round(time.perf_counter() - start, 2)


def run(
    spark,
    aqe: bool,
    salted: bool,
    skew_threshold_mb: int | None = None,
    validate: bool = False,
):
    spark.conf.set("spark.sql.adaptive.enabled", str(aqe).lower())
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(aqe).lower())
    if skew_threshold_mb is not None:
        # make AQE's runtime split FIRE at local scale: skew detection
        # reads COMPRESSED map-output sizes, and this synthetic hot
        # partition (288 MB raw, one repeated key) lz4-compresses well
        # under the 256 MB default threshold — so lower it. At 100 TB a
        # real hot partition is tens of GB even compressed and the
        # DEFAULT threshold catches it. (Separate finding, measured in
        # SCALE.md: when a SAME-KEY groupBy follows the join, the final
        # aggregate plans into the join stage and REQUIRES its hash
        # distribution, so the split never applies — that regime is
        # exactly where the manual salt is the only lever.)
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            f"{skew_threshold_mb}MB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            f"{max(skew_threshold_mb // 2, 1)}MB",
        )
    else:
        spark.conf.unset(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        )
        spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    fact, dim = build(spark)
    if salted:
        joined = salted_join(fact, dim, on=["k"], buckets=16)
    else:
        joined = fact.join(dim.hint("merge"), "k")
    # GLOBAL aggregation over the join output: every leg computes the
    # identical scalars, and no keyed shuffle follows the join (a
    # same-key groupBy would plan its final aggregate INTO the join
    # stage, pinning the hot key to one task and suppressing AQE's
    # split — see the threshold comment above and SCALE.md)
    agg = joined.agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    if validate:
        # correctness once per leg (untimed): identical join cardinality
        assert agg.collect()[0]["n"] == N
        return 0.0
    # ONE action per timing — a second action re-executes the whole
    # join and doubles every leg, drowning the strategy deltas
    _, sec = timed(agg.collect)
    return sec


def _task_spread(spark, seen: set) -> tuple[float, set]:
    """max/median executorRunTime ratio of the HEAVIEST new completed
    stage (largest max task time, ≥8 tasks) since ``seen`` — the
    straggler metric a 1000-executor shuffle actually feels. Local
    wall-clock HIDES reducer skew (32 memory-speed cores absorb a
    hot-key reducer while siblings idle); the hot stage's task spread
    exposes it."""
    import json as _json
    import urllib.request

    sc = spark.sparkContext
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    stages = _json.load(
        urllib.request.urlopen(f"{base}/stages?status=complete")
    )
    worst_max = -1.0
    ratio = 1.0
    new_seen = set(seen)
    for s in stages:
        sid = (s["stageId"], s["attemptId"])
        if sid in seen or s["numTasks"] < 8:
            continue
        new_seen.add(sid)
        q = _json.load(
            urllib.request.urlopen(
                f"{base}/stages/{s['stageId']}/{s['attemptId']}"
                "/taskSummary?quantiles=0.5,1.0"
            )
        )
        med, mx = q["executorRunTime"]
        if mx > worst_max:
            worst_max = mx
            ratio = mx / max(med, 1.0)
    return round(ratio, 1), new_seen


def shingle_skew_probe(spark) -> dict:
    """Hot-shingle self-join hardening (r9): the dedup equijoin's skew
    fix measured on a corpus with stopword-like hot shingles — ONE short
    shared phrase (4-5 hot shingles, fewer than cores: the regime where
    a plain shuffle funnels the freq² join work through a handful of
    reducers) planted in 20% of documents, bodies per-doc unique so the
    cold join stays sparse. The corpus replicates ×4/×8/×16; the hot
    keys' share of the work grows quadratically exactly as on a real
    crawl. Reported per scale and leg: min-of-2 wall seconds AND the
    max/median task-time spread of the run's worst stage (the metric
    that becomes stragglers at 1000 executors). Output equality plain ==
    hardened is asserted once per scale. Run via ``--shingle``; numbers
    go to SCALE.md."""
    from unittest import mock

    from dynamicqueryengine_spark.functions import dedup as D

    hot_phrase = " zqmtvxjw"  # 9 chars → 5 hot 5-gram shingles
    base_n = 1200

    def corpus(k: int):
        return spark.range(base_n * k).select(
            F.col("id").alias("doc_id"),
            F.concat(
                F.sha2(F.col("id").cast("string"), 256),
                F.lit(" "),
                F.sha2(
                    F.concat(F.lit("x"), F.col("id").cast("string")), 256
                ),
                F.when(F.col("id") % 5 == 0, F.lit(hot_phrase)).otherwise(
                    F.lit("")
                ),
            ).alias("text"),
        ).persist()

    def mine(docs):
        hashed = D.doc_hash_sets(docs, 5, "text", "doc_id").select(
            "doc_id", F.explode("_hs").alias("shingle")
        )
        return D._ngram_jaccard_join(hashed, 0.7, "doc_id")

    out: dict = {
        "plain_s": {}, "hardened_s": {},
        "plain_spread": {}, "hardened_spread": {}, "hot_freq": {},
    }
    seen: set = set()
    for k in (4, 8, 16):
        docs = corpus(k)
        out["hot_freq"][f"x{k}"] = docs.filter(
            F.col("doc_id") % 5 == 0
        ).count()  # each hot shingle's join-key frequency

        def t_hardened():
            t0 = time.perf_counter()
            mine(docs).count()
            D.release_internal_caches()
            return time.perf_counter() - t0

        def t_plain():
            # hot cut above any freq → everything takes the plain branch
            with mock.patch.object(D, "HOT_SHINGLE_FREQ", 1 << 60):
                t0 = time.perf_counter()
                mine(docs).count()
                D.release_internal_caches()
                return time.perf_counter() - t0

        # correctness once per scale: identical pair sets
        with mock.patch.object(D, "HOT_SHINGLE_FREQ", 1 << 60):
            plain_rows = mine(docs).count()
        assert mine(docs).count() == plain_rows
        t_hardened()  # warm
        _, seen = _task_spread(spark, seen)  # drop warm stages
        times = [t_hardened(), t_hardened()]
        out["hardened_spread"][f"x{k}"], seen = _task_spread(spark, seen)
        out["hardened_s"][f"x{k}"] = round(min(times), 2)
        t_plain()  # warm
        _, seen = _task_spread(spark, seen)
        times = [t_plain(), t_plain()]
        out["plain_spread"][f"x{k}"], seen = _task_spread(spark, seen)
        out["plain_s"][f"x{k}"] = round(min(times), 2)
        docs.unpersist()
    return out


def main() -> None:
    shingle = "--shingle" in sys.argv
    extra = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.ui.showConsoleProgress": "false",
    }
    if shingle:
        # the task-spread metric reads the UI's REST status API; the
        # broadcast kill (shared with the fact/dim mode) keeps the
        # self-join a real shuffle — at 100 TB the shingle stream never
        # broadcasts, and a broadcast join has no reducer to skew
        extra["spark.ui.enabled"] = "true"
    spark = get_spark(
        "skew-bench",
        cpus=os.environ.get("SPARK_GRAFT_CPUS", "32"),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    if shingle:
        print(json.dumps(shingle_skew_probe(spark)))
        spark.stop()
        return
    results = {}
    for name, aqe, salted, thresh in (
        ("plain_noaqe", False, False, None),
        ("plain_aqe_default", True, False, None),
        # 8 MB: the ~288 MB-raw hot partition lz4-compresses to ~10-25 MB
        # in the map-output stats the detector reads, so the threshold
        # must sit below THAT, not below the raw size
        ("plain_aqe_split", True, False, 8),
        ("salted_noaqe", False, True, None),
    ):
        # warm pass doubles as the correctness check (codegen + page cache)
        run(spark, aqe, salted, thresh, validate=True)
        results[name] = min(
            run(spark, aqe, salted, thresh), run(spark, aqe, salted, thresh)
        )
    print(json.dumps({"n_rows": N, "hot_frac": HOT_FRAC, **results}))
    spark.stop()


if __name__ == "__main__":
    main()
