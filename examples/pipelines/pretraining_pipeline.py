"""End-to-end pretraining-data pipeline using the public API — the
composition a training-data team would actually run, stage by stage:

    quality filter -> repetition filter -> exact dedup -> near-dup
    clusters -> decontamination -> PII redaction -> temperature
    rebalance -> sequence packing -> corpus card

Every stage is one operator from `dynamicqueryengine_spark.functions`;
each prints its surviving row count so the funnel is visible. Run:

    python examples/pipelines/pretraining_pipeline.py [SF_DIR]

(defaults to /root/testdata/sf0.01). All stages are lazy Column/DataFrame
compositions — the whole funnel is ONE Catalyst plan per action, and
every operator's 100 TB posture is documented in SCALE.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from pyspark.sql import functions as F

from dynamicqueryengine_spark import TableRegistry, get_spark
from dynamicqueryengine_spark.functions import text as T
from dynamicqueryengine_spark.functions.chunking import chunk_documents
from dynamicqueryengine_spark.functions.cluster import cluster_assign
from dynamicqueryengine_spark.functions.decontaminate import decontaminate
from dynamicqueryengine_spark.functions.dedup import (
    exact_dedup_keep,
    minhash_lsh_pairs,
)
from dynamicqueryengine_spark.functions.redact import redact_pii
from dynamicqueryengine_spark.functions.repetition import repetition_profile
from dynamicqueryengine_spark.functions.sampling import sample_temperature


def main(sf_dir: str) -> None:
    spark = get_spark("pretraining-pipeline")
    docs = TableRegistry(spark, sf_dir)["documents"]
    n0 = docs.count()
    print(f"raw corpus:            {n0}")

    # 1. quality + repetition filters (pure Column expressions). The
    # synthetic corpus draws from a tiny vocabulary, so the dup-word
    # criterion would flag nearly everything — use the phrase-loop
    # (top-bigram) criterion here; real corpora use .filter("keep").
    quality = docs.filter(T.quality_score(F.col("text")) >= 0.5)
    rep = (
        repetition_profile(quality)
        .filter("n_words - 1 < 20 OR top_bigram_fraction <= 0.18")
        .select("doc_id")
    )
    clean = quality.join(rep, "doc_id", "left_semi")
    print(f"after quality+rep:     {clean.count()}")

    # 2. exact dedup (content fingerprint, keep min id per fingerprint)
    keep_ids = exact_dedup_keep(clean).select("doc_id")
    deduped = clean.join(keep_ids, "doc_id", "left_semi")
    print(f"after exact dedup:     {deduped.count()}")

    # 3. near-dup clusters via MinHash-LSH; keep each cluster's exemplar
    pairs = minhash_lsh_pairs(deduped.select("doc_id", "text"), k=5, threshold=0.7)
    clusters = cluster_assign(deduped, pairs)
    exemplars = clusters.filter("doc_id = cluster_id").select("doc_id")
    neardup_free = deduped.join(exemplars, "doc_id", "left_semi")
    print(f"after near-dup:        {neardup_free.count()}")

    # 4. decontaminate vs a benchmark slice (stand-in for a real eval set)
    benchmark = docs.filter(F.col("doc_id") % 97 == 0)
    safe = decontaminate(neardup_free, benchmark, n=5)
    print(f"after decontamination: {safe.count()}")

    # 5. PII scrub, 6. temperature rebalance, 7. sequence packing
    scrubbed = redact_pii(safe).select(
        "doc_id", F.col("redacted").alias("text")
    ).join(safe.select("doc_id", "lang"), "doc_id")
    balanced = sample_temperature(scrubbed)
    chunks = chunk_documents(balanced, chunk_tokens=64, stride=64)
    print(f"after rebalance:       {balanced.count()}")
    print(f"training sequences:    {chunks.count()}")

    # 7b. packing bookkeeping: which fixed 2048-token training window each
    # surviving document starts in (concat-by-id packing — the data-loader
    # side of chunking)
    from dynamicqueryengine_spark.functions.packing import pack_sequences

    packed = pack_sequences(balanced, seq_len=2048)
    n_windows = packed.agg(
        (F.max((F.col("start_offset") + F.col("tok_ws") - 1)) / 2048 + 1)
        .cast("long")
        .alias("w")
    ).first()["w"]
    print(f"packed 2048-token windows: {n_windows}")

    # 8. corpus card: totals + per-source length percentiles + corpus-wide
    # heavy-hitter tokens from a bounded count-min sketch
    from dynamicqueryengine_spark.functions.cms import cms_topk_estimates
    from dynamicqueryengine_spark.functions.quantiles import group_quantiles

    chunks.groupBy().agg(
        F.count(F.lit(1)).alias("sequences"),
        F.sum("n_tokens").alias("total_tokens"),
        F.round(F.avg("n_tokens"), 2).alias("avg_tokens"),
    ).show()
    lengths = balanced.select(
        "lang", T.token_count_ws(F.col("text")).cast("long").alias("tok")
    )
    group_quantiles(lengths, "tok", "lang", ps=(0.5, 0.9)).orderBy(
        "lang", "p"
    ).show(8)
    cms_topk_estimates(balanced, k=5).orderBy(
        F.col("exact_count").desc(), "word"
    ).show()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
