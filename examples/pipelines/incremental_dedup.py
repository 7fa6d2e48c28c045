"""Incremental-dedup tour — the daily job of a production training-data
pipeline: dedup today's crawl against the accumulated corpus WITHOUT
re-processing the corpus, with the corpus and its MinHash signature
index maintained as lockstep versioned tables.

    day 0: corpus -> versioned table, signatures -> index table
    day 1: new crawl APPENDs to the corpus table;
           vt_read_delta feeds ONLY the new docs to the signer;
           minhash_lsh_pairs_delta probes them against the persisted
           index (the old corpus is never re-shingled);
           survivorship keeps the best-quality doc per duplicate pair;
           the delta signatures APPEND to the index table;
           vt_optimize range-clusters the corpus for file-level skipping.

Run:

    python examples/pipelines/incremental_dedup.py [SF_DIR]

(defaults to /root/testdata/sf0.01). Every stage is a tested component:
the delta probe's equality with the full path is pinned by
tests/test_llm_functions.py, the end-to-end flow is value-oracled by
scripts/check_correctness.py (dedup_vt_incremental_index), and the
versioned-table semantics by tests/test_versioned.py +
tests/test_versioned_model.py.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from pyspark.sql import functions as F  # noqa: E402

from dynamicqueryengine_spark import get_spark  # noqa: E402
from dynamicqueryengine_spark.functions import dedup as D  # noqa: E402
from dynamicqueryengine_spark.functions.text import quality_score  # noqa: E402
from dynamicqueryengine_spark.sources.registry import load_table  # noqa: E402
from dynamicqueryengine_spark.sources.versioned import (  # noqa: E402
    vt_optimize,
    vt_read,
    vt_read_delta,
    vt_scan_plan,
    vt_write,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("incremental-dedup", cpus="8")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="dqe_incdedup_")
    docs_path = os.path.join(root, "corpus")
    sigs_path = os.path.join(root, "sig_index")

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    is_new = F.col("doc_id") % 4 == 0  # stand-in for "today's crawl"

    # ---- day 0: ingest the existing corpus and build its index ----
    v1 = vt_write(spark, docs_path, docs.filter(~is_new))
    base_sigs = D.minhash_signatures(vt_read(spark, docs_path, v1))
    vt_write(spark, sigs_path, base_sigs)
    print(f"day 0: corpus v{v1}, index rows = "
          f"{vt_read(spark, sigs_path).count()}")

    # ---- day 1: append the crawl, dedup ONLY the delta ----
    v2 = vt_write(spark, docs_path, docs.filter(is_new), mode="append")
    delta = vt_read_delta(spark, docs_path, v1, v2)
    sig_delta = D.minhash_signatures(delta).persist()
    pairs = D.minhash_lsh_pairs_delta(
        vt_read(spark, docs_path, v2),
        vt_read(spark, sigs_path),
        delta,
        k=5,
        threshold=0.7,
        delta_sigs=sig_delta,
    ).persist()
    print(f"day 1: {delta.count()} new docs, "
          f"{pairs.count()} near-dup pairs vs the corpus")

    # survivorship: per duplicate pair, keep the higher-quality side
    q = docs.select("doc_id", quality_score(F.col("text")).alias("q"))
    qa = q.select(F.col("doc_id").alias("id_a"), F.col("q").alias("qa"))
    qb = q.select(F.col("doc_id").alias("id_b"), F.col("q").alias("qb"))
    drops = (
        pairs.join(qa, "id_a").join(qb, "id_b")
        .select(
            F.when(F.col("qa") >= F.col("qb"), F.col("id_b"))
            .otherwise(F.col("id_a"))
            .alias("drop_id")
        )
        .distinct()
    )
    print(f"day 1: survivorship drops {drops.count()} lower-quality dups")

    # the index tracks the corpus: commit the delta signatures
    vt_write(spark, sigs_path, sig_delta, mode="append")
    sig_delta.unpersist()
    print(f"day 1: index rows = {vt_read(spark, sigs_path).count()} "
          f"(= docs with >=1 shingle)")

    # ---- maintenance: range-cluster the corpus for data skipping ----
    v3 = vt_optimize(spark, docs_path, ["doc_id"], n_partitions=8)
    hi = docs.agg(F.max("doc_id")).collect()[0][0]
    plan = vt_scan_plan(
        docs_path, predicate=("doc_id", ">", hi * 3 // 4)
    )
    print(f"optimize -> v{v3}: selective read scans "
          f"{plan['files_kept']}/{plan['files_total']} files")

    spark.stop()
    print("done.")


if __name__ == "__main__":
    main()
