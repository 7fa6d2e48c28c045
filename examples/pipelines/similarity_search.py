"""ANN method comparison over the embeddings table — the four search
paths side by side, with recall@k measured against the exact baseline:

    brute force  exact cosine, broadcast query side (the oracle)
    LSH          hyperplane sign buckets, probe own bucket only
    IVF          k-means cells, probe n_probe nearest cells
    PQ           product-quantized codes, ADC distance scan

Run:  python examples/pipelines/similarity_search.py [SF_DIR]
(defaults to /root/testdata/sf0.01). Each path's 100 TB posture is in
SCALE.md; PQ additionally changes the STORAGE equation (8 B codes vs
256 B float32 vectors at the default 8×16 config).

Note on the numbers: the synthetic embeddings are near-uniform random —
the hardest case for every approximate method (no cluster structure for
IVF/PQ to exploit, sign buckets split true neighbors). Real embedding
corpora are strongly clustered and sit far up the recall curve at the
same settings; the tests (tests/test_pq.py, test_llm_functions.py)
measure recall on clustered data for exactly that reason.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "..")
)

from pyspark.sql import functions as F

from dynamicqueryengine_spark import get_spark
from dynamicqueryengine_spark.functions.pq import pq_topk
from dynamicqueryengine_spark.functions.similarity import (
    cosine_topk,
    ivf_topk,
    kmeans_centroids,
    lsh_topk,
)
from dynamicqueryengine_spark.sources.registry import load_table

K = 10
N_QUERIES = 20


def main(sf_dir: str) -> None:
    spark = get_spark("similarity-search-demo", cpus=8)
    spark.sparkContext.setLogLevel("ERROR")
    corpus = load_table(spark, sf_dir, "embeddings").cache()
    n = corpus.count()
    queries = corpus.filter(F.col("vec_id") < N_QUERIES)
    print(f"corpus: {n} vectors; {N_QUERIES} queries; k={K}\n")

    def neighbors(df):
        out = {}
        for r in df.collect():
            out.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        return out

    t0 = time.perf_counter()
    exact = neighbors(cosine_topk(corpus, queries, k=K))
    t_exact = time.perf_counter() - t0
    print(f"{'method':12s} {'recall@10':>9s} {'seconds':>8s}")
    print(f"{'bruteforce':12s} {1.0:9.3f} {t_exact:8.2f}")

    # bits/cells sized to the demo corpus: ~n/2^bits candidates per LSH
    # bucket and ~n/n_cells per IVF cell — at 100 TB you'd raise both so
    # buckets stay worker-sized. IVF here trains 3 Lloyd iterations; the
    # contract query instead pins deterministic centroids for its oracle.
    for name, fn in [
        ("lsh", lambda: lsh_topk(corpus, queries, k=K, bits=4)),
        (
            "ivf",
            lambda: ivf_topk(
                corpus,
                queries,
                k=K,
                n_cells=8,
                n_probe=4,
                centroids=kmeans_centroids(corpus, k=8, iterations=3),
            ),
        ),
        ("pq", lambda: pq_topk(corpus, queries, k=K, n_sub=8, n_codes=16)),
    ]:
        t0 = time.perf_counter()
        approx = neighbors(fn())
        dt = time.perf_counter() - t0
        hits = sum(
            len(approx.get(q, set()) & exact[q]) for q in exact
        )
        recall = hits / sum(len(v) for v in exact.values())
        print(f"{name:12s} {recall:9.3f} {dt:8.2f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
