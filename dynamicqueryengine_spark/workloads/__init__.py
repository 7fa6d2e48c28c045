from .analytics import ANALYTICS_QUERIES
from .llm import LLM_QUERIES
from .reference import REFERENCE_QUERIES, TESTDATA_SCHEMAS
from .temporal import TEMPORAL_QUERIES

_MERGED = {
    **REFERENCE_QUERIES,
    **ANALYTICS_QUERIES,
    **TEMPORAL_QUERIES,
    **LLM_QUERIES,
}

# The driver records correctness for only the first 50 dict entries. Round 2
# front-loaded reference parity, leaving the entire LLM-pipeline surface
# (dedup/ANN/multimodal/streaming) driver-unverified. Round 3 rotates: the
# 36 never-driver-checked r2 queries, the two r2 driver-red ones
# (embed_quantize_int8, docs_sample_token_budget — both fixed this round),
# and the nine operators ADDED this round (bpe, packing, CMS ×2, quantiles,
# PQ, random projection, histogram, drift) fill positions 0-46, leaving
# three canaries from the twice-driver-green reference-parity set (one rule
# compile, one broadcast join, one as-of join). Every query OUTSIDE the
# window carries r1/r2 driver evidence, except the last two temporal
# additions (events_funnel_view_purchase, events_retention_cohorts —
# added after the window filled; rotate them in next round). All queries
# stay covered by scripts/check_correctness.py locally.
_PRIORITY = [
    # driver-red in r2, fixed this round — must re-verify first
    "embed_quantize_int8",
    "docs_sample_token_budget",
    # never driver-checked: curriculum / keywords / embeddings / filters
    "docs_curriculum_buckets",
    "tfidf_keywords",
    "embed_label_centroids",
    "embed_random_projection",
    "text_quality_filter",
    # dedup family
    "dedup_exact_assign",
    "dedup_exact_keep",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_cluster_assign",
    "dedup_simhash",
    "embed_semantic_dedup",
    "embed_neardup_cosine",
    "decontaminate_flags",
    # document transforms
    "docs_repetition_filter",
    "docs_repeated_spans",
    "docs_chunk_sequences",
    "docs_pii_redact",
    "docs_length_trim",
    "corpus_mix_report",
    "corpus_snapshot_diff",
    "corpus_bpe_merges",
    "docs_pack_sequences",
    "corpus_cms_heavyhitters",
    "corpus_length_quantiles",
    # ANN family
    "ann_topk_bruteforce",
    "ann_topk_lsh",
    "ann_topk_ivf",
    "ann_topk_pq",
    # multimodal family
    "multimodal_features",
    "multimodal_png_metadata",
    "multimodal_jpeg_metadata",
    "multimodal_wav_metadata",
    "multimodal_video_frames",
    # streaming family (executed readStream -> memory sink, batch-twin oracles)
    "events_stream_rule_windows",
    "events_stream_dedup",
    "events_stream_enrich_segment",
    "events_stream_stream_join",
    "events_stream_cms_sketch",
    # temporal stragglers never inside the window
    "events_hourly_rule_counts",
    "events_value_histogram",
    "corpus_drift_chisq",
    "events_sliding_windows",
    "events_sessionize",
    "agg_argmax_global",
    # canaries: one per reference-parity family, all green in r1+r2
    "rule_equal",
    "join_revenue_by_nation",
    "events_asof_join",
]

_missing = [n for n in _PRIORITY if n not in _MERGED]
if _missing:  # fail loudly at import: a typo here silently shrinks coverage
    raise RuntimeError(f"unknown queries in priority list: {_missing}")

ALL_QUERIES = {n: _MERGED[n] for n in _PRIORITY}
ALL_QUERIES.update({n: q for n, q in _MERGED.items() if n not in ALL_QUERIES})

__all__ = [
    "ALL_QUERIES",
    "ANALYTICS_QUERIES",
    "LLM_QUERIES",
    "REFERENCE_QUERIES",
    "TEMPORAL_QUERIES",
    "TESTDATA_SCHEMAS",
]
