"""Deduplication operators for training-data pipelines (SURVEY.md §7 Phase 4).

Five families, each designed for 100 TB first and oracle-checkable where the
computation is expressible in portable SQL:

* **Exact** — hash-groupBy on a normalized-content fingerprint. One shuffle
  keyed by the fingerprint; canonical id = min id per group (deterministic).
* **N-gram Jaccard** — character-shingle explode + shingle-equijoin +
  jaccard threshold. Exact but shuffle-heavy (the join key is the shingle);
  this is the verification baseline. SQL-expressible → full oracle.
* **MinHash + LSH** — the scale path: 32-permutation signatures via
  ``xxhash64(seed, shingle)`` min-aggregation, banded into buckets, candidate
  pairs only within buckets, then EXACT jaccard verification of candidates.
  Output schema matches the exact variant; recall < 1 is the documented
  trade (so no SQL oracle — hash functions aren't portable).
* **SimHash** — 64-bit signature from token hashes; near-dup = hamming ≤ h,
  candidates via 4×16-bit band pigeonhole (hamming ≤ 3 ⇒ at least one band
  equal), verified with ``bit_count(xor)``.
* **Embedding cosine** — brute-force O(n²) pair scan with exact cosine (the
  baseline; LSH bucketing in functions/similarity.py is the scale path).
  Deterministic left-to-right double arithmetic, mirrored in SQL → oracle.

All Column-expression / DataFrame-API; no Python UDFs anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from ..util import spread
from .text import normalize_text, normalize_text_sql

# Frames the pair miners persist INTERNALLY (survivor candidate sets,
# semi-joined hash-set caches, eager pair results). They must stay cached
# until the caller materializes the lazily-returned result, so the miners
# cannot unpersist them in-function; every such persist is wrapped in
# :func:`_register_cache` at its creation site. One-shot sessions drop
# them with the session and bench.py's scrub clears all caches between
# queries, but LONG-RUNNING processes that call the miners repeatedly in
# one session (scale probes, services) should call
# :func:`release_internal_caches` after each result is materialized
# (r7 advisor: bench_scale_probe's min-of-2 loop accumulated survivor
# caches for the process lifetime — it now releases per timing pass).
# Frames recompute transparently if re-collected after release.
_INTERNAL_CACHES: list[DataFrame] = []


def _register_cache(df: DataFrame) -> DataFrame:
    _INTERNAL_CACHES.append(df)
    return df


def release_internal_caches() -> None:
    """Unpersist every internally-persisted miner frame (see above)."""
    while _INTERNAL_CACHES:
        _INTERNAL_CACHES.pop().unpersist()


# ---------------------------------------------------------------- exact --


def exact_dedup_assign(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Every row + its content fingerprint + the canonical (minimum) id of
    its duplicate group. ``canonical_id == id`` marks the kept row."""
    fp = F.md5(normalize_text(F.col(text_col))).alias("fingerprint")
    with_fp = df.select(F.col(id_col), fp)
    w = Window.partitionBy("fingerprint")
    return with_fp.select(
        id_col,
        "fingerprint",
        F.min(id_col).over(w).alias("canonical_id"),
    )


def exact_dedup_assign_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    fp = f"md5({normalize_text_sql(text_col)})"
    return (
        f"SELECT {id_col}, {fp} AS fingerprint, "
        f"min({id_col}) OVER (PARTITION BY {fp}) AS canonical_id FROM {table}"
    )


def exact_dedup_keep(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Kept-rows view: one row per distinct normalized content."""
    assigned = exact_dedup_assign(df, text_col, id_col)
    return assigned.filter(F.col(id_col) == F.col("canonical_id")).select(
        id_col, "fingerprint"
    )


def exact_dedup_keep_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    return (
        f"SELECT {id_col}, fingerprint FROM ({exact_dedup_assign_sql(table, text_col, id_col)}) "
        f"WHERE {id_col} = canonical_id"
    )


# -------------------------------------------------------------- shingles --


def raw_shingles(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Character k-gram shingle stream per document (duplicates retained):
    explode stays JVM-side (sequence + substring). Consumers that are
    duplicate-insensitive (minhash min-agg, incidence-matrix assignment)
    use this directly and skip a full-table distinct shuffle."""
    t = normalize_text(F.col(text_col))
    return (
        spread(df).select(
            F.col(id_col),
            t.alias("_t"),
        )
        # documents shorter than k yield no shingles; without this guard
        # sequence(1, len-k+1) would run DESCENDING (stop < start defaults
        # to step -1) and fabricate bogus shingles the SQL mirror's range()
        # correctly omits
        .filter(F.length("_t") >= k)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(1), F.length("_t") - (k - 1))).alias("_i"),
            F.col("_t"),
        )
        .select(id_col, F.substring(F.col("_t"), F.col("_i"), k).alias("shingle"))
    )


def shingles(
    df: DataFrame, k: int = 5, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Distinct character k-gram shingles per document: (id, shingle).

    Explode + distinct, NOT a row-local array_distinct(transform(...)):
    higher-order array functions are interpreted per element (no
    whole-stage codegen), and measured 2-7× slower than the codegen'd
    explode pipeline + long-only shuffle at sf0.1."""
    return raw_shingles(df, k, text_col, id_col).distinct()


def _shingles_sql(table: str, k: int, text_col: str, id_col: str) -> str:
    t = normalize_text_sql(text_col)
    return (
        f"SELECT DISTINCT {id_col}, substr(t, CAST(i AS INT), {k}) AS shingle "
        f"FROM (SELECT {id_col}, {t} AS t FROM {table}), "
        f"UNNEST(range(1, length(t) - {k - 2})) AS u(i)"
    )


# -------------------------------------------------- exact n-gram jaccard --


# Odd 64-bit base for the rolling polynomial shingle hash (FNV prime).
_SHINGLE_HASH_BASE = 1099511628211


def doc_hash_sets(
    df: DataFrame, k: int, text_col: str, id_col: str
) -> DataFrame:
    """Per-document distinct shingle-hash sets (id, _hs: array<long>),
    zero shuffle: normalization is ONE codegen'd regex pass in the JVM,
    then an Arrow-vectorized pass hashes every k-gram with a numpy
    polynomial over the codepoint array (sliding windows × base powers,
    uint64 wraparound) and dedupes per doc.

    The earlier higher-order-function form (transform over the position
    sequence → xxhash64(substring) per k-gram) ran INTERPRETED per
    position — ~chars-per-doc lambda steps per row, the dominant cost of
    the near-dup stage at sf0.1 (the same vectorize-the-HOF trade measured
    4×+ on PQ/IVF/LSH). The hash VALUES are engine-internal — every
    consumer (dense matmul, equijoin on hashes, candidate verification)
    treats them as opaque set elements and the SQL oracle equijoins raw
    shingle strings — so swapping xxhash64 for the vectorizable polynomial
    only changes the (negligible, < 2⁻³⁰ corpus-wide) collision profile,
    not any checked result. The explode + collect_set formulation stays
    rejected: it moves every shingle hash through a groupBy exchange
    (2-5× slower measured); see minhash_signatures for the opposite trade
    (min over 32 permutations favors the exploded stream)."""
    import numpy as np
    import pandas as pd

    t = normalize_text(F.col(text_col))
    d = spread(df).select(id_col, t.alias("_t")).filter(F.length("_t") >= k)

    def hash_sets(batches):
        base = np.uint64(_SHINGLE_HASH_BASE)
        powers = base ** np.arange(k - 1, -1, -1, dtype=np.uint64)
        for b in batches:
            out = []
            for s in b["_t"]:
                cps = np.frombuffer(
                    s.encode("utf-32-le"), dtype=np.uint32
                ).astype(np.uint64)
                wins = np.lib.stride_tricks.sliding_window_view(cps, k)
                h = (wins * powers[None, :]).sum(axis=1, dtype=np.uint64)
                out.append(np.unique(h).view(np.int64))
            yield pd.DataFrame({id_col: b[id_col], "_hs": out})

    return d.mapInPandas(hash_sets, schema=f"{id_col} long, _hs array<long>")


def _verify_candidate_jaccard(
    candidates: DataFrame,
    docs: DataFrame,
    k: int,
    threshold: float,
    text_col: str,
    id_col: str,
    doc_sets: DataFrame | None = None,
) -> DataFrame:
    """Exact jaccard for a candidate-pair set. The DOCUMENTS are
    semi-joined down to candidate ids BEFORE shingling, each survivor's
    shingle set is folded into ONE int64 hash array (the fingerprinting
    trick from the dense path — collisions < 2⁻³⁰ corpus-wide, treated as
    exact), and the intersection is a per-pair ``array_intersect`` after
    two broadcast joins. No string-keyed shuffle: the earlier formulation
    (pair ⋈ shingle ⋈ shingle, groupBy pair) shuffled exploded shingle
    strings three times and was ~4s of the sf0.1 minhash wall time.
    Pass a persisted ``doc_sets`` to reuse an existing per-doc hash-set
    cache instead of re-shingling the candidate documents."""
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .union(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    if doc_sets is not None:
        hs = _register_cache(
            doc_sets.join(F.broadcast(cand_ids), id_col, "semi").persist()
        )
    else:
        cand_docs = docs.join(F.broadcast(cand_ids), id_col, "semi")
        hs = _register_cache(
            doc_hash_sets(cand_docs, k, text_col, id_col).persist()
        )
    # Materialize NOW: the two broadcast sides below are built by
    # CONCURRENT jobs, and a cold cache makes both recompute this whole
    # subtree (candidate mining included) in parallel — with the Arrow
    # shingle stage that also means a 2× python-worker fork storm.
    # One eager count turns the race into one cached computation.
    hs.count()
    pa = hs.select(F.col(id_col).alias("id_a"), F.col("_hs").alias("_ha"))
    pb = hs.select(F.col(id_col).alias("id_b"), F.col("_hs").alias("_hb"))
    c = F.size(F.array_intersect("_ha", "_hb"))
    jac = c / (F.size("_ha") + F.size("_hb") - c)
    return (
        candidates.join(F.broadcast(pa), "id_a")
        .join(F.broadcast(pb), "id_b")
        .filter(jac >= F.lit(threshold))
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


# Dense-path sizing: the dense path applies only while the WHOLE incidence
# matrix fits ONE broadcast tile of MAX_DENSE_CELLS float32 cells (2^28 ≈
# 1 GiB) — beyond that the fully-distributed equijoin takes over. Round 3
# allowed up to 8 tiles materialized serially on the driver, which made a
# T-tile run T sequential driver round-trips exactly when the dense path
# was near its gate; single-tile-or-equijoin removes the only corpus-sized
# serial driver loop in the package.
MAX_DENSE_CELLS = 2**28
# Flops gate for finishing the already-collected single tile with one
# driver BLAS call instead of broadcast + mapInPandas (~1.4e11 fused
# mul-adds ≈ 0.3 s on one multicore node). Tests patch this to pin route
# equivalence.
DRIVER_MATMUL_MAX_FLOPS = 2**37


def _route_stats(doc_sets: DataFrame) -> tuple[int, int]:
    """(approx vocab, exact doc count) in ONE job (r14 — this was two:
    an approx-distinct agg, then a count; the second pass re-read the
    whole cached set table just to count rows). Materializes the cache.
    Vocab is approximate (±2% — the dense-route cell gate is a sizing
    heuristic, both routes are exact); n_docs rides the same exploded
    stream as "position-0 elements plus empty sets", so no second job,
    no Expand, no distinct."""
    row = (
        doc_sets.select(F.posexplode_outer("_hs").alias("_p", "_h"))
        .agg(
            F.approx_count_distinct("_h", rsd=0.02).alias("v"),
            F.sum(
                F.when(
                    F.col("_p").isNull() | (F.col("_p") == 0), 1
                ).otherwise(0)
            ).alias("n"),
        )
        .collect()[0]
    )
    return int(row["v"] or 0), int(row["n"] or 0)


def ngram_jaccard_pairs(
    df: DataFrame,
    k: int = 5,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dense_vocab: int = 200_000,
) -> DataFrame:
    """All document pairs with shingle-set jaccard ≥ threshold — EXACT.
    Output: (id_a, id_b, jaccard) with id_a < id_b, jaccard rounded to 6dp.

    Execution adapts to the shingle-frequency shape:

    * **Small vocabulary AND bounded corpus** (incidence matrix fits ONE
      broadcast tile of ``MAX_DENSE_CELLS`` cells — templated/near-
      duplicate-heavy corpora, where a shingle equijoin explodes as
      Σ freq²): dense matmul over the 0/1 shingle-incidence matrix. Spark
      computes shingle sets distributed; the single bounded tile is
      collected and broadcast; the corpus streams through ``mapInPandas``
      and a float32 matmul per Arrow slice yields EXACT intersection
      counts (0/1 sums ≤ vocab < 2²⁴ are exact in float32).
    * **Otherwise** (diverse corpus or too many docs — equijoin buckets
      are small): plain shingle equijoin + per-pair counting, all Column
      ops, nothing collected. Multi-tile dense work routes HERE by design:
      a serial per-tile driver loop is a driver-throughput bottleneck at
      exactly the scale where tiling would matter.

    Both paths produce identical results (and match the SQL oracle, which
    uses the equijoin formulation).
    """
    # Per-doc hash sets are built row-locally (doc_hash_sets — zero
    # shuffle, no text duplication) and cached ONCE; the cache feeds
    # everything downstream: the sizing stats (one agg over the cached
    # sets), the dense tiles, the streaming matmul side, and the equijoin
    # fallback (exploded FROM CACHE, joining on hashes instead of
    # strings). Collision risk at the dense gate's 200k-vocab cap is
    # < 2⁻³⁰ corpus-wide — treated as exact (the sf0.01 DuckDB oracle,
    # which equijoins raw strings, agrees).
    # registered: the equijoin route below returns a plan that still reads
    # this cache (the dense routes unpersist it in-function; release is
    # then a harmless no-op on the already-unpersisted frame)
    doc_sets = _register_cache(doc_hash_sets(df, k, text_col, id_col).persist())
    n_vocab, n_docs = _route_stats(doc_sets)
    if n_vocab > max_dense_vocab or n_docs * n_vocab > MAX_DENSE_CELLS:
        hashed = doc_sets.select(
            id_col, F.explode("_hs").alias("shingle")
        )
        return _ngram_jaccard_join(hashed, threshold, id_col)
    return _ngram_jaccard_dense(doc_sets, threshold, id_col, n_vocab, n_docs)


# Shingle self-join skew hardening (r9): a shingle shared by f documents
# contributes f² joined rows all hashed to ONE reducer — stopword-like
# 5-grams ("the q", " and ") are exactly such keys on natural corpora,
# the measured ±2-4× variance source of the equijoin route. Shingles
# above the hot cut take a two-level triangle-salted join spread over
# SHINGLE_SALT_BUCKETS² reducers instead.
#
# The cut is RELATIVE, not absolute (r9 fix): a key is a straggler only
# when its OWN f² exceeds one reducer's fair share of the total join
# work Σf² / shuffle-partitions — salting is for the few-hot-keys
# regime. An absolute frequency cut misroutes the many-moderate-keys
# regime (a small-vocabulary corpus put 99% of shingle rows through the
# ×2g-replicated salted branch that a plain hash join already balances,
# measured 5-8× slower at sf0.1); under the fair-share cut that corpus
# takes the pure plain plan (its hottest key carries 84M of a 6.5G-work
# join — 40% of one reducer's share) while the few-stopword skew corpus
# still salts. HOT_SHINGLE_FREQ is the FLOOR of the cut (per-reducer
# memory bound: f ≤ floor ⇒ ≤ floor² rows per cold key);
# HOT_WORK_SHARE scales the fair-share term (tests set it to 0 to force
# every key hot).
HOT_SHINGLE_FREQ = 256
HOT_WORK_SHARE = 1.0
SHINGLE_SALT_BUCKETS = 8


def _pair_shingle_counts(sh: DataFrame, id_col: str) -> DataFrame:
    """(id_a, id_b, c) with id_a < id_b and c = |shared shingles| — the
    self-join core of the jaccard/containment equijoin routes, HOT-KEY
    HARDENED with a fair-share cut (see the module constants above):
    cold shingles (every key when none exceeds one reducer's share of
    Σf² — the common case, where this compiles to exactly the plain
    plan) take the plain equijoin; hot
    shingles take a triangle-salted join — side A carries its own salt
    s(id) and replicates over the partner salt j, side B mirrors, and
    joining on (shingle, sa=i, j=sb) lands each row pair in EXACTLY one
    of g² reducers, so a hot key's f² work spreads evenly instead of
    funneling through one task (AQE's skew split can't help here at
    scale: the per-pair count that follows repartitions anyway, and map
    output of one hot key still serializes through one reducer's fetch).
    The two branches' RAW pair streams union before the single per-pair
    count aggregation — aggregating per branch first would add a second
    full exchange of the pair stream; the union keeps exactly the plain
    plan's one exchange with map-side partials.

    Plan-shape decision: ONE map-side-combined frequency aggregate over
    the lazy stream yields (Σf², max f) — the fair-share cut. In the
    no-straggler case the returned plan is EXACTLY the pre-hardening
    plain self-join over the LAZY stream (self-joining the identical
    subplan gives Spark a ReusedExchange: the shingle shuffle is written
    once) — measured 3.3× faster than the same join over a persisted
    copy of the stream at sf0.1, so the stream is persisted (and
    registered for release) ONLY when a hot branch engages and its four
    references would otherwise re-run the shingle hashing (measured
    ~1.7× the whole plain join on a ×16 skew corpus)."""
    import math

    freqs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
    p = int(sh.sparkSession.conf.get("spark.sql.shuffle.partitions"))

    def raw_pairs(a: DataFrame, b: DataFrame, on: list[str]) -> DataFrame:
        a, b = a.alias("a"), b.alias("b")
        return (
            a.join(b, on=on)
            .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
        )

    # one tiny driver scalar (2 values, one lazy agg pass) decides the
    # plan shape: the fair-share cut, and whether a hot branch is needed
    # at all — when no key exceeds it, the hybrid's extra exchanges and
    # ×2g replication are pure loss, so the plan IS the plain equijoin
    stats = freqs.agg(
        F.sum(F.col("_f") * F.col("_f")).alias("_w"),
        F.max("_f").alias("_fmax"),
    ).collect()[0]
    work = int(stats["_w"] or 0)
    fmax = int(stats["_fmax"] or 0)
    cut = max(
        HOT_SHINGLE_FREQ,
        math.isqrt(int(work * HOT_WORK_SHARE / p)) if p else 0,
    )
    if fmax <= cut:
        return (
            raw_pairs(sh, sh, ["shingle"])
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("c"))
        )

    sh = _register_cache(sh.persist())
    freqs = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_f"))
    hot = freqs.filter(F.col("_f") > cut).select("shingle")
    cold_sh = sh.join(F.broadcast(hot), "shingle", "anti")
    hot_sh = sh.join(F.broadcast(hot), "shingle", "semi")

    g = SHINGLE_SALT_BUCKETS
    reps = F.explode(F.array(*[F.lit(i) for i in range(g)]))
    own = F.pmod(F.xxhash64(F.col(id_col)), F.lit(g)).cast("int")
    # EXPLICIT fixed-width repartition on the salted key: the salted
    # sides are tiny in ROW count (the blow-up is the join OUTPUT), so
    # AQE's input-byte-sized coalescing would collapse the exchange to
    # ~one partition and re-create the very funnel the salt removes —
    # a user-specified partition count is exempt from coalescing, and
    # hash-clustering on the join key means no further exchange.
    p = int(sh.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    keys = ["shingle", "_x", "_y"]
    salted_a = hot_sh.withColumn("_x", own).withColumn("_y", reps).repartition(
        p, *keys
    )
    salted_b = hot_sh.withColumn("_y", own).withColumn("_x", reps).repartition(
        p, *keys
    )
    cold = raw_pairs(cold_sh, cold_sh, ["shingle"])
    hot_pairs = raw_pairs(salted_a, salted_b, keys)
    return (
        cold.unionByName(hot_pairs)
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def _ngram_jaccard_join(sh: DataFrame, threshold: float, id_col: str) -> DataFrame:
    """Equijoin formulation: join on shingle, count per pair. Cost is
    Σ_shingle freq² joined rows — right when shingle frequencies are low;
    hot shingles route through the salted branch of
    :func:`_pair_shingle_counts`."""
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n"))
    common = _pair_shingle_counts(sh, id_col)
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    jac = F.col("c") / (F.col("na") + F.col("nb") - F.col("c"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(jac >= F.lit(threshold))
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
    )


def _incidence(hs_lists, vocab_arr, np):
    """Ragged hash-lists → dense 0/1 matrix over ``vocab_arr`` columns
    (sorted int64). Fully vectorized: flatten, searchsorted, scatter.
    Hashes absent from ``vocab_arr`` are dropped (they contribute 0 to the
    intersection); returns (matrix, true set sizes)."""
    lens = np.fromiter((len(x) for x in hs_lists), dtype=np.int64, count=len(hs_lists))
    if lens.sum() == 0 or len(vocab_arr) == 0:
        return np.zeros((len(hs_lists), len(vocab_arr)), dtype=np.float32), lens
    flat = np.concatenate([np.asarray(x, dtype=np.int64) for x in hs_lists])
    rows = np.repeat(np.arange(len(hs_lists)), lens)
    pos = np.searchsorted(vocab_arr, flat)
    pos_c = np.minimum(pos, len(vocab_arr) - 1)
    ok = vocab_arr[pos_c] == flat
    mat = np.zeros((len(hs_lists), len(vocab_arr)), dtype=np.float32)
    mat[rows[ok], pos_c[ok]] = 1.0
    return mat, lens


def _ngram_jaccard_dense(
    doc_sets: DataFrame,
    threshold: float,
    id_col: str,
    n_vocab: int,
    n_docs: int,
    metric: str = "jaccard",
) -> DataFrame:
    """Single-tile dense incidence-matrix formulation for small
    vocabularies, fed by the cached per-document hash-set table (one
    explode total).

    The caller guarantees the WHOLE incidence matrix fits one broadcast
    tile (``n_docs × n_vocab ≤ MAX_DENSE_CELLS`` float32 cells); larger
    inputs route to the fully-distributed equijoin instead, so nothing
    here is ever a corpus-sized serial driver loop. The tile is collected
    once, broadcast, and the corpus streams against it through
    ``mapInPandas``; ``id_a < id_b`` emits each pair exactly once.

    ``metric`` selects the score/pair shape from the same intersection
    counts: ``"jaccard"`` → c/|A∪B|, one row per unordered pair
    (id_a < id_b); ``"containment"`` → c/|Sₐ|, DIRECTIONAL, both
    orientations emitted (id_a ≠ id_b).
    """
    import numpy as np
    import pandas as pd

    spark = doc_sets.sparkSession
    out_col = "jaccard" if metric == "jaccard" else "containment"

    def _score_mask(c, a_sizes, b_sizes, a_ids, b_ids):
        if metric == "jaccard":
            union = a_sizes[:, None] + b_sizes[None, :] - c
            score = c / np.maximum(union, 1)
            keep = (score >= threshold) & (a_ids[:, None] < b_ids[None, :])
        else:
            score = c / np.maximum(a_sizes[:, None], 1)
            keep = (score >= threshold) & (a_ids[:, None] != b_ids[None, :])
        return score, keep

    # Driver fast path for the genuinely small case: the tile is ALREADY
    # collected for broadcasting, so when the full all-pairs product is a
    # sub-second BLAS call (flops gate below ≈ 1.4e11 fused mul-adds —
    # ~0.3 s on one multicore node) the broadcast + Arrow round-trip +
    # distributed job cost MORE than just multiplying the matrix we are
    # holding. Measured at sf0.1 (5000 docs × 2043 vocab): 0.24 s driver
    # matmul vs ~4 s for the same product through mapInPandas. Row-sliced
    # so the c block never exceeds ~2^26 float64 cells. Anything bigger
    # takes the distributed path below, which is the 100 TB design.
    if n_docs * n_docs * max(n_vocab, 1) <= DRIVER_MATMUL_MAX_FLOPS:
        block_pdf = doc_sets.toPandas()
        if metric == "jaccard" and len(block_pdf):
            # sort by id so id_a < id_b ⇔ row(a) < row(b): the undirected
            # jaccard mask only ever keeps the upper triangle, so each
            # row block multiplies against columns ≥ its own start —
            # half the flops of the full product (r14; containment is
            # directional and keeps the full product). Output order is
            # irrelevant (consumers are sets / order-insensitive hashes).
            block_pdf = block_pdf.sort_values(id_col, ignore_index=True)
        ids = block_pdf[id_col].to_numpy()
        vocab_arr = (
            np.unique(
                np.concatenate(
                    [np.asarray(x, dtype=np.int64) for x in block_pdf["_hs"]]
                )
            )
            if len(block_pdf)
            else np.empty(0, dtype=np.int64)
        )
        mat, sizes = _incidence(block_pdf["_hs"], vocab_arr, np)
        row_cap = max(1, 2**26 // max(len(ids), 1))
        if metric == "jaccard":
            # ≥8 row blocks so the upper-triangle restriction is worth
            # ~0.56× of the full product even when one block would fit
            row_cap = max(1, min(row_cap, -(-len(ids) // 8)))
        outs = []
        for lo in range(0, len(ids), row_cap):
            sl = slice(lo, lo + row_cap)
            cols = slice(lo, None) if metric == "jaccard" else slice(None)
            c = (mat[sl] @ mat[cols].T).astype(np.float64)
            score, keep = _score_mask(
                c, sizes[sl], sizes[cols], ids[sl], ids[cols]
            )
            ka, kb = np.where(keep)
            outs.append(
                pd.DataFrame(
                    {
                        "id_a": ids[lo + ka],
                        "id_b": ids[cols][kb],
                        out_col: np.round(score[ka, kb], 6),
                    }
                )
            )
        pairs_pdf = (
            pd.concat(outs, ignore_index=True)
            if outs
            else pd.DataFrame({"id_a": [], "id_b": [], out_col: []})
        )
        doc_sets.unpersist()
        return spark.createDataFrame(
            pairs_pdf, schema=f"id_a long, id_b long, {out_col} double"
        )

    block_pdf = doc_sets.toPandas()
    b_ids = block_pdf[id_col].to_numpy()
    vocab_arr = (
        np.unique(np.concatenate([np.asarray(x, dtype=np.int64)
                                  for x in block_pdf["_hs"]]))
        if len(block_pdf)
        else np.empty(0, dtype=np.int64)
    )
    b_mat, b_sizes = _incidence(block_pdf["_hs"], vocab_arr, np)
    bc = spark.sparkContext.broadcast((b_ids, vocab_arr, b_mat, b_sizes))
    # executor-side slice cap: an Arrow batch is re-sliced so the
    # streaming a-matrix also stays ≤ ~2^25 cells
    row_cap = max(1, 2**25 // max(len(vocab_arr), 1))

    def block(batches, _bc=bc, _cap=row_cap):
        bids, vocab, bmat, bsizes = _bc.value
        for batch in batches:
            for lo in range(0, len(batch), _cap):
                sl = batch.iloc[lo : lo + _cap]
                a_ids = sl[id_col].to_numpy()
                a_mat, a_sizes = _incidence(sl["_hs"], vocab, np)
                c = (a_mat @ bmat.T).astype(np.float64)  # exact counts
                score, keep = _score_mask(c, a_sizes, bsizes, a_ids, bids)
                keep_a, keep_b = np.where(keep)
                yield pd.DataFrame(
                    {
                        "id_a": a_ids[keep_a],
                        "id_b": bids[keep_b],
                        out_col: np.round(score[keep_a, keep_b], 6),
                    }
                )

    out = doc_sets.mapInPandas(
        block, schema=f"id_a long, id_b long, {out_col} double"
    )
    # Materialize the pair list EAGERLY while the set cache is hot: left
    # lazy, the mapInPandas would re-derive doc_sets AFTER the unpersist
    # below (a full shingle rebuild at the consumer's first action — the
    # r2 pipeline_pretraining_corpus 1.7× regression). The survivor pair
    # set is tiny (only jaccard≥threshold pairs), so persisting it costs
    # ~nothing. The broadcast is released from executors right after
    # (re-broadcast on demand if the pair cache is ever evicted). (An
    # earlier revision localCheckpoint()ed instead; checkpoint RDDs are
    # invisible to catalog.clearCache() and accumulated heap across long
    # sessions — persist+count is strictly better: cache-managed,
    # LRU-evictable, recomputable.)
    out = _register_cache(out.persist())
    out.count()
    doc_sets.unpersist()
    bc.unpersist()
    return out


def ngram_jaccard_pairs_sql(
    table: str,
    k: int = 5,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    sh = _shingles_sql(table, k, text_col, id_col)
    return f"""
WITH sh AS ({sh}),
sizes AS (SELECT {id_col}, count(*) AS n FROM sh GROUP BY {id_col}),
common AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.{id_col} < b.{id_col}
  GROUP BY 1, 2)
SELECT id_a, id_b,
       round(c * 1.0 / (sa.n + sb.n - c), 6) AS jaccard
FROM common
JOIN sizes sa ON common.id_a = sa.{id_col}
JOIN sizes sb ON common.id_b = sb.{id_col}
WHERE c * 1.0 / (sa.n + sb.n - c) >= {threshold}
""".strip()


def containment_pairs(
    df: DataFrame,
    k: int = 5,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DIRECTIONAL near-containment pairs: (id_a, id_b, containment) where
    containment = |Sₐ ∩ S_b| / |Sₐ| ≥ threshold over k-shingle sets — the
    asymmetric companion to jaccard. Jaccard misses the cases training
    pipelines care about most at cleanup time: a short document quoted
    wholesale inside a long one, boilerplate wrappers around distinct
    bodies, a page that is a superset of another. Both directions are
    emitted (A-in-B and B-in-A are different facts); self-pairs are not.

    Plan: ADAPTIVE, the same two routes as :func:`ngram_jaccard_pairs`
    (the r4 bench caught the always-equijoin version at 29 s on sf0.1's
    templated corpus — Σ freq² explodes exactly when the vocabulary is
    small): a bounded incidence tile → dense matmul with the containment
    score/mask when it fits, else the fully-distributed shingle equijoin
    + per-pair count, then a division by the SIDE-A set size only. For
    web scale, candidates from MinHash banding can pre-filter the pair
    space the same way.
    """
    doc_sets = _register_cache(doc_hash_sets(df, k, text_col, id_col).persist())
    n_vocab, n_docs = _route_stats(doc_sets)  # one job, materializes cache
    if n_vocab <= 200_000 and n_docs * n_vocab <= MAX_DENSE_CELLS:
        return _ngram_jaccard_dense(
            doc_sets, threshold, id_col, n_vocab, n_docs, metric="containment"
        )
    sh = doc_sets.select(id_col, F.explode("_hs").alias("shingle"))
    sizes = doc_sets.select(id_col, F.size("_hs").alias("n"))
    # unordered shared-shingle counts from the hot-key-hardened core;
    # containment is DIRECTIONAL, so mirror each pair (same c both ways)
    und = _pair_shingle_counts(sh, id_col)
    common = und.unionByName(
        und.select(
            F.col("id_b").alias("id_a"), F.col("id_a").alias("id_b"), "c"
        )
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    cont = F.col("c") / F.col("na")
    out = (
        common.join(sa, "id_a")
        .filter(cont >= F.lit(threshold))
        .select("id_a", "id_b", F.round(cont, 6).alias("containment"))
    )
    # materialize while the set cache is hot, then release it (the same
    # eager-pairs pattern as the dense jaccard path: survivors are tiny)
    out = _register_cache(out.persist())
    out.count()
    doc_sets.unpersist()
    return out


def containment_pairs_sql(
    table: str,
    k: int = 5,
    threshold: float = 0.7,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror over raw string shingles (hash-free, so the Spark
    side's internal hashing stays free to change)."""
    sh = _shingles_sql(table, k, text_col, id_col)  # already DISTINCT
    return f"""
WITH sh AS ({sh}),
sizes AS (SELECT {id_col}, count(*) AS n FROM sh GROUP BY {id_col}),
common AS (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b, count(*) AS c
  FROM sh a JOIN sh b ON a.shingle = b.shingle
  WHERE a.{id_col} <> b.{id_col}
  GROUP BY 1, 2
)
SELECT id_a, id_b, round(c * 1.0 / sa.n, 6) AS containment
FROM common JOIN sizes sa ON common.id_a = sa.{id_col}
WHERE c * 1.0 / sa.n >= {threshold}
""".strip()


# ------------------------------------------------------- minhash + LSH ---

MINHASH_PERMS = 32
MINHASH_BANDS = 8  # 8 bands x 4 rows


def minhash_signatures(
    df: DataFrame,
    k: int = 5,
    num_perm: int = MINHASH_PERMS,
    text_col: str = "text",
    id_col: str = "doc_id",
    doc_sets: DataFrame | None = None,
) -> DataFrame:
    """(id, h0..h{n-1}) MinHash signature; permutation j is the min over
    the document's distinct shingle hashes of a j-seeded splitmix64 mix —
    the universal-hashing form (one base hash per shingle, then j-seeded
    mixes of the fixed-width base) used by standard MinHash libraries.

    Arrow-vectorized, ZERO shuffle (r4): signatures derive from the same
    cached per-doc hash-set table every other dedup consumer reads
    (``doc_sets`` — pass the persisted frame to share one corpus text
    scan), mixed per permutation in one numpy pass (segment mins via
    ``minimum.reduceat``). The previous formulation — shingle explode →
    xxhash per permutation → 32-column min groupBy — re-scanned and
    re-exploded the corpus text and moved every shingle hash through a
    map-side-combined exchange; measured ~5 s of the sf0.1 minhash wall
    time against ~1 s for this path. Hash values are engine-internal
    (banding recall statistics only — the checked output is the
    exact-verified pair list), so the mix family is free to change.
    Documents with no k-shingle are absent, matching the old explode
    semantics."""
    import numpy as np
    import pandas as pd

    ds = (
        doc_sets
        if doc_sets is not None
        else doc_hash_sets(df, k, text_col, id_col)
    )
    schema = f"{id_col} long, " + ", ".join(
        f"h{j} long" for j in range(num_perm)
    )
    c1 = np.uint64(0xBF58476D1CE4E5B9)
    c2 = np.uint64(0x94D049BB133111EB)
    golden = np.uint64(0x9E3779B97F4A7C15)
    seeds = golden * np.arange(1, num_perm + 1, dtype=np.uint64)

    def sigs(batches):
        with np.errstate(over="ignore"):
            for b in batches:
                keep = [
                    (i, np.asarray(x, dtype=np.int64).view(np.uint64))
                    for i, x in enumerate(b["_hs"])
                    if len(x)
                ]
                if not keep:
                    continue
                idx, sets = zip(*keep)
                lens = np.fromiter(
                    (len(s) for s in sets), dtype=np.int64, count=len(sets)
                )
                starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
                flat = np.concatenate(sets)
                cols = {id_col: b[id_col].iloc[list(idx)].to_numpy()}
                for j in range(num_perm):
                    z = flat + seeds[j]
                    z = (z ^ (z >> np.uint64(30))) * c1
                    z = (z ^ (z >> np.uint64(27))) * c2
                    z = z ^ (z >> np.uint64(31))
                    cols[f"h{j}"] = np.minimum.reduceat(z, starts).view(
                        np.int64
                    )
                yield pd.DataFrame(cols)

    return ds.mapInPandas(sigs, schema=schema)


def minhash_lsh_pairs(
    df: DataFrame,
    k: int = 5,
    threshold: float = 0.7,
    num_perm: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via LSH banding + signature-estimate pruning + exact
    jaccard verification — the standard three-stage MinHash pipeline.

    1. **Banding:** hash each band of the signature, join documents sharing
       any (band, hash) bucket. On dup-heavy corpora buckets are large, so
       banding alone over-generates (measured ~56k candidates for 256 real
       pairs at sf0.1).
    2. **Estimate pruning:** the signature itself estimates jaccard
       (matching permutations / num_perm); candidates with estimate below
       ``threshold − 0.2`` are dropped before the expensive exact pass —
       a column-only join that removes ~99% of false candidates.
    3. **Exact verification:** shingle jaccard on the survivors only (and
       only survivor documents are re-shingled).

    Same output schema as :func:`ngram_jaccard_pairs`. Recall is the
    banding curve (8×4 ⇒ ≈1-(1-j⁴)⁸, >99.9% at j≥0.8) times the estimate
    filter's pass rate (P(Binom(32,j)/32 ≥ j−0.2); >99.9% at j≥0.8) —
    both ≈1 in the dup regime LSH targets; exactness below j≈0.75 is
    explicitly traded, as any LSH configuration trades it.
    """
    # ONE corpus text scan total (r4): the per-doc hash-set table feeds
    # BOTH the signature mix and the exact verification — previously the
    # signature stage exploded/rescanned the corpus on its own.
    doc_sets = doc_hash_sets(df, k, text_col, id_col).persist()
    sig = minhash_signatures(
        df, k, num_perm, text_col, id_col, doc_sets=doc_sets
    )
    # The full signature ARRAY rides along through banding so the estimate
    # prune applies INSIDE the band join. The earlier staging (bare-id
    # candidates → distinct → two wide joins back to the signature table)
    # paid a distinct over the RAW candidate stream and two more
    # signature shuffles; dup-heavy corpora generate ~100× more banding
    # collisions than survivors (measured 237k → 2.7k at sf0.1), so
    # pruning first and distinct-ing the survivor trickle wins. The
    # banding shuffle grows by num_perm longs per row — linear in docs,
    # while the joins it replaces are linear in candidate pairs, which is
    # the quantity that explodes on exactly the corpora dedup targets.
    banded = _banded(sig, num_perm, bands, id_col)

    est_floor = max(0.0, threshold - 0.2)
    a = banded.alias("a")
    b = banded.alias("b")
    est_matches = F.aggregate(
        F.zip_with(
            F.col("a._sig"),
            F.col("b._sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    survivors = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .filter(est_matches >= F.lit(est_floor * num_perm))
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
        # the verifier references the survivor set three times (both sides
        # of the id union + the pair join); persist so banding + estimate
        # stages execute once, not per reference
        .persist()
    )
    survivors = _register_cache(survivors)
    # eager: the verifier's references run in concurrent broadcast-build
    # jobs — a cold cache would recompute the banding join per reference
    survivors.count()

    # stage 3: exact verification restricted to survivors, served from the
    # SAME cached hash-set table the signatures came from
    out = _verify_candidate_jaccard(
        survivors,
        df.select(id_col, text_col),
        k,
        threshold,
        text_col,
        id_col,
        doc_sets=doc_sets,
    )
    # safe release: _verify eagerly materialized its semi-joined hs cache,
    # so the returned plan no longer pulls through doc_sets (re-derivable
    # only on cache eviction — the normal recovery path)
    doc_sets.unpersist()
    return out


def _banded(sig: DataFrame, num_perm: int, bands: int, id_col: str) -> DataFrame:
    """Signature rows → exploded (id, band, bucket, _sig) banding stream —
    the shared shape of the full and incremental LSH joins."""
    rows_per_band = num_perm // bands
    band_cols = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                *[
                    F.col(f"h{b * rows_per_band + r}")
                    for r in range(rows_per_band)
                ]
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    return sig.select(
        F.col(id_col),
        F.explode(F.array(*band_cols)).alias("bb"),
        F.array(*[F.col(f"h{j}") for j in range(num_perm)]).alias("_sig"),
    ).select(
        id_col,
        F.col("bb.band").alias("band"),
        F.col("bb.bucket").alias("bucket"),
        "_sig",
    )


def minhash_lsh_pairs_delta(
    all_docs: DataFrame,
    base_sigs: DataFrame,
    delta_docs: DataFrame,
    k: int = 5,
    threshold: float = 0.7,
    num_perm: int = MINHASH_PERMS,
    bands: int = MINHASH_BANDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    delta_sigs: DataFrame | None = None,
) -> DataFrame:
    """INCREMENTAL near-dup detection: all pairs (jaccard ≥ threshold,
    LSH recall) touching a NEWLY-ARRIVED document slice, without ever
    re-shingling or re-signing the existing corpus — the daily job of a
    production training-data pipeline (dedup today's crawl against the
    accumulated corpus).

    Inputs make the incrementality explicit: ``base_sigs`` is the
    PERSISTED signature table of the pre-existing docs (maintained
    alongside the corpus — see the versioned-table contract query),
    ``delta_docs`` are the new arrivals (the only text shingled and
    signed this run), ``all_docs`` is consulted exclusively to
    re-shingle the bounded candidate set during exact verification.
    The band join probes DELTA signatures against the UNION of base and
    delta signatures, so cost scales with |delta| × bucket sizes, not
    |corpus|²; estimate pruning and exact verification are identical to
    :func:`minhash_lsh_pairs`. Output (id_a, id_b, jaccard), id_a <
    id_b, at least one side new; delta×delta duplicates collapse via
    the post-join distinct. Pass ``delta_sigs`` (e.g. a persisted frame
    the caller also commits to the signature index) to avoid signing the
    delta twice — otherwise the delta is signed once here and cached for
    the duration of the probe (both band-join sides reference it)."""
    own_cache = delta_sigs is None
    sig_delta = (
        delta_sigs
        if delta_sigs is not None
        else minhash_signatures(
            delta_docs, k, num_perm, text_col, id_col
        ).persist()
    )
    all_sigs = base_sigs.unionByName(sig_delta)
    a = _banded(sig_delta, num_perm, bands, id_col).alias("a")
    b = _banded(all_sigs, num_perm, bands, id_col).alias("b")
    est_matches = F.aggregate(
        F.zip_with(
            F.col("a._sig"),
            F.col("b._sig"),
            lambda x, y: F.when(x == y, 1).otherwise(0),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    est_floor = max(0.0, threshold - 0.2)
    survivors = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .filter(est_matches >= F.lit(est_floor * num_perm))
        .select(
            F.least(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias("id_a"),
            F.greatest(
                F.col(f"a.{id_col}"), F.col(f"b.{id_col}")
            ).alias("id_b"),
        )
        .distinct()
        .persist()
    )
    survivors = _register_cache(survivors)
    survivors.count()  # same concurrent-broadcast-build guard as the full path
    if own_cache:
        # survivors are materialized; the verify plan below reads docs,
        # not signatures — safe to release the internal delta-sig cache
        sig_delta.unpersist()
    return _verify_candidate_jaccard(
        survivors,
        all_docs.select(id_col, text_col),
        k,
        threshold,
        text_col,
        id_col,
    )


# ------------------------------------------------------------- simhash ---


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash per document: bit b of the signature = sign of
    Σ_tokens (2·bit_b(hash(token)) − 1); zero-token documents get sig 0.

    One Arrow pass, no explode/shuffle at all: each batch tokenizes its
    documents (lowercase whitespace split, empties dropped), hashes tokens
    with memoized md5-64 (real corpora have Zipfian vocabularies — the memo
    hits constantly), unpacks hash bits into a (tokens × 64) ±1 matrix and
    sums per document in numpy. The earlier pure-Column formulation
    (explode + 64 sum-aggregates) shuffled a token-level table and built a
    64-wide aggregate — ~4× slower at sf0.1.

    The token hash is the FIRST 8 BYTES OF md5(token), big-endian — chosen
    because every engine has md5, so the whole signature pipeline is
    mirrored exactly in portable SQL (:func:`simhash64_sql`) and the driver
    gets a full value oracle instead of a rows-only check.
    """
    import hashlib

    import numpy as np
    import pandas as pd

    memo: dict[str, int] = {}

    def tok_hash(tok: str) -> int:
        h = memo.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
            memo[tok] = h
        return h

    shifts = np.arange(64, dtype=np.uint64)

    def batch_simhash(batches):
        for pdf in batches:
            ids, sigs = [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                if text is None:
                    continue
                toks = str(text).lower().split()
                if not toks:
                    ids.append(doc_id)
                    sigs.append(0)
                    continue
                hashes = np.fromiter(
                    (tok_hash(t) for t in toks), dtype=np.uint64, count=len(toks)
                )
                bits = ((hashes[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
                votes = (2 * bits - 1).sum(axis=0)
                sig = np.uint64(0)
                for b in np.nonzero(votes > 0)[0]:
                    sig |= np.uint64(1) << np.uint64(b)
                ids.append(doc_id)
                sigs.append(int(sig.astype(np.int64)))  # two's-complement long
            yield pd.DataFrame({id_col: ids, "simhash": sigs})

    return spread(df.select(id_col, text_col)).mapInPandas(
        batch_simhash, schema=f"{id_col} long, simhash long"
    )


def _hex_int_sql(expr: str) -> str:
    """8-hex-char string → BIGINT (portable fold, no engine hex casts)."""
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(split({expr}, ''), "
        f"c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT))), "
        f"(a, d) -> a * 16 + d)"
    )


def simhash64_sql(table: str, text_col: str = "text", id_col: str = "doc_id") -> str:
    """DuckDB mirror of :func:`simhash64` — same md5-derived token hash,
    same majority vote, bit arithmetic in two 32-bit halves (64-bit shifts
    overflow DuckDB's checked ``<<``), recombined into the same
    two's-complement BIGINT the Spark path emits."""
    cnt_cols = ", ".join(
        f"sum((lo >> {b}) & 1) AS c{b}" for b in range(32)
    ) + ", " + ", ".join(f"sum((hi >> {b - 32}) & 1) AS c{b}" for b in range(32, 64))
    sig_lo = " + ".join(
        f"CASE WHEN 2 * c{b} > n THEN CAST(1 AS BIGINT) << {b} ELSE 0 END"
        for b in range(32)
    )
    sig_hi = " + ".join(
        f"CASE WHEN 2 * c{b} > n THEN CAST(1 AS BIGINT) << {b - 32} ELSE 0 END"
        for b in range(32, 64)
    )
    return f"""
WITH toks AS (
  SELECT {id_col}, t FROM (
    SELECT {id_col}, unnest(string_split_regex(lower({text_col}), '\\s+')) AS t
    FROM {table} WHERE {text_col} IS NOT NULL)
  WHERE t <> ''),
bits AS (
  SELECT {id_col},
         {_hex_int_sql("substr(md5(t), 1, 8)")} AS hi,
         {_hex_int_sql("substr(md5(t), 9, 8)")} AS lo
  FROM toks),
cnt AS (
  SELECT {id_col}, count(*) AS n, {cnt_cols}
  FROM bits GROUP BY {id_col}),
halves AS (
  SELECT {id_col}, ({sig_lo}) AS sig_lo, ({sig_hi}) AS sig_hi FROM cnt),
sig AS (
  SELECT d.{id_col},
         COALESCE(
           (h.sig_hi - CASE WHEN h.sig_hi >= 2147483648 THEN 4294967296 ELSE 0 END)
             * 4294967296 + h.sig_lo,
           0) AS simhash
  FROM (SELECT {id_col} FROM {table} WHERE {text_col} IS NOT NULL) d
  LEFT JOIN halves h USING ({id_col}))
SELECT {id_col}, simhash FROM sig
""".strip()


def simhash_pairs_sql(
    table: str,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """Full value oracle for :func:`simhash_pairs`: O(n²) hamming scan over
    the SQL-computed signatures. The Spark path's 4×16-bit banding is
    mathematically lossless at hamming ≤ 3 (pigeonhole), so the outputs are
    identical, not approximately equal."""
    sig = simhash64_sql(table, text_col, id_col)
    return f"""
WITH sigs AS ({sig})
SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM sigs a JOIN sigs b ON a.{id_col} < b.{id_col}
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
""".strip()


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Pairs with hamming(simhash) ≤ max_hamming. Candidates via the 4×16-bit
    band pigeonhole (≤3 differing bits ⇒ ≥1 of 4 bands identical), verified
    with ``bit_count(xor)`` — no O(n²) scan."""
    sig = simhash64(df, text_col, id_col)
    bands = [
        F.struct(
            F.lit(i).alias("band"),
            F.shiftright(F.col("simhash"), i * 16)
            .bitwiseAND(F.lit(0xFFFF))
            .alias("chunk"),
        )
        for i in range(4)
    ]
    banded = sig.select(
        F.col(id_col), F.col("simhash"), F.explode(F.array(*bands)).alias("bb")
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.chunk").alias("chunk"))
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, on=["band", "chunk"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.col("a.simhash").alias("sim_a"),
            F.col("b.simhash").alias("sim_b"),
        )
        .distinct()
        .withColumn(
            "hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b")))
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# ------------------------------------------------ embedding cosine dups --


def _dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with per-element double casts, strict left-to-right — the
    same association order as the SQL mirror, so results are bit-exact."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, list_transform(list_zip({a}, {b}), "
        f"p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), (x, y) -> x + y)"
    )


# One broadcast tile of the embedding matrix holds at most this many rows
# (500k × 64 dims × 8 B ≈ 256 MiB); the corpus streams against each tile.
MAX_EMB_BLOCK_ROWS = 500_000


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine near-duplicate pairs (id_a < id_b, cosine ≥ t).

    Execution adapts to corpus size, and NEITHER path is a serial driver
    loop (the r3 revision materialized multi-tile broadcasts one at a time
    on the driver — the same driver-throughput bottleneck the dense-jaccard
    path had):

    * **Single tile** (≤ ``MAX_EMB_BLOCK_ROWS`` vectors): the tile is
      collected once, broadcast, and the corpus streams through
      ``mapInPandas`` — one float64 matmul per Arrow batch, corpus side
      never shuffles.
    * **Multi-tile**: fully-distributed block matmul. Both sides are
      hash-assigned to a T×T tile grid (T = ceil(n / block_rows)): the
      a-side replicates across its grid ROW, the b-side across its grid
      COLUMN, and a ``cogroup().applyInPandas`` meets each (a-tile,
      b-tile) cell in ONE executor task — each (a, b) vector pair meets in
      exactly one cell, ``id_a < id_b`` dedupes within it. Shuffle volume
      is 2·n·T rows, the textbook replication cost of distributed block
      matrix multiply; the driver never materializes anything.

    O(n²/P) work per executor is inherent to EXACT all-pairs — the
    sub-quadratic scale path is the LSH/IVF bucketing in
    functions/similarity.py.

    Float64 matmul accumulation may differ from strictly-sequential
    summation in the last ulp; outputs are rounded to 6dp (shared with the
    SQL oracle) which absorbs it.
    """
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    # persist the slim projection: it is referenced by the sizing count
    # PLUS the tile collect and the streaming map side (single-tile) or
    # both replicated grid sides (multi-tile) — without the cache an
    # upstream that is itself an aggregation (e.g. the hashing-trick
    # embedding build) re-runs its shuffle once per reference (r14;
    # measured 3 evaluations). Cache-managed and recomputable, released
    # with the module's other internal caches.
    slim = _register_cache(df.select(id_col, vec_col).persist())
    n = slim.count()

    def pair_block(a_ids, a_mat, b_ids, b_mat):
        a_norms = np.sqrt((a_mat * a_mat).sum(axis=1))
        b_norms = np.sqrt((b_mat * b_mat).sum(axis=1))
        sims = (a_mat @ b_mat.T) / np.outer(a_norms, b_norms)
        keep_a, keep_b = np.where(
            (sims >= threshold) & (a_ids[:, None] < b_ids[None, :])
        )
        return pd.DataFrame(
            {
                "id_a": a_ids[keep_a],
                "id_b": b_ids[keep_b],
                "cosine": np.round(sims[keep_a, keep_b], 6),
            }
        )

    if n <= MAX_EMB_BLOCK_ROWS:
        pdf = slim.toPandas()
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
        bc = spark.sparkContext.broadcast((ids, mat))

        def block(batches, _bc=bc):
            b_ids, b_mat = _bc.value
            for batch in batches:
                a_ids = batch[id_col].to_numpy()
                a_mat = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
                yield pair_block(a_ids, a_mat, b_ids, b_mat)

        return spread(slim).mapInPandas(
            block, schema="id_a long, id_b long, cosine double"
        )

    n_tiles = -(-n // MAX_EMB_BLOCK_ROWS)
    grid = F.array(*[F.lit(t) for t in range(n_tiles)])
    tile_of = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_tiles)).cast("int")
    a_rep = slim.withColumn("_ta", tile_of).withColumn(
        "_tb", F.explode(grid)
    )
    b_rep = slim.withColumn("_tb", tile_of).withColumn(
        "_ta", F.explode(grid)
    )

    def cell(a_pdf: "pd.DataFrame", b_pdf: "pd.DataFrame") -> "pd.DataFrame":
        if not len(a_pdf) or not len(b_pdf):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []})
        a_ids = a_pdf[id_col].to_numpy()
        a_mat = np.stack(a_pdf[vec_col].to_numpy()).astype(np.float64)
        b_ids = b_pdf[id_col].to_numpy()
        b_mat = np.stack(b_pdf[vec_col].to_numpy()).astype(np.float64)
        return pair_block(a_ids, a_mat, b_ids, b_mat)

    return (
        a_rep.groupby("_ta", "_tb")
        .cogroup(b_rep.groupby("_ta", "_tb"))
        .applyInPandas(cell, schema="id_a long, id_b long, cosine double")
    )


def embedding_neardup_pairs_sql(
    table: str,
    threshold: float = 0.4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> str:
    dot_ab = _dot_sql(f"a.{vec_col}", f"b.{vec_col}")
    dot_self = _dot_sql(vec_col, vec_col)
    return f"""
WITH e AS (SELECT {id_col}, {vec_col}, sqrt({dot_self}) AS nrm FROM {table})
SELECT id_a, id_b, round(cosine, 6) AS cosine FROM (
  SELECT a.{id_col} AS id_a, b.{id_col} AS id_b,
         {dot_ab} / (a.nrm * b.nrm) AS cosine
  FROM e a JOIN e b ON a.{id_col} < b.{id_col})
WHERE cosine >= {threshold}
""".strip()


# ------------------------------------------------- paragraph-level dedup --


def paragraph_dedup_stats(
    df: DataFrame,
    chunk_tokens: int = 10,
    keep_threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """RefinedWeb-style paragraph-granular dedup: documents are split into
    disjoint ``chunk_tokens``-word "paragraphs" (the corpus has no newline
    structure, so the segmentation is word-aligned — the same convention as
    :func:`..functions.chunking.chunk_documents`, which this composes), each
    paragraph is fingerprinted, and a paragraph is DUPLICATED when its
    fingerprint occurs in more than one distinct document. Per document:

    * ``n_paragraphs`` — total chunks,
    * ``n_dup_paragraphs`` — chunks whose content appears in ≥2 docs,
    * ``dup_char_fraction`` — duplicated-paragraph characters / total
      paragraph characters (round 6), the RefinedWeb line-dedup signal,
    * ``keep`` — ``dup_char_fraction <= keep_threshold``.

    Beyond-reference surface (the reference has no text operators at all —
    SURVEY.md §2.5); doc-level exact/near dedup miners live above.

    Scale shape: chunking is a pure map stage (no shuffle); the
    paragraph-frequency table is one hash-partitioned groupBy on the md5
    fingerprint; the frequency join is keyed on the same fingerprint (no
    re-partition between the two); the per-doc rollup is one groupBy on
    ``id_col``. Three shuffles total, all on high-cardinality keys; no
    windows, no driver state. Boilerplate paragraphs (the exact hot-key
    case) only ever feed additive aggregates, so skew degrades one reduce
    task, not correctness, and AQE splits it.
    """
    from .chunking import chunk_documents

    chunks = chunk_documents(
        df, chunk_tokens=chunk_tokens, text_col=text_col, id_col=id_col
    ).select(
        id_col,
        F.md5(F.col("chunk_text")).alias("_fp"),
        F.length("chunk_text").alias("_clen"),
    )
    freq = (
        chunks.select(id_col, "_fp")
        .distinct()
        .groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_ndocs"))
    )
    dup = F.col("_ndocs") > 1
    return (
        chunks.join(freq, "_fp")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_paragraphs"),
            F.sum(dup.cast("int")).cast("int").alias("n_dup_paragraphs"),
            F.round(
                F.sum(F.when(dup, F.col("_clen")).otherwise(F.lit(0)))
                / F.sum("_clen"),
                6,
            ).alias("dup_char_fraction"),
        )
        .withColumn(
            "keep", F.col("dup_char_fraction") <= F.lit(keep_threshold)
        )
    )


def paragraph_dedup_stats_sql(
    table: str,
    chunk_tokens: int = 10,
    keep_threshold: float = 0.3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> str:
    """DuckDB mirror of :func:`paragraph_dedup_stats` (exact integers plus
    one round-6 division)."""
    from .chunking import chunk_documents_sql

    chunks_sql = chunk_documents_sql(
        table, chunk_tokens=chunk_tokens, text_col=text_col, id_col=id_col
    )
    return f"""
WITH chunks AS (
  SELECT {id_col}, md5(chunk_text) AS fp, len(chunk_text) AS clen
  FROM ({chunks_sql})
),
freq AS (
  SELECT fp, count(*) AS ndocs
  FROM (SELECT DISTINCT {id_col}, fp FROM chunks) GROUP BY fp
)
SELECT {id_col},
       CAST(count(*) AS INT) AS n_paragraphs,
       CAST(sum(CASE WHEN ndocs > 1 THEN 1 ELSE 0 END) AS INT)
         AS n_dup_paragraphs,
       round(CAST(sum(CASE WHEN ndocs > 1 THEN clen ELSE 0 END) AS DOUBLE) / sum(clen), 6)
         AS dup_char_fraction,
       round(CAST(sum(CASE WHEN ndocs > 1 THEN clen ELSE 0 END) AS DOUBLE) / sum(clen), 6)
         <= {keep_threshold} AS keep
FROM chunks JOIN freq USING (fp)
GROUP BY {id_col}
""".strip()
