"""Semantic tests for the LLM-pipeline operators: planted duplicates are
found, approximate paths agree with their exact twins, multimodal plumbing
produces typed batches, and streaming rule evaluation matches batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dynamicqueryengine_spark.functions import dedup as D
from dynamicqueryengine_spark.functions import multimodal as M
from dynamicqueryengine_spark.functions import similarity as S
from dynamicqueryengine_spark.functions import text as T

from .conftest import SF_DIR


@pytest.fixture(scope="module")
def docs(spark):
    from dynamicqueryengine_spark.sources.registry import load_table

    return load_table(spark, SF_DIR, "documents")


@pytest.fixture(scope="module")
def embs(spark):
    from dynamicqueryengine_spark.sources.registry import load_table

    return load_table(spark, SF_DIR, "embeddings")


@pytest.fixture(scope="module")
def planted(spark):
    """Tiny corpus with exact dups (1,2), a near-dup pair (3,4), and
    unrelated docs."""
    base = "the quick brown fox jumps over the lazy dog and runs far away home"
    near = base.replace("lazy", "sleepy")
    rows = [
        (1, base),
        (2, base.upper()),          # exact dup after normalization? no—case folds, yes
        (3, base + " tail"),
        (4, near + " tail"),
        (5, "completely different content about spark query engines at scale"),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


class TestExactDedup:
    def test_planted_exact_dup_collapses(self, planted):
        kept = D.exact_dedup_keep(planted)
        ids = {r["doc_id"] for r in kept.collect()}
        assert 1 in ids and 2 not in ids  # case-insensitive exact dup
        assert {3, 4, 5} <= ids

    def test_assign_schema(self, planted):
        out = D.exact_dedup_assign(planted)
        assert out.columns == ["doc_id", "fingerprint", "canonical_id"]


class TestNgramJaccard:
    def test_near_dup_found_unrelated_not(self, planted):
        pairs = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(planted, k=5, threshold=0.5).collect()
        }
        assert (3, 4) in pairs
        assert all(5 not in p for p in pairs)

    def test_three_routes_identical_pairs(self, docs, monkeypatch):
        """Driver-BLAS, broadcast-mapInPandas, and equijoin formulations
        must emit the identical pair set. Also pins the r4 design change:
        anything beyond ONE dense tile routes to the equijoin — there is no
        multi-tile serial driver loop to diverge."""
        def pairs():
            return sorted(
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in D.ngram_jaccard_pairs(
                    docs, k=5, threshold=0.5
                ).collect()
            )

        blas = pairs()  # small input: flops gate admits the driver matmul
        monkeypatch.setattr(D, "DRIVER_MATMUL_MAX_FLOPS", 0)
        distributed = pairs()  # same tile via broadcast + mapInPandas
        monkeypatch.setattr(D, "MAX_DENSE_CELLS", 0)
        equijoin = pairs()  # dense gate closed entirely
        assert blas and blas == distributed == equijoin

    def test_oversize_input_routes_to_equijoin(self, docs, monkeypatch):
        """When the incidence matrix exceeds one tile, the plan must be the
        fully-distributed equijoin (a real join on the exploded shingle
        stream — the dense path has no join at all; its pair set arrives
        pre-materialized from the tile matmul). The only Python stage in
        the equijoin plan is the row-local shingle hasher."""
        monkeypatch.setattr(D, "MAX_DENSE_CELLS", 0)
        plan = D.ngram_jaccard_pairs(
            docs, k=5, threshold=0.5
        )._jdf.queryExecution().executedPlan().toString()
        assert (
            "SortMergeJoin" in plan
            or "ShuffledHashJoin" in plan
            or "BroadcastHashJoin" in plan
        )
        assert "Generate explode" in plan or "explode" in plan

    def test_salted_hot_branch_matches_plain(self, docs, monkeypatch):
        """Hot-shingle skew hardening (r9): with the fair-share cut
        zeroed and the floor forced to 1 every shingle routes through
        the triangle-salted branch, and with the floor forced huge
        everything takes the plain branch — identical pair sets either
        way (the sf0.1 skew probe pins the task-spread win; this pins
        semantics)."""
        monkeypatch.setattr(D, "MAX_DENSE_CELLS", 0)  # force equijoin route

        def pairs():
            return sorted(
                (r["id_a"], r["id_b"], r["jaccard"])
                for r in D.ngram_jaccard_pairs(
                    docs, k=5, threshold=0.5
                ).collect()
            )

        monkeypatch.setattr(D, "HOT_SHINGLE_FREQ", 1 << 60)
        plain = pairs()
        monkeypatch.setattr(D, "HOT_SHINGLE_FREQ", 1)
        monkeypatch.setattr(D, "HOT_WORK_SHARE", 0.0)
        salted = pairs()
        assert plain and salted == plain
        # containment shares the hardened core — pin it too
        def cont():
            return sorted(
                (r["id_a"], r["id_b"], r["containment"])
                for r in D.containment_pairs(
                    docs, k=5, threshold=0.5
                ).collect()
            )

        monkeypatch.setattr(D, "HOT_SHINGLE_FREQ", 1 << 60)
        monkeypatch.setattr(D, "HOT_WORK_SHARE", 1.0)
        plain_c = cont()
        monkeypatch.setattr(D, "HOT_SHINGLE_FREQ", 1)
        monkeypatch.setattr(D, "HOT_WORK_SHARE", 0.0)
        assert plain_c and cont() == plain_c

    def test_fair_share_cut_keeps_plain_plan_on_moderate_keys(
        self, docs, monkeypatch
    ):
        """Many-moderate-keys corpora (small vocab, no single straggler
        key) must compile to the PLAIN equijoin — no salted exchange, no
        ×2g replication (the r9 regression: an absolute cut routed 99%
        of a small-vocab corpus through the salted branch, 5-8× slower
        than plain at sf0.1)."""
        monkeypatch.setattr(D, "MAX_DENSE_CELLS", 0)
        # floor of 1 but full fair-share term: the tiny fixture corpus
        # has no key above one reducer's share, so no hot branch
        monkeypatch.setattr(D, "HOT_SHINGLE_FREQ", 1)
        sh = D.raw_shingles(docs, k=5)
        out = D._pair_shingle_counts(sh, "doc_id")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "Union" not in plan  # single-branch plain plan
        assert out.count() > 0
        D.release_internal_caches()

    def test_minhash_matches_exact_on_real_docs(self, docs):
        """LSH candidates + exact verification should recover the exact
        pairs at jaccard ≥ 0.7 on the driver's documents table (the planted
        near-dup cluster sits at ≥0.92 where 8×4 banding recall ≈ 1)."""
        exact = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in D.ngram_jaccard_pairs(docs, k=5, threshold=0.7).collect()
        }
        approx = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in D.minhash_lsh_pairs(docs, k=5, threshold=0.7).collect()
        }
        assert approx == exact  # full recall at this threshold band

    def test_incremental_delta_matches_full_restricted(self, spark, docs):
        """The incremental path (sign only the delta, probe against the
        persisted base signatures) must produce exactly the full path's
        pairs restricted to delta-touching ones — same banding, same
        estimate floor, same exact verification, so equality is by
        construction; this pins the probe-side plumbing (union, !=
        filter, least/greatest normalization, distinct)."""
        is_new = F.col("doc_id") % 4 == 0
        base = docs.filter(~is_new)
        delta = docs.filter(is_new)
        base_sigs = D.minhash_signatures(base)
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in D.minhash_lsh_pairs_delta(
                docs, base_sigs, delta, k=5, threshold=0.7
            ).collect()
        }
        full = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in D.minhash_lsh_pairs(docs, k=5, threshold=0.7).collect()
            if r["id_a"] % 4 == 0 or r["id_b"] % 4 == 0
        }
        assert got == full
        assert got  # the planted near-dup cluster must cross the split

    def test_release_internal_caches_drops_miner_frames(self, docs):
        """The miners persist internal frames (survivor candidate sets,
        semi-joined hash-set caches) that must outlive the call, so they
        register them instead of unpersisting in-function; long-running
        processes drop them with release_internal_caches(). The r8 verdict
        found _register_cache had zero call sites — this pins the wired-up
        mechanism: registration happens, release resets storage levels,
        and released results recompute transparently."""
        D.release_internal_caches()  # drain registrations from prior tests
        out = D.minhash_lsh_pairs(docs, k=5, threshold=0.7)
        n = out.count()
        frames = list(D._INTERNAL_CACHES)
        assert frames, "miners must register their internal persists"
        assert any(
            f.storageLevel.useMemory or f.storageLevel.useDisk for f in frames
        )
        D.release_internal_caches()
        assert not D._INTERNAL_CACHES
        for f in frames:
            assert not f.storageLevel.useMemory and not f.storageLevel.useDisk
        assert out.count() == n  # recomputes transparently after release


class TestContainment:
    def test_subset_doc_is_contained_not_jaccard_near(self, spark):
        body = (
            "the quick brown fox jumps over the lazy dog while the band "
            "plays on and the crowd watches in silence near the old pier"
        )
        long_doc = body + (
            " meanwhile entirely different framing content continues for a "
            "while discussing spark query engines partition strategies "
            "shuffle behavior broadcast joins and adaptive execution plans"
        )
        df = spark.createDataFrame(
            [(1, body), (2, long_doc), (3, "unrelated text about nothing")],
            "doc_id long, text string",
        )
        cont = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in D.containment_pairs(df, k=5, threshold=0.8).collect()
        }
        jac = {
            (r["id_a"], r["id_b"])
            for r in D.ngram_jaccard_pairs(df, k=5, threshold=0.8).collect()
        }
        assert cont.get((1, 2), 0) >= 0.8   # short doc contained in long
        assert (2, 1) not in cont           # not the reverse direction
        assert (1, 2) not in jac            # jaccard misses the pair
        assert all(3 not in p for p in cont)

    def test_three_routes_identical_pairs(self, docs, monkeypatch):
        """Containment now rides the same adaptive machinery as jaccard
        (the r4 bench found the always-equijoin version 13× slower on the
        templated sf0.1 corpus): driver-BLAS, broadcast-mapInPandas, and
        equijoin must emit the identical directional pair set."""

        def pairs():
            return sorted(
                (r["id_a"], r["id_b"], r["containment"])
                for r in D.containment_pairs(
                    docs, k=5, threshold=0.8
                ).collect()
            )

        blas = pairs()
        monkeypatch.setattr(D, "DRIVER_MATMUL_MAX_FLOPS", 0)
        distributed = pairs()
        monkeypatch.setattr(D, "MAX_DENSE_CELLS", 0)
        equijoin = pairs()
        assert blas and blas == distributed == equijoin

    def test_directionality_and_no_self_pairs(self, spark):
        df = spark.createDataFrame(
            [(1, "aaaa bbbb cccc dddd eeee"), (2, "aaaa bbbb cccc dddd eeee")],
            "doc_id long, text string",
        )
        cont = {
            (r["id_a"], r["id_b"]): r["containment"]
            for r in D.containment_pairs(df, k=5, threshold=0.5).collect()
        }
        # identical docs contain each other in BOTH directions, never self
        assert cont == {(1, 2): 1.0, (2, 1): 1.0}


class TestSimhash:
    def test_exact_dups_have_zero_hamming(self, planted):
        pairs = {
            (r["id_a"], r["id_b"]): r["hamming"]
            for r in D.simhash_pairs(planted, max_hamming=3).collect()
        }
        assert pairs.get((1, 2)) == 0  # same tokens after normalization

    def test_signature_is_deterministic(self, planted):
        a = {r["doc_id"]: r["simhash"] for r in D.simhash64(planted).collect()}
        b = {r["doc_id"]: r["simhash"] for r in D.simhash64(planted).collect()}
        assert a == b


class TestEmbeddingNeardupTiling:
    def test_multi_tile_grid_matches_single_tile(self, embs, monkeypatch):
        """The distributed T×T block-matmul grid (multi-tile path) must
        emit the identical pair set as the single-tile broadcast path —
        and do it without any driver-side tile loop."""
        single = sorted(
            map(tuple, D.embedding_neardup_pairs(embs, threshold=0.4).collect())
        )
        monkeypatch.setattr(D, "MAX_EMB_BLOCK_ROWS", 7)  # force many tiles
        multi = sorted(
            map(tuple, D.embedding_neardup_pairs(embs, threshold=0.4).collect())
        )
        assert single and single == multi

    def test_multi_tile_plan_has_no_driver_collect(self, embs, monkeypatch):
        monkeypatch.setattr(D, "MAX_EMB_BLOCK_ROWS", 7)
        plan = D.embedding_neardup_pairs(
            embs, threshold=0.4
        )._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapCoGroupsInPandas" in plan


class TestSimilarity:
    def test_topk_shape_and_rank(self, embs):
        queries = embs.filter(F.col("vec_id") < 3)
        out = S.cosine_topk(embs, queries, k=5).collect()
        by_query = {}
        for r in out:
            by_query.setdefault(r["query_id"], []).append(r)
        assert set(by_query) == {0, 1, 2}
        for rows in by_query.values():
            ranks = sorted(r["rank"] for r in rows)
            assert ranks == [1, 2, 3, 4, 5]
            cosines = [r["cosine"] for r in sorted(rows, key=lambda r: r["rank"])]
            assert cosines == sorted(cosines, reverse=True)
            assert all(r["neighbor_id"] != r["query_id"] for r in rows)

    def test_lsh_results_subset_of_bucket_and_deterministic(self, embs):
        queries = embs.filter(F.col("vec_id") < 3)
        a = sorted(map(tuple, S.lsh_topk(embs, queries, k=5).collect()))
        b = sorted(map(tuple, S.lsh_topk(embs, queries, k=5).collect()))
        assert a == b and len(a) > 0

    def test_lsh_top1_recall_vs_exact(self, embs):
        """Bucketed ANN should still find strong top-1 matches for most
        queries that share a bucket with their true neighbor."""
        queries = embs.filter(F.col("vec_id") < 10)
        exact = {
            r["query_id"]: r["neighbor_id"]
            for r in S.cosine_topk(embs, queries, k=1).collect()
        }
        approx = {
            r["query_id"]: r["neighbor_id"]
            for r in S.lsh_topk(embs, queries, k=1, bits=4).collect()
        }
        hits = sum(1 for q, n in approx.items() if exact.get(q) == n)
        assert hits >= len(approx) * 0.2  # lenient: recall is the documented trade


class TestMultimodal:
    def test_blob_schema_and_features(self, docs):
        blobs = M.attach_blob(docs)
        assert [f.name for f in blobs.schema.fields] == ["doc_id", "payload", "metadata"]
        assert blobs.schema["payload"].dataType.typeName() == "binary"
        feats = M.extract_blob_features(blobs.limit(20))
        rows = feats.collect()
        assert len(rows) == 20
        assert all(
            r["decoded"] == "stub" and len(r["payload_md5"]) == 32 for r in rows
        )

    def test_metadata_filter_prunes(self, docs):
        blobs = M.attach_blob(docs)
        small = M.filter_by_metadata(blobs, max_size_bytes=100)
        assert small.count() < blobs.count()

    def test_decode_guards_raise_without_libs(self):
        """Paths that NEED an absent media library must fail loudly; in a
        container WITH Pillow/soundfile these decoders are real and the
        guard assertions are skipped."""
        try:
            import PIL  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError):
                M.decode_image(b"x", "png")
            with pytest.raises(NotImplementedError):
                M.sample_frames(b"x", "mp4")
        try:
            import soundfile  # noqa: F401
        except ImportError:
            with pytest.raises(NotImplementedError):
                M.decode_audio(b"x", "mp3")  # non-WAV needs soundfile

    @pytest.mark.media
    def test_decode_image_real_when_pillow_present(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841 — skips cleanly here
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (3, 2), (255, 0, 0)).save(buf, format="PNG")
        out = M.decode_image(buf.getvalue(), "png")
        assert (out["width"], out["height"]) == (3, 2)
        assert len(out["pixels"]) == 3 * 2 * 3

    @pytest.mark.media
    def test_decode_audio_real_when_soundfile_present(self):
        sf = pytest.importorskip("soundfile")
        import io

        buf = io.BytesIO()
        sf.write(buf, [0.0, 0.5, -0.5, 0.25], 8000, format="FLAC",
                 subtype="PCM_16")
        out = M.decode_audio(buf.getvalue(), "flac")
        assert out["rate"] == 8000
        assert out["channels"] == 1
        assert len(out["samples"]) == 4

    @pytest.mark.media
    def test_frame_sampling_real_when_pillow_present(self):
        PIL = pytest.importorskip("PIL")  # noqa: F841
        import io

        from PIL import Image

        frames = [Image.new("P", (4, 4), i) for i in range(5)]
        buf = io.BytesIO()
        frames[0].save(
            buf, format="GIF", save_all=True, append_images=frames[1:]
        )
        sampled = M.sample_frames(buf.getvalue(), "gif", every_n=2)
        assert len(sampled) == 3  # frames 0, 2, 4

    def test_decode_audio_wav_is_real_stdlib(self):
        """PCM WAV decodes with NO external library: stdlib wave module.
        Round-trip the repo's own encoder and check exact samples."""
        import struct

        samples = struct.pack("<4h", 0, 1000, -1000, 32767)
        payload = M._encode_wav(1, 8000, samples)
        out = M.decode_audio(payload, "wav")
        assert out["rate"] == 8000
        assert out["channels"] == 1
        assert out["sample_width"] == 2
        assert out["samples"] == [0, 1000, -1000, 32767]

    def test_png_roundtrip(self, docs):
        parsed = M.parse_png_metadata(M.synthesize_png(docs.limit(25))).collect()
        assert len(parsed) == 25
        for r in parsed:
            assert r["crc_ok"] == "ok" and r["n_chunks"] == 3
            assert r["bit_depth"] == 8 and r["color_type"] == 0
            assert 1 <= r["width"] <= 16 and 1 <= r["height"] <= 16

    def test_png_parser_rejects_garbage(self, spark):
        import struct
        import zlib

        good = M._encode_png(2, 2, b"\x01\x02\x03\x04")
        # corrupt the IHDR crc without touching anything else
        bad_crc = bytearray(good)
        crc_off = len(M.PNG_SIG) + 8 + 13  # sig + len/tag + IHDR body
        bad_crc[crc_off] ^= 0xFF
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"not a png")), (3, None),
             (4, bad_crc)],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in M.parse_png_metadata(df).collect()}
        assert out[1]["crc_ok"] == "ok" and out[1]["width"] == 2
        assert out[2]["crc_ok"] == "not_png" and out[2]["width"] is None
        assert out[3]["crc_ok"] == "not_png"
        assert out[4]["crc_ok"] == "bad"
        # spot-check IHDR body length is where we think it is
        (ln,) = struct.unpack(">I", good[len(M.PNG_SIG):len(M.PNG_SIG) + 4])
        assert ln == 13 and zlib.crc32(b"") is not None

    def test_jpeg_roundtrip(self, docs):
        parsed = M.parse_jpeg_metadata(M.synthesize_jpeg(docs.limit(25))).collect()
        assert len(parsed) == 25
        for r in parsed:
            assert r["framing"] == "ok" and r["precision"] == 8
            assert 1 <= r["width"] <= 32 and 1 <= r["height"] <= 24
            assert r["n_components"] in (1, 3)
            assert r["n_segments"] == 3 + (1 if r["doc_id"] % 3 == 0 else 0)

    def test_jpeg_parser_rejects_garbage(self, spark):
        good = M._encode_jpeg(4, 3, 3, True, b"\x01" * 16)
        no_eoi = good[:-2]  # valid markers, missing EOI terminator
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"GIF89a junk")), (3, None),
             (4, bytearray(no_eoi))],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in M.parse_jpeg_metadata(df).collect()}
        assert out[1]["framing"] == "ok" and out[1]["width"] == 4
        assert out[1]["height"] == 3 and out[1]["n_components"] == 3
        assert out[2]["framing"] == "not_jpeg" and out[2]["width"] is None
        assert out[3]["framing"] == "not_jpeg"
        assert out[4]["framing"] == "bad" and out[4]["width"] == 4

    def test_wav_roundtrip(self, docs):
        parsed = M.parse_wav_metadata(M.synthesize_wav(docs.limit(25))).collect()
        assert len(parsed) == 25
        for r in parsed:
            assert r["status"] == "ok" and r["audio_format"] == 1
            assert r["channels"] in (1, 2) and r["bits_per_sample"] == 16
            assert r["sample_rate"] in (8000, 16000, 24000)
            assert 16 <= r["n_samples"] <= 256
            assert abs(
                r["duration_ms"] - r["n_samples"] * 1000.0 / r["sample_rate"]
            ) == 0.0

    def test_wav_parser_rejects_garbage(self, spark):
        good = M._encode_wav(2, 16000, b"\x00" * 64)
        truncated = good[:20]  # RIFF/WAVE ok, chunks cut off
        df = spark.createDataFrame(
            [(1, bytearray(good)), (2, bytearray(b"RIFFxxxxJUNK")), (3, None),
             (4, bytearray(truncated))],
            "doc_id long, payload binary",
        )
        out = {r["doc_id"]: r for r in M.parse_wav_metadata(df).collect()}
        assert out[1]["status"] == "ok" and out[1]["n_samples"] == 16
        assert out[2]["status"] == "not_wav"
        assert out[3]["status"] == "not_wav"
        assert out[4]["status"] == "bad"

    def test_bmp_roundtrip_undoes_physical_layout(self):
        """decode_bmp must undo BOTH physical-layout transforms: the
        bottom-up row order and the per-row 4-byte padding. Widths 4-8
        cover every padding amount (0-3 bytes); asymmetric row content
        makes a missing flip visible."""
        for w in (4, 5, 6, 7, 8):
            h = 5
            # period-251 content: md5 tiling repeats every 16 bytes, which
            # can make the flipped stream EQUAL the original when the row
            # stride aligns (w=8: 24·r mod 16 cycles 0,8,0,8 — palindromic
            # phases) — a prime period longer than the stream keeps every
            # row distinct
            px = bytes(i % 251 for i in range(w * h * 3))
            d = M.decode_bmp(M._encode_bmp(w, h, px))
            assert (d["width"], d["height"], d["bpp"]) == (w, h, 24)
            assert d["pixels"] == px  # exact logical byte stream back
            # flip sensitivity: rows in physical (bottom-up) order would
            # NOT equal the logical stream for this asymmetric content
            row = w * 3
            flipped = b"".join(
                px[r * row : (r + 1) * row] for r in range(h - 1, -1, -1)
            )
            assert flipped != px

    def test_bmp_decoder_rejects_non_dib(self):
        good = M._encode_bmp(4, 3, bytes(range(36)))
        with pytest.raises(ValueError, match="not a BMP"):
            M.decode_bmp(b"PNG" + good)
        # 8-bpp claimed in the info header → unsupported, loud
        bad_bpp = bytearray(good)
        bad_bpp[28] = 8
        with pytest.raises(ValueError, match="unsupported BMP"):
            M.decode_bmp(bytes(bad_bpp))
        # top-down (negative height) declared → unsupported, loud
        import struct

        neg = bytearray(good)
        neg[22:26] = struct.pack("<i", -3)
        with pytest.raises(ValueError, match="top-down"):
            M.decode_bmp(bytes(neg))

    def test_bmp_decoder_rejects_bad_width_and_truncation(self):
        """The r8 guards: width ≤ 0 and short payloads must raise — Python
        slicing past the end silently yields short rows otherwise."""
        import struct

        good = M._encode_bmp(5, 3, bytes(range(45)))  # w=5 → 1 pad byte/row
        zero_w = bytearray(good)
        zero_w[18:22] = struct.pack("<i", 0)
        with pytest.raises(ValueError, match="invalid BMP width"):
            M.decode_bmp(bytes(zero_w))
        neg_w = bytearray(good)
        neg_w[18:22] = struct.pack("<i", -5)
        with pytest.raises(ValueError, match="invalid BMP width"):
            M.decode_bmp(bytes(neg_w))
        # drop one pixel byte of the last-read row → truncated, loud
        with pytest.raises(ValueError, match="truncated BMP"):
            M.decode_bmp(good[:-2])  # 1 pad byte + 1 pixel byte short

    def test_bmp_decoder_accepts_last_row_unpadded(self):
        """Encoders may omit the FINAL physical row's trailing padding;
        such files decode completely (the r8 truncation bound rejected
        them — r8 advisor). One byte shorter still raises."""
        px = bytes(i % 251 for i in range(5 * 3 * 3))
        full = M._encode_bmp(5, 3, px)  # stride 16, row_bytes 15
        unpadded = full[:-1]  # strip the last row's single pad byte
        assert M.decode_bmp(unpadded)["pixels"] == px
        with pytest.raises(ValueError, match="truncated BMP"):
            M.decode_bmp(full[:-2])

    def test_video_frame_sampling(self, docs):
        import hashlib

        vids = M.synthesize_video(docs.limit(16))
        out = M.sample_video_frames(vids, every_n=2).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault(r["doc_id"], []).append(r)
        src = {r["doc_id"]: r["text"] for r in docs.limit(16).collect()}
        for doc_id, rows in by_doc.items():
            n_frames = 1 + doc_id % 8
            assert sorted(r["frame_idx"] for r in rows) == list(
                range(0, n_frames, 2)
            )
            for r in rows:
                frame = (
                    hashlib.md5(f"{src[doc_id]}:{r['frame_idx']}".encode())
                    .hexdigest()
                    .encode()
                    * 4
                )
                assert r["frame_md5"] == hashlib.md5(frame).hexdigest()

    def test_video_sampler_skips_garbage(self, spark):
        df = spark.createDataFrame(
            [(1, bytearray(b"nope")), (2, None)], "doc_id long, payload binary"
        )
        assert M.sample_video_frames(df).count() == 0


class TestTextEdgeCases:
    def test_empty_and_null_text(self, spark):
        df = spark.createDataFrame(
            [(1, ""), (2, None), (3, "  "), (4, "one two three")],
            "doc_id LONG, text STRING",
        )
        out = df.select(
            "doc_id",
            T.token_count_ws(F.col("text")).alias("tok"),
            T.quality_score(F.col("text")).alias("q"),
        ).collect()
        vals = {r["doc_id"]: (r["tok"], r["q"]) for r in out}
        assert vals[1] == (0, 0.1)  # empty: only the no-punct term scores
        assert vals[2][0] is None  # null propagates
        assert vals[3][0] == 0
        assert vals[4][0] == 3


class TestStreamingRules:
    def test_stream_filter_matches_batch(self, spark):
        from dynamicqueryengine_spark.operators.executor import apply_rule
        from dynamicqueryengine_spark.sources.registry import load_table
        from dynamicqueryengine_spark.streaming.rules import (
            apply_rule_stream,
            run_stream_to_memory,
            stream_events,
        )

        rule = {
            "Conditions": {
                "Conditions": [
                    {"Property": "event_type", "Operator": "Equal", "Value": "click"},
                    {"Property": "value", "Operator": "GreaterThan", "Value": 50},
                ]
            }
        }
        stream = stream_events(spark, SF_DIR)
        assert stream.isStreaming
        run_stream_to_memory(apply_rule_stream(stream, rule), "stream_out")
        got = spark.sql("SELECT count(*) c FROM stream_out").collect()[0]["c"]
        want = apply_rule(load_table(spark, SF_DIR, "events"), rule).count()
        assert got == want and want > 0

    def test_windowed_counts_match_batch_twin(self, spark):
        from dynamicqueryengine_spark.streaming.rules import (
            run_stream_to_memory,
            stream_events,
            windowed_rule_counts,
        )
        from dynamicqueryengine_spark.workloads.llm import _events_hourly

        rule = {
            "Conditions": {
                "Conditions": [
                    {"Property": "value", "Operator": "GreaterThan", "Value": 100}
                ]
            }
        }
        stream = stream_events(spark, SF_DIR)
        windowed = windowed_rule_counts(stream, rule, window="1 hour")
        # complete mode: append would hold back windows the watermark hasn't
        # closed, and a finite file stream ends before the last window closes
        run_stream_to_memory(windowed, "windowed_out", output_mode="complete")
        got = {
            (r["window_start"], r["event_type"]): r["matches"]
            for r in spark.sql("SELECT * FROM windowed_out").collect()
        }
        want = {
            (r["window_start"], r["event_type"]): r["matches"]
            for r in _events_hourly(spark, SF_DIR).collect()
        }
        assert got == want and len(want) > 0


class TestIvf:
    def test_kmeans_deterministic_and_recall(self, embs):
        from pyspark.sql import functions as F

        from dynamicqueryengine_spark.functions.similarity import (
            cosine_topk,
            ivf_topk,
            kmeans_centroids,
        )

        cents_a = kmeans_centroids(embs, k=8, iterations=3)
        cents_b = kmeans_centroids(embs, k=8, iterations=3)
        assert cents_a == cents_b  # deterministic init + iteration

        queries = embs.filter(F.col("vec_id") < 5)
        approx = ivf_topk(embs, queries, k=5, n_probe=3, centroids=cents_a).collect()
        exact = cosine_topk(embs, queries, k=5).collect()
        ex = {(r["query_id"], r["neighbor_id"]) for r in exact}
        ap = {(r["query_id"], r["neighbor_id"]) for r in approx}
        assert len(ap) > 0
        assert len(ex & ap) / len(ex) >= 0.4  # probing 3/8 cells

    def test_exact_kmeans_refines_and_is_deterministic(self, embs):
        import numpy as np

        from dynamicqueryengine_spark.functions.similarity import (
            kmeans_centroids_exact,
        )

        a = kmeans_centroids_exact(embs, k=8, iterations=2)
        b = kmeans_centroids_exact(embs, k=8, iterations=2)
        assert a == b  # bit-identical across runs (decimal-exact sums)
        seeds = kmeans_centroids_exact(embs, k=8, iterations=0)
        assert a != seeds  # Lloyd's iterations actually moved the centroids

        def sse(cents):
            mat = np.array(
                [r["embedding"] for r in embs.select("embedding").collect()],
                dtype=np.float64,
            )
            c = np.array(cents)
            d2 = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
            return d2.min(axis=1).sum()

        assert sse(a) < sse(seeds)  # refinement reduced within-cell SSE


class TestSharedPairMemo:
    def test_size_gate_and_route_equivalence(self, spark, monkeypatch):
        """r5: the cross-query pair memo must (a) refuse to hold an
        over-gate pair list on the driver — the distributed frame comes
        back instead and nothing is memoized — and (b) return the
        identical pair set from the memo-hit path."""
        import dynamicqueryengine_spark.workloads.llm as L

        L._PAIR_MEMO.clear()
        monkeypatch.setattr(L, "_PAIR_MEMO_MAX_ROWS", 0)
        distributed = L._shared_jaccard_pairs(spark, SF_DIR)
        dist_rows = {tuple(r) for r in distributed.collect()}
        assert not L._PAIR_MEMO, "over-gate list must not be memoized"

        monkeypatch.setattr(L, "_PAIR_MEMO_MAX_ROWS", 500_000)
        first = L._shared_jaccard_pairs(spark, SF_DIR)  # mines + memoizes
        assert L._PAIR_MEMO, "under-gate list must be memoized"
        hit = L._shared_jaccard_pairs(spark, SF_DIR)  # pure memo hit
        assert {tuple(r) for r in first.collect()} == dist_rows
        assert {tuple(r) for r in hit.collect()} == dist_rows
        L._PAIR_MEMO.clear()


class TestPortableRounding:
    def test_half_boundary_values_agree_across_engines(self, spark):
        """The r7 sf0.1 sweep found Spark round(double, 6) and DuckDB
        round() disagreeing on values within an ulp of an exact 1e-6
        half (quality 0.5385625). The portable floor-form
        (_round6_portable) must produce IDENTICAL results in both
        engines on a gauntlet of exact halves, near-halves (±1 ulp),
        and ordinary values."""
        import math

        import duckdb

        from dynamicqueryengine_spark.functions.text import (
            _round6_portable,
            _round6_portable_sql,
        )

        halves = [k / 2_000_000.0 for k in range(1, 40, 2)]  # x.xxxxxx5
        gauntlet = (
            halves
            + [math.nextafter(x, 0.0) for x in halves]
            + [math.nextafter(x, 1.0) for x in halves]
            + [0.5385625, 0.6166875, 0.0, 1.0, 0.123456789, 0.9999995]
        )
        df = spark.createDataFrame([(i, v) for i, v in enumerate(gauntlet)], "i long, x double")
        got = {
            r["i"]: r["r"]
            for r in df.select(
                "i", _round6_portable(F.col("x")).alias("r")
            ).collect()
        }
        con = duckdb.connect()
        con.execute("CREATE TABLE t (i BIGINT, x DOUBLE)")
        con.executemany(
            "INSERT INTO t VALUES (?, ?)", list(enumerate(gauntlet))
        )
        expr = _round6_portable_sql("x")
        oracle = {
            i: r for i, r in con.execute(f"SELECT i, {expr} FROM t").fetchall()
        }
        con.close()
        assert got == oracle
        # and the half values actually round UP (half-up semantics)
        for k, x in enumerate(halves):
            assert got[k] == (int(x * 2_000_000.0) + 1) / 2_000_000.0


class TestScratchDir:
    def test_generations_never_wipe_prior_invocations(self, tmp_path):
        """Each _scratch_dir call hands out a FRESH generation subdir; a
        rerun must not delete files a prior invocation's lazy DataFrame
        still reads (r8 advisor: the wipe-and-rebuild scheme rmtree'd
        them)."""
        import os

        from dynamicqueryengine_spark.workloads.llm import _scratch_dir

        sf = str(tmp_path)  # unique key → fresh base for this test
        d1 = _scratch_dir("t_gen", sf)
        os.makedirs(d1)
        marker = os.path.join(d1, "staged.parquet")
        with open(marker, "w") as f:
            f.write("x")
        d2 = _scratch_dir("t_gen", sf)
        assert d2 != d1
        assert os.path.dirname(d2) == os.path.dirname(d1)  # shared base
        assert os.path.exists(marker)  # rerun left the first staging alone


class TestParagraphDedup:
    """paragraph_dedup_stats: disjoint word-chunk "paragraphs", corpus-wide
    duplicated-paragraph char fraction per doc (functions/dedup.py)."""

    def test_planted_shared_paragraph(self, spark):
        # docs 1 and 2 share their first 5-word chunk exactly; doc 3 is
        # fully unique. chunk_tokens=5 ⇒ doc1 = [shared, unique tail].
        shared = "alpha beta gamma delta epsilon"
        rows = [
            (1, shared + " one two three four five"),
            (2, shared + " six seven eight nine ten"),
            (3, "totally unrelated words only here nothing shared at all yes"),
        ]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = {
            r["doc_id"]: r
            for r in D.paragraph_dedup_stats(
                df, chunk_tokens=5, keep_threshold=0.3
            ).collect()
        }
        assert out[1]["n_paragraphs"] == 2
        assert out[1]["n_dup_paragraphs"] == 1
        # both chunks have the same char length (30 and 23/28?) — compute:
        # duplicated chars / total chars for doc 1
        dup_len = len(shared)
        tot = dup_len + len("one two three four five")
        assert out[1]["dup_char_fraction"] == round(dup_len / tot, 6)
        assert not out[1]["keep"]  # > 0.3 duplicated
        assert out[3]["n_dup_paragraphs"] == 0
        assert out[3]["dup_char_fraction"] == 0.0
        assert out[3]["keep"]

    def test_within_doc_repeat_not_duplicated(self, spark):
        # the same chunk twice in ONE doc is not a cross-doc duplicate
        rows = [(1, "a b c d e a b c d e"), (2, "x y z w v u t s r q")]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = {
            r["doc_id"]: r
            for r in D.paragraph_dedup_stats(df, chunk_tokens=5).collect()
        }
        assert out[1]["n_paragraphs"] == 2
        assert out[1]["n_dup_paragraphs"] == 0
        assert out[1]["keep"]

    def test_matches_duckdb_oracle(self, spark, docs, testdata_duck):
        got = sorted(
            D.paragraph_dedup_stats(docs, chunk_tokens=10).collect()
        )
        want = sorted(
            testdata_duck.execute(
                D.paragraph_dedup_stats_sql("documents", chunk_tokens=10)
            ).fetchall()
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert tuple(g) == tuple(w)


class TestBigramLm:
    """bigram_lm_scores: add-k bigram LM + CCNet head/middle/tail buckets
    (functions/lm.py)."""

    def test_hand_computed_probabilities(self, spark):
        import math

        from dynamicqueryengine_spark.functions.lm import bigram_lm_scores

        # train = doc 1 only: "a b" → bigrams (<s>,a),(a,b); vocab {a,b}
        # → V = 3, k = 0.5
        rows = [(1, "a b"), (2, "a b"), (3, "z z")]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = {
            r["doc_id"]: r
            for r in bigram_lm_scores(
                df, train_filter=F.col("doc_id") == 1
            ).collect()
        }

        def q(p):
            return round(math.log(p) * 1e6)

        # doc 1 scores itself: P(a|<s>) = (1+.5)/(1+1.5) = .6
        #                      P(b|a)   = (1+.5)/(1+1.5) = .6
        want = round(-(q(0.6) + q(0.6)) / 1e6 / 2, 6)
        assert out[1]["n_bigrams"] == 2
        assert out[1]["avg_nll"] == want
        # doc 3: unseen context z → P = k/(kV) = 1/3 for both bigrams...
        # except the FIRST bigram (<s>,z): context <s> seen once,
        # P(z|<s>) = (0+.5)/(1+1.5) = .2
        want3 = round(-(q(0.2) + q(1 / 3)) / 1e6 / 2, 6)
        assert out[3]["avg_nll"] == want3
        # fluent train-like docs head, garbage doc tail
        assert out[1]["ppl_bucket"] == "head"
        assert out[3]["ppl_bucket"] == "tail"

    def test_matches_duckdb_oracle(self, spark, docs, testdata_duck):
        from dynamicqueryengine_spark.functions.lm import (
            bigram_lm_scores,
            bigram_lm_scores_sql,
        )

        got = sorted(
            bigram_lm_scores(docs, train_filter=F.col("lang") == "en")
            .collect()
        )
        want = sorted(
            testdata_duck.execute(
                bigram_lm_scores_sql("documents", "lang = 'en'")
            ).fetchall()
        )
        assert len(got) == len(want)
        for g, w in zip(got, want):
            assert tuple(g) == tuple(w)


class TestFeatureHashEmbeddings:
    """feature_hash_embeddings: signed term-frequency hash vectors
    (functions/feature_hash.py)."""

    def test_identical_texts_identical_vectors(self, spark):
        from dynamicqueryengine_spark.functions.feature_hash import (
            feature_hash_embeddings,
        )

        rows = [(1, "spark scale query"), (2, "SPARK   scale query"),
                (3, "entirely different words")]
        df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
        out = {
            r["doc_id"]: list(r["embedding"])
            for r in feature_hash_embeddings(df, dim=16).collect()
        }
        assert out[1] == out[2]  # normalization folds case/whitespace
        assert out[1] != out[3]
        # signed TF: total mass equals token count in absolute sum parity
        assert sum(abs(x) for x in out[1]) <= 3
        assert all(float(x).is_integer() for x in out[1])

    def test_zero_vector_docs_dropped(self, spark):
        from dynamicqueryengine_spark.functions.feature_hash import (
            feature_hash_embeddings,
        )

        df = spark.createDataFrame(
            [(1, "hello"), (2, "   ")], "doc_id LONG, text STRING"
        )
        ids = {
            r["doc_id"]
            for r in feature_hash_embeddings(df, dim=8).collect()
        }
        assert ids == {1}  # empty doc has no tokens → dropped

    def test_matches_duckdb_oracle(self, spark, docs, testdata_duck):
        from dynamicqueryengine_spark.functions.feature_hash import (
            feature_hash_embeddings,
            feature_hash_embeddings_sql,
        )

        got = {
            r["doc_id"]: list(r["embedding"])
            for r in feature_hash_embeddings(docs, dim=32).collect()
        }
        want = {
            r[0]: list(r[1])
            for r in testdata_duck.execute(
                feature_hash_embeddings_sql("documents", dim=32)
            ).fetchall()
        }
        assert got == want
