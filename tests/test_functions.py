"""Tests for the training-data operators: text analysis, dedup family,
similarity search, multimodal plumbing — with planted ground truth."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from gliner_ray.functions import dedup as fdedup
from gliner_ray.functions import multimodal as mm
from gliner_ray.functions import similarity as fsim
from gliner_ray.functions import text as ftext


def _docs_ds(rows):
    import ray.data as rd

    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                "text": pa.array([r[1] for r in rows], pa.string()),
            }
        )
    )


BASE = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the green forest to find some food for the long cold winter"
)


class TestTextOps:
    def test_token_count_matches_regex(self):
        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a b-c d_e (f)"]})
        out = ftext.token_count_batch(t)
        # tokens: a, b-c, d_e, (, f, )
        assert out["n_tokens"].to_pylist() == [6]

    def test_text_stats(self):
        t = pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["The cat, the hat!"]})
        out = ftext.text_stats_batch(t)
        r = out.to_pylist()[0]
        assert r["n_chars"] == 17
        assert r["n_words"] == 4
        assert r["n_punct"] == 2
        assert r["n_stopwords"] == 2  # 'the' twice

    def test_lang_id_english(self):
        t = pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                      "text": [BASE, "zzz qqq www"]})
        out = ftext.lang_id_batch(t)
        assert out["lang_pred"].to_pylist() == ["en", "und"]

    def test_quality_score_ordering(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": [BASE * 3, "!!! ??? ;;; ###"],
            }
        )
        out = ftext.quality_score_batch(t)
        scores = out["quality_score"].to_pylist()
        assert scores[0] > scores[1]

    def test_top_terms_dual_path_parity(self, ray_session):
        import ray.data as rd

        t = pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": [
                    "apple apple banana common common",
                    "banana banana cherry common",
                    "cherry cherry apple common common common",
                    "dates dates dates common",
                    "elder elder fig common",
                    "fig fig dates common",
                ],
            }
        )
        ds = rd.from_arrow(t)
        a = ftext.top_terms(ds, k=2).to_pandas()
        b = ftext.top_terms(ds, k=2, df_broadcast_limit=0).to_pandas()
        key = ["doc_id", "term", "tf", "df"]
        assert sorted(map(tuple, a[key].values.tolist())) == sorted(
            map(tuple, b[key].values.tolist())
        )
        # doc 0: apple tf=2 df=2 beats common tf=2 df=6 (rarer wins tie)
        d0 = a[a.doc_id == 0].sort_values(["tf", "df"], ascending=[False, True])
        assert list(d0["term"]) == ["apple", "common"]
        assert a.groupby("doc_id").size().max() <= 2

    def test_rolling_fingerprint_similarity(self):
        # identical docs share fingerprints; different docs don't
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": [BASE, BASE, "completely different content here"],
            }
        )
        out = ftext.rolling_fingerprint_batch(t)
        fps = out["fingerprint"].to_pylist()
        assert fps[0] == fps[1]
        assert fps[0] != fps[2]


class TestExactDedup:
    def test_keeps_min_id(self):
        ds = _docs_ds([(5, "aaa"), (2, "aaa"), (3, "bbb"), (9, "aaa")])
        out = fdedup.exact_dedup(ds).to_pandas()
        assert sorted(out["doc_id"]) == [2, 3]


class TestMinHash:
    def test_signature_jaccard_estimate(self):
        a, b = fdedup._minhash_params(128)
        s1 = fdedup.minhash_signature(BASE, a, b)
        edited = BASE.replace("fox", "wolf")
        s2 = fdedup.minhash_signature(edited, a, b)
        s3 = fdedup.minhash_signature("totally unrelated words here", a, b)
        est_close = (s1 == s2).mean()
        est_far = (s1 == s3).mean()
        true_j = fdedup.jaccard(fdedup.word_ngrams(BASE), fdedup.word_ngrams(edited))
        assert abs(est_close - true_j) < 0.25
        assert est_far < 0.1 < est_close

    def test_minhash_dedup_finds_planted_cluster(self):
        near = BASE.replace("winter", "spring")
        rows = [(1, BASE), (2, near), (3, "other text entirely unrelated to anything"),
                (4, BASE)]
        out = fdedup.minhash_dedup(_docs_ds(rows), threshold=0.7).to_pylist()
        clusters = {r["doc_id"]: r["cluster_id"] for r in out}
        assert clusters.get(1) == 1 and clusters.get(2) == 1 and clusters.get(4) == 1
        assert 3 not in clusters

    def test_no_dups(self):
        rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "one two three four five six seven eight nine")]
        out = fdedup.minhash_dedup(_docs_ds(rows))
        assert out.num_rows == 0

    def test_distributed_path_matches_broadcast(self):
        """pair_broadcast_limit=0 forces the guarded fallback: texts are
        joined onto the pairs distributed instead of broadcast — the
        clusters must be identical."""
        near = BASE.replace("winter", "spring")
        rows = [(1, BASE), (2, near), (3, "other text entirely unrelated to anything"),
                (4, BASE)]
        fast = fdedup.minhash_dedup(_docs_ds(rows), threshold=0.7).to_pylist()
        dist = fdedup.minhash_dedup(
            _docs_ds(rows), threshold=0.7, pair_broadcast_limit=0
        ).to_pylist()
        assert fast == dist

    def test_distributed_cluster_formation_matches(self):
        """cc_broadcast_limit=0 forces cluster formation through the
        distributed min-label propagation (round-3: guarded dual-path
        components replace the always-driver union-find) — identical
        cluster table on both paths."""
        near = BASE.replace("winter", "spring")
        rows = [(1, BASE), (2, near), (3, "other text entirely unrelated to anything"),
                (4, BASE), (5, "sixth doc about something else entirely today")]
        fast = fdedup.minhash_dedup(_docs_ds(rows), threshold=0.7).to_pylist()
        dist = fdedup.minhash_dedup(
            _docs_ds(rows), threshold=0.7, cc_broadcast_limit=0
        ).to_pylist()
        forced = fdedup.minhash_dedup(
            _docs_ds(rows), threshold=0.7, force_distributed_cc=True
        ).to_pylist()
        assert fast == dist == forced
        clusters = {r["doc_id"]: r["cluster_id"] for r in fast}
        assert clusters.get(1) == clusters.get(2) == clusters.get(4) == 1

    def test_as_dataset_streams_and_matches_table(self):
        """round-3 verdict item #2: the membership table is corpus-row-
        scale on a dup-heavy corpus, so as_dataset=True must return a
        streaming Dataset (no driver collect) identical in content to
        the guarded table path — including through the forced
        distributed components engine."""
        import ray.data as rd

        near = BASE.replace("winter", "spring")
        rows = [(1, BASE), (2, near), (3, "other text entirely unrelated to anything"),
                (4, BASE)]
        table = fdedup.minhash_dedup(
            _docs_ds(rows), threshold=0.7, force_distributed_cc=True
        ).to_pylist()
        streamed = fdedup.minhash_dedup(
            _docs_ds(rows), threshold=0.7, force_distributed_cc=True,
            as_dataset=True,
        )
        assert isinstance(streamed, rd.Dataset)
        got = sorted(streamed.take_all(), key=lambda r: r["doc_id"])
        assert got == table

    def test_collect_guard_raises_past_limit(self):
        """_clusters_table refuses a driver collect past collect_limit
        instead of OOMing — callers must stream via as_dataset=True."""
        import pytest as _pytest
        import ray.data as rd

        edges = rd.from_arrow(
            pa.table({"id_a": pa.array([1, 3], pa.int64()),
                      "id_b": pa.array([2, 4], pa.int64())})
        )
        with _pytest.raises(ValueError, match="as_dataset=True"):
            fdedup._clusters_table(edges, collect_limit=1)
        ok = fdedup._clusters_table(edges, collect_limit=10)
        assert ok.num_rows == 4


class TestNgramJaccard:
    def test_finds_planted_cluster_exact(self):
        near = BASE.replace("winter", "spring")
        rows = [(1, BASE), (2, near), (3, "other text entirely unrelated to anything"),
                (4, BASE)]
        out = fdedup.ngram_jaccard_dups(_docs_ds(rows), threshold=0.7).to_pylist()
        clusters = {r["doc_id"]: r["cluster_id"] for r in out}
        assert clusters.get(1) == 1 and clusters.get(2) == 1 and clusters.get(4) == 1
        assert 3 not in clusters

    def test_matches_sequential_oracle(self):
        """Distributed anchor-gram clusters == brute-force all-pairs
        Jaccard clusters on the same corpus (anchor blocking must not
        lose recall on docs with ≥ ~30 shared grams)."""
        words = ("lorem ipsum dolor sit amet consectetur adipiscing elit sed do "
                 "eiusmod tempor incididunt ut labore et dolore magna aliqua").split()
        rows = []
        for i in range(12):
            w = list(words)
            w[i % len(w)] = f"tok{i % 3}"  # 3 groups of near-identical docs
            rows.append((i, " ".join(w)))
        rows.append((99, "a completely different short document about graphs"))
        ds = _docs_ds(rows)
        out = fdedup.ngram_jaccard_dups(ds, threshold=0.8).to_pylist()
        got = {r["doc_id"]: r["cluster_id"] for r in out}
        # brute-force oracle
        texts = dict(rows)
        pairs = [
            (a, b)
            for a in texts for b in texts if a < b
        ]
        oracle = fdedup.verify_and_cluster(pairs, texts, threshold=0.8)
        assert got == {k: v for k, v in oracle.items()}

    def test_distributed_path_matches_broadcast(self):
        near = BASE.replace("winter", "spring")
        rows = [(1, BASE), (2, near), (3, "other text entirely unrelated to anything"),
                (4, BASE)]
        fast = fdedup.ngram_jaccard_dups(_docs_ds(rows), threshold=0.7).to_pylist()
        dist = fdedup.ngram_jaccard_dups(
            _docs_ds(rows), threshold=0.7, pair_broadcast_limit=0
        ).to_pylist()
        assert fast == dist

    def test_no_dups(self):
        rows = [(1, "alpha beta gamma delta epsilon zeta eta theta"),
                (2, "one two three four five six seven eight nine")]
        out = fdedup.ngram_jaccard_dups(_docs_ds(rows))
        assert out.num_rows == 0


class TestSimHash:
    def test_identical_distance_zero(self):
        assert fdedup.hamming64(fdedup.simhash64(BASE), fdedup.simhash64(BASE)) == 0

    def test_near_text_small_distance(self):
        d_near = fdedup.hamming64(
            fdedup.simhash64(BASE), fdedup.simhash64(BASE.replace("fox", "wolf"))
        )
        d_far = fdedup.hamming64(
            fdedup.simhash64(BASE), fdedup.simhash64("unrelated totally different words")
        )
        assert d_near < d_far

    def test_near_dup_pairs(self):
        rows = [(1, BASE), (2, BASE), (3, "something else entirely different")]
        out = fdedup.simhash_near_dups(_docs_ds(rows), max_hamming=3).to_pylist()
        assert {(r["id_a"], r["id_b"]) for r in out} == {(1, 2)}

    def test_distributed_path_matches_broadcast(self):
        rows = [(1, BASE), (2, BASE), (3, "something else entirely different")]
        fast = fdedup.simhash_near_dups(_docs_ds(rows), max_hamming=3).to_pylist()
        dist = fdedup.simhash_near_dups(
            _docs_ds(rows), max_hamming=3, pair_broadcast_limit=0
        ).to_pylist()
        assert fast == dist


class TestEmbeddingOps:
    def _emb_ds(self, n=64, dim=16, seed=0):
        import ray.data as rd

        rng = np.random.RandomState(seed)
        mat = rng.randn(n, dim).astype(np.float32)
        mat[7] = mat[3] + 1e-4  # planted near-dup pair (3, 7)
        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(n), pa.int64()),
                    "embedding": pa.array([row.tolist() for row in mat],
                                          pa.list_(pa.float32())),
                }
            )
        ), mat

    def test_brute_force_topk_exact(self):
        ds, mat = self._emb_ds()
        q = mat[3].astype(np.float64)
        top = fsim.brute_force_topk(ds, q, k=5).to_pylist()
        normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = normed @ (q / np.linalg.norm(q))
        expect = sorted(range(len(sims)), key=lambda i: (-sims[i], i))[:5]
        assert [r["vec_id"] for r in top] == expect
        assert top[0]["vec_id"] in (3, 7)

    def test_cosine_near_dups_finds_planted(self):
        ds, _ = self._emb_ds()
        out = fdedup.embedding_near_dups(ds, threshold=0.999).to_pylist()
        assert (3, 7) in {(r["id_a"], r["id_b"]) for r in out}

    def test_cosine_distributed_path_matches_broadcast(self):
        ds, _ = self._emb_ds()
        fast = fdedup.embedding_near_dups(ds, threshold=0.999).to_pylist()
        dist = fdedup.embedding_near_dups(
            ds, threshold=0.999, pair_broadcast_limit=0
        ).to_pylist()
        assert [(r["id_a"], r["id_b"]) for r in fast] == [
            (r["id_a"], r["id_b"]) for r in dist
        ]

    def test_exact_cosine_pairs_matches_numpy_all_pairs(self):
        """exact_cosine_pairs == the full O(n^2) numpy pair set, on both
        the broadcast path and the block-pair distributed path (several
        block sizes, including blocks smaller than the batch)."""
        ds, mat = self._emb_ds()
        normed = mat.astype(np.float64)
        normed /= np.linalg.norm(normed, axis=1, keepdims=True)
        cos = normed @ normed.T
        thr = 0.4
        expect = sorted(
            (a, b)
            for a in range(len(mat))
            for b in range(a + 1, len(mat))
            if cos[a, b] >= thr
        )
        assert expect, "fixture must produce at least one qualifying pair"
        bc = fsim.exact_cosine_pairs(ds, threshold=thr)
        assert list(zip(bc["id_a"].to_pylist(), bc["id_b"].to_pylist())) == expect
        for rpb in (8, 17, 64):
            dist = fsim.exact_cosine_pairs(
                ds, threshold=thr, force_distributed=True, rows_per_block=rpb
            )
            assert list(
                zip(dist["id_a"].to_pylist(), dist["id_b"].to_pylist())
            ) == expect, f"rows_per_block={rpb}"

    def test_exact_cosine_pairs_finds_planted(self):
        ds, _ = self._emb_ds()
        out = fsim.exact_cosine_pairs(ds, threshold=0.999)
        assert (3, 7) in set(zip(out["id_a"].to_pylist(), out["id_b"].to_pylist()))

    def test_semantic_dedup_finds_planted_and_matches_lsh_exactness(self):
        """SemDeDup (kmeans-bucketed) must find the planted pair: a
        near-identical vector pair always lands in the same nearest-
        centroid cluster, and verification is exact cosine. Both
        adaptive verification paths must agree."""
        ds, _ = self._emb_ds()
        out = fdedup.semantic_dedup(ds, n_clusters=4, threshold=0.999).to_pylist()
        assert (3, 7) in {(r["id_a"], r["id_b"]) for r in out}
        for r in out:
            assert r["cosine"] >= 0.999
        dist = fdedup.semantic_dedup(
            ds, n_clusters=4, threshold=0.999, pair_broadcast_limit=0
        ).to_pylist()
        assert [(r["id_a"], r["id_b"]) for r in out] == [
            (r["id_a"], r["id_b"]) for r in dist
        ]

    def test_ivf_recall(self):
        ds, mat = self._emb_ds(n=128)
        q = mat[5].astype(np.float64)
        exact = {r["vec_id"] for r in fsim.brute_force_topk(ds, q, k=10).to_pylist()}
        index = fsim.IVFIndex.build(ds, n_clusters=8)
        approx = {r["vec_id"] for r in index.search(q, k=10, nprobe=8).to_pylist()}
        # nprobe == n_clusters → exhaustive → exact recall
        assert approx == exact
        partial = {r["vec_id"] for r in index.search(q, k=10, nprobe=3).to_pylist()}
        assert len(partial & exact) >= 5  # decent recall with 3/8 probes

    def test_ivf_persisted_index_prunes_partitions(self, tmp_path):
        """Persisted mode: assignments land in cluster=K dirs, search
        opens ONLY the nprobe probed dirs, and results match the
        in-memory (filter-everything) path exactly."""
        import os

        ds, mat = self._emb_ds(n=128)
        q = mat[5].astype(np.float64)
        idx_dir = str(tmp_path / "ivf")
        persisted = fsim.IVFIndex.build(ds, n_clusters=8, index_dir=idx_dir)
        in_memory = fsim.IVFIndex.build(ds, n_clusters=8)

        cluster_dirs = [d for d in os.listdir(idx_dir) if d.startswith("cluster=")]
        assert len(cluster_dirs) > 3  # more inverted lists than probes
        qn = q / np.linalg.norm(q)
        probe = persisted._probe_clusters(qn, nprobe=3)
        opened = persisted._probe_dirs(probe)
        opened_dirs = {os.path.basename(os.path.dirname(f)) for f in opened}
        assert len(opened_dirs) <= 3  # the read set IS the probe set
        assert opened_dirs <= set(cluster_dirs)

        got = persisted.search(q, k=10, nprobe=3).to_pylist()
        want = in_memory.search(q, k=10, nprobe=3).to_pylist()
        assert [r["vec_id"] for r in got] == [r["vec_id"] for r in want]
        np.testing.assert_allclose(
            [r["cosine"] for r in got], [r["cosine"] for r in want], rtol=1e-12
        )

        # load() round-trip reuses the on-disk index
        reloaded = fsim.IVFIndex.load(idx_dir)
        got2 = reloaded.search(q, k=10, nprobe=3).to_pylist()
        assert [r["vec_id"] for r in got2] == [r["vec_id"] for r in want]


class TestCodecs:
    """Pure-numpy BMP/WAV/Y4M codecs: exact round-trips + real decode."""

    def test_bmp_roundtrip_exact(self):
        from gliner_ray.functions import codecs

        rng = np.random.RandomState(0)
        for h, w in [(1, 1), (3, 5), (16, 16), (7, 33)]:  # odd widths hit row padding
            rgb = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            out = codecs.decode_bmp(codecs.encode_bmp(rgb))
            np.testing.assert_array_equal(out, rgb)

    def test_wav_roundtrip_exact(self):
        from gliner_ray.functions import codecs

        rng = np.random.RandomState(1)
        mono = (rng.randn(777) * 5000).astype(np.int16)
        rate, out = codecs.decode_wav(codecs.encode_wav(mono, 8000))
        assert rate == 8000
        np.testing.assert_array_equal(out[:, 0], mono)
        stereo = (rng.randn(100, 2) * 5000).astype(np.int16)
        rate, out = codecs.decode_wav(codecs.encode_wav(stereo, 44100))
        assert rate == 44100 and out.shape == (100, 2)
        np.testing.assert_array_equal(out, stereo)

    def test_y4m_roundtrip_exact(self):
        from gliner_ray.functions import codecs

        rng = np.random.RandomState(2)
        frames = rng.randint(0, 256, size=(4, 6, 9)).astype(np.uint8)
        fps, out = codecs.decode_y4m(codecs.encode_y4m(frames, fps=5))
        assert fps == 5
        np.testing.assert_array_equal(out, frames)

    def test_resize_nearest_identity_and_downscale(self):
        from gliner_ray.functions import codecs

        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, size=(8, 8, 3)).astype(np.uint8)
        np.testing.assert_array_equal(codecs.resize_nearest(rgb, 8, 8), rgb)
        small = codecs.resize_nearest(rgb, 4, 4)
        assert small.shape == (4, 4, 3)
        np.testing.assert_array_equal(small[0, 0], rgb[0, 0])

    def test_real_decoder_features(self):
        from gliner_ray.functions import codecs

        t = mm.synth_media_table(n=9, seed=7)
        out = mm.Decoder()(t)
        assert all(e is None for e in out["decode_error"].to_pylist())
        for kind, w, h, dur, mw, mh, md in zip(
            out["kind"].to_pylist(),
            out["decoded_width"].to_pylist(),
            out["decoded_height"].to_pylist(),
            out["decoded_duration_ms"].to_pylist(),
            out["meta_width"].to_pylist(),
            out["meta_height"].to_pylist(),
            out["meta_duration_ms"].to_pylist(),
        ):
            # the decoded geometry must equal the generator's metadata
            assert (w, h) == (mw, mh) if kind != "audio" else (w, h) == (-1, -1)
            if kind != "image":
                assert dur == md

    def test_real_resize_reencodes(self):
        from gliner_ray.functions import codecs

        rgb = np.arange(40 * 60 * 3, dtype=np.uint8).reshape(40, 60, 3)
        t = pa.table(
            {
                "media_id": pa.array([0], pa.int64()),
                "kind": pa.array(["image"], pa.string()),
                "mime": pa.array(["image/bmp"], pa.string()),
                "payload": pa.array([codecs.encode_bmp(rgb)], pa.binary()),
                "meta_width": pa.array([60], pa.int32()),
                "meta_height": pa.array([40], pa.int32()),
                "meta_duration_ms": pa.array([-1], pa.int32()),
            }
        )
        out = mm.Resize(max_side=30)(t)
        assert out["resized_width"].to_pylist() == [30]
        assert out["resized_height"].to_pylist() == [20]
        decoded = codecs.decode_bmp(out["payload"].to_pylist()[0])
        assert decoded.shape == (20, 30, 3)

    def test_real_frame_sampling(self):
        from gliner_ray.functions import codecs

        frames = np.stack([np.full((4, 4), v, np.uint8) for v in (0, 64, 128, 255)])
        t = pa.table(
            {
                "mime": pa.array(["video/x-yuv4mpeg"], pa.string()),
                "payload": pa.array([codecs.encode_y4m(frames, fps=2)], pa.binary()),
            }
        )
        out = mm.frame_sample_batch(t, fps=1.0)  # keep every 2nd frame
        assert out["frame_ts_ms"].to_pylist() == [[0, 1000]]
        means = out["frame_mean"].to_pylist()[0]
        assert abs(means[0] - 0.0) < 1e-6 and abs(means[1] - 128 / 255) < 1e-6

    def test_unknown_mime_quarantined(self):
        t = pa.table(
            {
                "mime": pa.array(["image/png"], pa.string()),
                "payload": pa.array([b"\x89PNG..."], pa.binary()),
            }
        )
        out = mm.Decoder()(t)
        assert out["decode_error"].to_pylist()[0].startswith("NotImplementedError")
        assert out["feature"].to_pylist()[0] == [0.0] * mm.FEATURE_DIM


class TestMultimodal:
    def test_media_near_dups_planted(self, ray_session):
        from gliner_ray.queries.corpus_ops import media_near_dups

        t = media_near_dups("unused")
        pairs = {(r["id_a"], r["id_b"]) for r in t.to_pylist()}
        # three re-encoded images planted under ids 1000..1002 must
        # pair with their sources, and nothing else survives cosine≈1
        assert pairs == {(0, 1000), (3, 1001), (6, 1002)}

    def test_decode_requires_fake_flag(self):
        with pytest.raises(NotImplementedError):
            mm.DecodeStub(fake=False)

    def test_decode_deterministic_features(self):
        import ray.data as rd

        t = mm.synth_media_table(n=12, seed=1)
        ds = rd.from_arrow(t)
        out1 = mm.decode_features(ds, fake=True).to_pandas()
        out2 = mm.decode_features(rd.from_arrow(t), fake=True).to_pandas()
        assert list(out1["payload_sha256"]) == list(out2["payload_sha256"])
        assert "payload" not in out1.columns
        assert all(len(f) == 16 for f in out1["feature"])

    def test_resize_bounds(self):
        t = mm.synth_media_table(n=24, seed=2)
        out = mm.ResizeStub(max_side=512)(t)
        w = out["resized_width"].to_pylist()
        h = out["resized_height"].to_pylist()
        kinds = out["kind"].to_pylist()
        for kind, wi, hi in zip(kinds, w, h):
            if kind != "audio":
                assert wi <= 512 and hi <= 512

    def test_frame_plan(self):
        t = mm.synth_media_table(n=9, seed=3)
        out = mm.frame_sample_plan_batch(t, fps=2.0)
        for kind, dur, plan in zip(
            out["kind"].to_pylist(),
            out["meta_duration_ms"].to_pylist(),
            out["frame_ts_ms"].to_pylist(),
        ):
            if kind == "video":
                assert plan and plan[0] == 0 and all(b - a == 500 for a, b in zip(plan, plan[1:]))
            else:
                assert plan == []


class TestHashJoin:
    def test_matches_pyarrow_join_and_handles_tiny_sides(self):
        """The union-partition hash_join must equal a plain pyarrow
        inner join — including the 1-row-side case where Ray 2.49's
        Dataset.join crashes on empty hash partitions."""
        import ray.data as rd

        from gliner_ray.functions.joins import hash_join

        left = pa.table(
            {
                "k": pa.array([1, 2, 2, 3, 9], pa.int64()),
                "v": pa.array(["a", "b", "c", "d", "e"], pa.string()),
            }
        )
        right = pa.table(
            {
                "rk": pa.array([2, 3, 4], pa.int64()),
                "w": pa.array([20, 30, 40], pa.int32()),
            }
        )
        got = (
            hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk")
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)
        )
        want = (
            left.join(right.rename_columns(["k", "w"]), keys=["k"], join_type="inner")
            .to_pandas()
            .sort_values(["k", "v"])
            .reset_index(drop=True)[got.columns.tolist()]
        )
        assert got.astype(want.dtypes.to_dict()).equals(want)

        # one-row right side: every partition but one is right-empty
        tiny = pa.table({"rk": pa.array([2], pa.int64()), "w": pa.array([7], pa.int32())})
        out = hash_join(rd.from_arrow(left), rd.from_arrow(tiny), "k", "rk").to_pandas()
        assert sorted(out["v"]) == ["b", "c"]
        assert set(out["w"]) == {7}

    def test_overlapping_columns_rejected(self):
        import ray.data as rd

        from gliner_ray.functions.joins import hash_join

        t = pa.table({"k": pa.array([1], pa.int64()), "x": pa.array([1], pa.int64())})
        with pytest.raises(ValueError):
            hash_join(rd.from_arrow(t), rd.from_arrow(t), "k", "k")

    def test_left_outer_keeps_unmatched_with_nulls(self):
        import pandas as pd
        import ray.data as rd

        from gliner_ray.functions.joins import hash_join

        left = pa.table(
            {
                "k": pa.array([1, 2, 3, 9], pa.int64()),
                "v": pa.array(["a", "b", "c", "z"], pa.string()),
            }
        )
        right = pa.table(
            {"rk": pa.array([2, 3], pa.int64()), "w": pa.array([20, 30], pa.int64())}
        )
        out = (
            hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", how="left")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert out["k"].tolist() == [1, 2, 3, 9]
        assert out["w"].tolist()[1:3] == [20, 30]
        assert pd.isna(out["w"][0]) and pd.isna(out["w"][3])
        with pytest.raises(ValueError):
            hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", how="cross")

    def test_full_and_right_outer_coalesce_keys(self):
        """full/right outer: unmatched rows survive from BOTH/right
        sides and the key column is non-null on right-only rows
        (coalesced back from the join key)."""
        import pandas as pd
        import ray.data as rd

        from gliner_ray.functions.joins import hash_join

        left = pa.table(
            {
                "k": pa.array([1, 2, 3], pa.int64()),
                "v": pa.array(["a", "b", "c"], pa.string()),
            }
        )
        right = pa.table(
            {"rk": pa.array([2, 3, 4, 7], pa.int64()),
             "w": pa.array([20, 30, 40, 70], pa.int64())}
        )
        out = (
            hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", how="full")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        # every key from both sides, exactly once; key never null
        assert out["k"].tolist() == [1, 2, 3, 4, 7]
        assert pd.isna(out["w"][0]) and out["w"].tolist()[1:] == [20, 30, 40, 70]
        assert pd.isna(out["v"][3]) and pd.isna(out["v"][4])

        out_r = (
            hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", how="right")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert out_r["k"].tolist() == [2, 3, 4, 7]  # left-only k=1 dropped
        assert out_r["v"].tolist()[:2] == ["b", "c"]
        assert pd.isna(out_r["v"][2]) and pd.isna(out_r["v"][3])

    def test_full_outer_string_keys(self):
        import pandas as pd
        import ray.data as rd

        from gliner_ray.functions.joins import hash_join

        left = pa.table(
            {"k": pa.array(["x", "y"], pa.string()),
             "v": pa.array([1, 2], pa.int64())}
        )
        right = pa.table(
            {"rk": pa.array(["y", "z"], pa.string()),
             "w": pa.array([20, 30], pa.int64())}
        )
        out = (
            hash_join(rd.from_arrow(left), rd.from_arrow(right), "k", "rk", how="full")
            .to_pandas()
            .sort_values("k", ignore_index=True)
        )
        assert out["k"].tolist() == ["x", "y", "z"]
        assert pd.isna(out["w"][0]) and pd.isna(out["v"][2])


class TestAsofJoin:
    def _sides(self):
        import pandas as pd

        left = pa.table(
            {
                "k": pa.array([1, 1, 1, 2, 3], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        ["2024-01-01 09:00", "2024-01-01 10:00", "2024-01-01 11:00",
                         "2024-01-01 10:00", "2024-01-01 10:00"]
                    ),
                    pa.timestamp("us"),
                ),
                "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
            }
        )
        right = pa.table(
            {
                "k": pa.array([1, 1, 2], pa.int64()),
                "ts": pa.array(
                    pd.to_datetime(
                        ["2024-01-01 09:30", "2024-01-01 10:00", "2024-01-01 10:30"]
                    ),
                    pa.timestamp("us"),
                ),
                "w": pa.array([10, 20, 30], pa.int64()),
            }
        )
        return left, right

    def test_backward_inner_matches_merge_asof(self):
        import pandas as pd
        import ray.data as rd

        from gliner_ray.functions.joins import asof_join

        left, right = self._sides()
        got = (
            asof_join(rd.from_arrow(left), rd.from_arrow(right), on="ts", by="k")
            .to_pandas()
            .sort_values(["k", "ts"])
            .reset_index(drop=True)
        )
        want = pd.merge_asof(
            left.to_pandas().sort_values("ts"),
            right.to_pandas().sort_values("ts"),
            on="ts", by="k", direction="backward",
        ).dropna(subset=["w"]).sort_values(["k", "ts"]).reset_index(drop=True)
        # exact match at equal ts allowed; unmatched (k=1@09:00,
        # k=2@10:00 whose only click is later, k=3) dropped
        assert got["v"].tolist() == [2, 3]
        assert got["w"].tolist() == [20, 20]
        assert got["v"].tolist() == want["v"].tolist()
        assert got["w"].astype(int).tolist() == want["w"].astype(int).tolist()

    def test_left_keeps_unmatched_with_nulls(self):
        import ray.data as rd

        from gliner_ray.functions.joins import asof_join

        left, right = self._sides()
        got = (
            asof_join(rd.from_arrow(left), rd.from_arrow(right), on="ts", by="k",
                      how="left")
            .to_pandas()
            .sort_values(["k", "ts", "v"])
            .reset_index(drop=True)
        )
        assert len(got) == left.num_rows
        assert got.loc[got["v"] == 1, "w"].isna().all()   # before first click
        assert got.loc[got["v"] == 5, "w"].isna().all()   # key absent on right
        assert got.loc[got["v"] == 2, "w"].tolist() == [20]

    def test_forward_direction(self):
        import ray.data as rd

        from gliner_ray.functions.joins import asof_join

        left, right = self._sides()
        got = (
            asof_join(rd.from_arrow(left), rd.from_arrow(right), on="ts", by="k",
                      direction="forward")
            .to_pandas()
            .sort_values(["k", "ts"])
            .reset_index(drop=True)
        )
        # k=1@09:00 -> 09:30(10); 10:00 -> 10:00(20); 11:00 -> none
        assert got["v"].tolist() == [1, 2, 4]
        assert got["w"].tolist() == [10, 20, 30]

    def test_empty_right_inner_empty_left_pad(self):
        import ray.data as rd

        from gliner_ray.functions.joins import asof_join

        left, right = self._sides()
        empty_r = right.schema.empty_table()
        inner = asof_join(
            rd.from_arrow(left), rd.from_arrow(empty_r), on="ts", by="k"
        ).to_pandas()
        assert len(inner) == 0
        padded = asof_join(
            rd.from_arrow(left), rd.from_arrow(empty_r), on="ts", by="k", how="left"
        ).to_pandas()
        assert len(padded) == left.num_rows and padded["w"].isna().all()

    def test_bad_direction_and_overlap_rejected(self):
        import ray.data as rd

        from gliner_ray.functions.joins import asof_join

        left, right = self._sides()
        with pytest.raises(ValueError):
            asof_join(rd.from_arrow(left), rd.from_arrow(right), on="ts", by="k",
                      direction="sideways")
        both_v = right.rename_columns(["k", "ts", "v"])
        with pytest.raises(ValueError):
            asof_join(rd.from_arrow(left), rd.from_arrow(both_v), on="ts", by="k")


class TestCountMin:
    def test_estimates_never_undercount_and_exact_when_sparse(self):
        from gliner_ray.functions.sketch import CountMin, hash_column

        vals = ["a"] * 50 + ["b"] * 20 + ["c"] * 5 + ["d"]
        sk = CountMin().add_hashes(hash_column(pa.array(vals, pa.string())))
        est = sk.estimate_hashes(hash_column(pa.array(["a", "b", "c", "d"], pa.string())))
        # sparse load (4 values in 2048 counters) → exact
        assert list(est) == [50, 20, 5, 1]

    def test_merge_order_independent(self):
        from gliner_ray.functions.sketch import CountMin, hash_column

        h1 = hash_column(pa.array(["x"] * 7 + ["y"], pa.string()))
        h2 = hash_column(pa.array(["y"] * 3 + ["z"], pa.string()))
        a = CountMin().add_hashes(h1).merge(CountMin().add_hashes(h2))
        b = CountMin().add_hashes(h2).merge(CountMin().add_hashes(h1))
        np.testing.assert_array_equal(a.tab, b.tab)

    def test_heavy_hitters_find_all_planted(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.sketch import heavy_hitters

        rng = np.random.RandomState(5)
        # planted: two heavy values in a long tail, split across blocks
        vals = (
            ["hot1"] * 400 + ["hot2"] * 300
            + [f"tail{i}" for i in rng.randint(0, 5000, size=3300)]
        )
        rng.shuffle(vals)
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(7)
        out = heavy_hitters(ds, "v", phi=0.05).to_pandas()
        got = dict(zip(out["value"], out["est_count"]))
        assert "hot1" in got and "hot2" in got
        # CMS only over-counts
        assert got["hot1"] >= 400 and got["hot2"] >= 300
        # nothing from the tail clears 5% of 4000
        assert all(v.startswith("hot") for v in got)

    def test_heavy_hitters_exact_counts_and_threshold(self, ray_session):
        """heavy_hitters_exact returns TRUE counts (not CMS estimates)
        and applies the phi*n threshold to them — partition-layout
        invariant."""
        import pyarrow as pa
        import ray.data as rd

        from gliner_ray.functions.sketch import heavy_hitters_exact

        vals = ["hot"] * 40 + ["warm"] * 12 + [f"cold{i}" for i in range(48)]
        t = pa.table({"v": pa.array(vals, pa.string())})
        for parts in (1, 7):
            ds = rd.from_arrow(t).repartition(parts)
            out = heavy_hitters_exact(ds, "v", phi=0.1).to_pandas()
            got = dict(zip(out["value"], out["n_count"]))
            assert got == {"hot": 40, "warm": 12}  # exact, cold* below 10%

    def test_heavy_hitters_deterministic_across_layouts(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.sketch import heavy_hitters

        t = pa.table({"v": pa.array(["a"] * 30 + ["b"] * 9 + ["c"], pa.string())})
        a = heavy_hitters(rd.from_arrow(t), "v", phi=0.2).to_pandas()
        b = heavy_hitters(rd.from_arrow(t).repartition(5), "v", phi=0.2).to_pandas()
        assert sorted(zip(a["value"], a["est_count"])) == sorted(
            zip(b["value"], b["est_count"])
        )

    def test_heavy_hitters_exact_spread_hitter_not_dropped(self, ray_session):
        """ADVICE-high regression: a true heavy hitter spread evenly
        across blocks where EVERY block has many locally-hotter values
        must survive the candidate pass. With the old fixed default
        (candidates_per_block=64 < 1/phi) this returned empty; the
        ceil(1/phi) default restores the no-false-negative guarantee."""
        import ray.data as rd

        from gliner_ray.functions.sketch import heavy_hitters_exact

        parts = 8
        rows = []
        for b in range(parts):
            # 100 block-local values, 3 copies each (locally hotter) ...
            rows += [f"blk{b}_loc{i}" for i in range(100) for _ in range(3)]
            # ... plus 2 copies of the globally-heavy value per block
            rows += ["global_hot"] * 2
        t = pa.table({"v": pa.array(rows, pa.string())})
        n = len(rows)
        phi = 14 / n  # global_hot has 16 >= phi*n; locals have 3 each
        ds = rd.from_arrow(t).repartition(parts)
        out = heavy_hitters_exact(ds, "v", phi=phi).to_pandas()
        got = dict(zip(out["value"], out["n_count"]))
        assert got.get("global_hot") == 2 * parts

    def test_heavy_hitters_exact_rejects_low_candidate_budget(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.sketch import heavy_hitters_exact

        ds = rd.from_arrow(pa.table({"v": pa.array(["a", "b"], pa.string())}))
        with pytest.raises(ValueError, match="candidates_per_block"):
            heavy_hitters_exact(ds, "v", phi=0.001, candidates_per_block=64)

    def test_heavy_hitters_exact_empty_string_and_nulls(self, ray_session):
        """ADVICE-low regression: '' is a reportable value (no sentinel
        collision) and nulls are excluded from n."""
        import ray.data as rd

        from gliner_ray.functions.sketch import heavy_hitters_exact

        vals = [""] * 40 + ["x"] * 40 + [None] * 100 + [f"t{i}" for i in range(20)]
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())})).repartition(3)
        # n = 100 non-null; phi=0.3 keeps '' and 'x' (40 each)
        out = heavy_hitters_exact(ds, "v", phi=0.3).to_pandas()
        got = dict(zip(out["value"], out["n_count"]))
        assert got == {"": 40, "x": 40}


class TestHyperLogLog:
    def test_estimate_within_tolerance(self):
        from gliner_ray.functions import sketch

        n = 200_000
        h = sketch.splitmix64(np.arange(n, dtype=np.int64))
        hll = sketch.HyperLogLog(p=14).add_hashes(h)
        est = hll.estimate()
        assert abs(est - n) / n < 0.02  # ~1.04/sqrt(2^14) ≈ 0.8% std err

    def test_merge_equals_single_pass(self):
        from gliner_ray.functions import sketch

        h = sketch.splitmix64(np.arange(50_000, dtype=np.int64))
        whole = sketch.HyperLogLog(p=12).add_hashes(h)
        parts = [
            sketch.HyperLogLog(p=12).add_hashes(chunk)
            for chunk in np.array_split(h, 7)
        ]
        merged = parts[0]
        for s in parts[1:]:
            merged.merge(s)
        assert np.array_equal(merged.registers, whole.registers)

    def test_small_range_linear_counting_exact_ish(self):
        from gliner_ray.functions import sketch

        h = sketch.splitmix64(np.arange(100, dtype=np.int64))
        est = sketch.HyperLogLog(p=14).add_hashes(h).estimate()
        assert abs(est - 100) <= 3

    def test_bit_length_exact_at_boundaries(self):
        from gliner_ray.functions.sketch import _bit_length_u64

        xs = np.array(
            [0, 1, 2, 3, (1 << 52) - 1, 1 << 52, (1 << 53) + 1,
             (1 << 63) - 1, 1 << 63, (1 << 64) - 1],
            dtype=np.uint64,
        )
        got = _bit_length_u64(xs)
        want = np.array([int(x).bit_length() for x in xs.tolist()])
        assert np.array_equal(got, want)

    def test_dataset_grouped_approx_distinct(self):
        import ray.data as rd

        from gliner_ray.functions.sketch import approx_distinct

        rng = np.random.default_rng(0)
        users = rng.integers(0, 500, size=20_000)
        kinds = np.where(np.arange(20_000) % 2 == 0, "a", "b")
        t = pa.table(
            {
                "user_id": pa.array(users, pa.int64()),
                "event_type": pa.array(kinds, pa.string()),
            }
        )
        out = approx_distinct(
            rd.from_arrow(t).repartition(5), "user_id", group_col="event_type", p=12
        ).to_pandas()
        exact = (
            t.to_pandas().groupby("event_type")["user_id"].nunique().to_dict()
        )
        assert set(out["event_type"]) == {"a", "b"}
        for _, row in out.iterrows():
            e = exact[row["event_type"]]
            assert abs(row["approx_distinct"] - e) / e < 0.05


class TestDistributedKmeans:
    """functions/clustering.py: full-data Lloyd with metadata-sized
    per-block partials, vs the sequential same-order oracle."""

    def _planted(self, n_per=60, k=4, d=16, seed=3):
        rng = np.random.RandomState(seed)
        centers = rng.randn(k, d) * 5
        rows = np.concatenate(
            [centers[i] + rng.randn(n_per, d) * 0.05 for i in range(k)]
        )
        return rows.astype(np.float32)

    def _ds(self, rows):
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(range(len(rows)), pa.int64()),
                    "embedding": pa.array(
                        [r.tolist() for r in rows], pa.list_(pa.float32())
                    ),
                }
            )
        ).repartition(6)

    def test_matches_sequential_oracle(self, ray_session):
        from gliner_ray.functions import clustering as fc

        rows = self._planted()
        init = rows[::60][:4].astype(np.float64)  # one per planted cluster
        cents = fc.kmeans(
            self._ds(rows), n_clusters=4, n_iter=5, init_centroids=init
        )
        ref = fc.kmeans_sequential(rows, n_clusters=4, n_iter=5, init_centroids=init)
        np.testing.assert_allclose(cents, ref, atol=1e-8)

    def test_recovers_planted_clusters(self, ray_session):
        from gliner_ray.functions import clustering as fc

        rows = self._planted()
        ds = self._ds(rows)
        cents = fc.kmeans(ds, n_clusters=4, n_iter=8, seed=0)
        out = fc.assign_clusters(ds, cents).to_pandas()
        # every planted cluster maps to exactly one k-means cluster
        truth = np.repeat(np.arange(4), 60)
        for t in range(4):
            got = out.loc[truth == t, "cluster"]
            assert got.nunique() == 1, f"planted cluster {t} split"
        assert out["cluster"].nunique() == 4

    def test_assignment_deterministic_across_runs(self, ray_session):
        from gliner_ray.functions import clustering as fc

        rows = self._planted(seed=9)
        a = fc.kmeans(self._ds(rows), n_clusters=4, n_iter=4, seed=1)
        b = fc.kmeans(self._ds(rows), n_clusters=4, n_iter=4, seed=1)
        np.testing.assert_array_equal(a, b)


class TestBloomFilter:
    """functions/joins.BloomFilter: the broadcast-prune primitive for
    exact semi-joins. The contract that makes bloom_semi_join EXACT is
    'no false negatives' — anything added always tests positive."""

    def test_no_false_negatives(self):
        from gliner_ray.functions.joins import BloomFilter

        rng = np.random.default_rng(7)
        keys = rng.integers(-(2**62), 2**62, size=20_000)
        bf = BloomFilter(nbits=1 << 18).add(keys)
        assert bf.contains(keys).all()

    def test_false_positive_rate_bounded(self):
        from gliner_ray.functions.joins import BloomFilter

        rng = np.random.default_rng(11)
        members = rng.integers(0, 2**40, size=10_000)
        bf = BloomFilter(nbits=1 << 20).add(members)
        probes = rng.integers(2**41, 2**42, size=50_000)  # disjoint range
        fpr = bf.contains(probes).mean()
        # m/n = 2^20/10^4 ≈ 105 bits/key, k=7 → theoretical fpr ≪ 1e-4
        assert fpr < 0.01, fpr

    def test_merge_is_union(self):
        from gliner_ray.functions.joins import BloomFilter

        a_keys = np.arange(0, 500, dtype=np.int64)
        b_keys = np.arange(10_000, 10_500, dtype=np.int64)
        a = BloomFilter(nbits=1 << 16).add(a_keys)
        b = BloomFilter(nbits=1 << 16).add(b_keys)
        a.merge(b)
        assert a.contains(a_keys).all() and a.contains(b_keys).all()

    def test_semi_join_exact_vs_pandas(self, ray_session):
        import pandas as pd
        import ray.data as rd

        from gliner_ray.functions.joins import bloom_semi_join

        rng = np.random.default_rng(3)
        left = pd.DataFrame(
            {"k": rng.integers(0, 300, size=5_000), "v": np.arange(5_000)}
        )
        right = pd.DataFrame({"k": np.unique(rng.integers(0, 300, size=80))})
        # tiny filter forces real false positives → verification join
        # must still make the result exact
        got = (
            bloom_semi_join(
                rd.from_pandas(left), rd.from_pandas(right), "k", "k",
                nbits=1 << 10,
            )
            .to_pandas()
            .sort_values(["k", "v"], ignore_index=True)
        )
        want = left[left["k"].isin(set(right["k"]))].sort_values(
            ["k", "v"], ignore_index=True
        )
        pd.testing.assert_frame_equal(got[["k", "v"]], want)


class TestSubstringDups:
    """functions/dedup.substring_dups — ExactSubstr-style arbitrary
    alignment repeated-substring detection."""

    def _corpus(self):
        import random
        import ray.data as rd

        rng = random.Random(5)
        alpha = "abcdefghijklmnopqrstuvwxyz"
        docs = [
            "".join(rng.choice(alpha) for _ in range(400)) for _ in range(12)
        ]
        shared = "".join(rng.choice(alpha) for _ in range(100))
        # plant at ARBITRARY (non-stride-aligned) offsets in docs 2 and 9
        docs[2] = docs[2][:37] + shared + docs[2][37:]
        docs[9] = docs[9][:203] + shared + docs[9][203:]
        return rd.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string()),
                }
            )
        ), docs, shared

    def test_finds_planted_cross_alignment(self):
        ds, docs, shared = self._corpus()
        out = fdedup.substring_dups(ds, L=64, stride=8).to_pylist()
        cross = [
            r for r in out
            if {r["doc_a"], r["doc_b"]} == {2, 9}
        ]
        assert cross, "planted shared run not detected"
        for r in cross:
            # every reported window must be byte-equal in both docs
            # (the window column is raw bytes — it may split code points)
            a = docs[r["doc_a"]][r["off_a"]:r["off_a"] + 64]
            b = docs[r["doc_b"]][r["off_b"]:r["off_b"] + 64]
            assert a == b == r["window"].decode("utf-8")
            assert r["window"].decode("utf-8") in shared
        # random 400-char docs share no 64-char runs besides the plant
        for r in out:
            if {r["doc_a"], r["doc_b"]} & {2, 9} == set():
                assert r["doc_a"] == r["doc_b"], r

    def test_distributed_path_matches_broadcast(self):
        ds, _, _ = self._corpus()
        fast = fdedup.substring_dups(ds, L=64, stride=8).to_pylist()
        dist = fdedup.substring_dups(
            ds, L=64, stride=8, pair_broadcast_limit=0
        ).to_pylist()
        key = lambda r: (r["doc_a"], r["off_a"], r["doc_b"], r["off_b"])
        assert sorted(map(key, fast)) == sorted(map(key, dist))

    def test_short_docs_and_empty(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(
            pa.table(
                {"doc_id": pa.array([0, 1], pa.int64()),
                 "text": pa.array(["tiny", ""], pa.string())}
            )
        )
        assert fdedup.substring_dups(ds, L=64, stride=8).num_rows == 0

    def test_merge_window_runs_recovers_planted_run(self):
        ds, docs, shared = self._corpus()
        hits = fdedup.substring_dups(ds, L=64, stride=8)
        runs = fdedup.merge_window_runs(hits, L=64, stride=8).to_pylist()
        cross = [r for r in runs if {r["doc_a"], r["doc_b"]} == {2, 9}]
        assert len(cross) == 1, cross  # ONE maximal run, not window shards
        r = cross[0]
        # the merged run must lie inside the planted 100-char region
        a0 = 37 if r["doc_a"] == 2 else 203
        b0 = 203 if r["doc_a"] == 2 else 37
        assert r["start_a"] >= a0 and r["start_a"] + r["length"] <= a0 + 100
        assert r["start_b"] >= b0 and r["start_b"] + r["length"] <= b0 + 100
        assert r["length"] >= 64
        # run content must be byte-identical in both docs
        assert (
            docs[r["doc_a"]][r["start_a"]:r["start_a"] + r["length"]]
            == docs[r["doc_b"]][r["start_b"]:r["start_b"] + r["length"]]
        )

    def test_merge_window_runs_empty(self):
        empty = fdedup.substring_dups(
            _docs_ds([(0, "short"), (1, "tiny")]), L=64, stride=8
        )
        assert fdedup.merge_window_runs(empty, L=64).num_rows == 0


class TestSegmentDedupPaths:
    def test_broadcast_and_join_paths_agree(self, ray_session):
        from gliner_ray.functions.dedup import segment_dedup

        rows = [
            (0, "a b c d e f g h i j k l m n o p q r s t"),
            (1, "a b c d e f g h i j z z z z z z z z z z"),  # shares seg 0
            (2, "completely different words here in this one doc only x y"),
        ]
        fast = segment_dedup(_docs_ds(rows), n_words=10).to_pandas()
        dist = segment_dedup(
            _docs_ds(rows), n_words=10, owner_broadcast_limit=0
        ).to_pandas()
        key = ["doc_id", "n_kept", "clean_text"]
        a = fast[key].sort_values("doc_id", ignore_index=True)
        b = dist[key].sort_values("doc_id", ignore_index=True)
        pd.testing.assert_frame_equal(a, b)
        # doc 1's first segment is a dup of doc 0's → dropped
        assert a.loc[a.doc_id == 1, "n_kept"].item() == 1

    def test_rewrite_cuts_loser_keeps_owner(self, ray_session):
        from gliner_ray.functions.dedup import substring_dedup_rewrite

        ds, docs, shared = TestSubstringDups()._corpus()
        out = {
            r["doc_id"]: r
            for r in substring_dedup_rewrite(ds, L=64, stride=8)
            .to_pandas().to_dict("records")
        }
        assert len(out) == len(docs)
        # owner (doc 2, earlier offset) keeps its text intact
        assert out[2]["clean_text"] == docs[2] and out[2]["n_cut_bytes"] == 0
        # loser (doc 9) had a run cut, and the cut text was inside the plant
        assert out[9]["n_cut_bytes"] >= 64
        assert len(out[9]["clean_text"]) == len(docs[9]) - out[9]["n_cut_bytes"]
        assert shared not in out[9]["clean_text"]  # the full plant is gone
        # untouched docs unchanged
        for d in (0, 1, 3):
            assert out[d]["clean_text"] == docs[d]

    def test_non_ascii_windows_and_cuts(self, ray_session):
        """Regression (round-3 ADVICE): multi-byte code points. Sampled
        windows may split a code point — the window column must be
        binary, and rewrite cut edges must snap to UTF-8 boundaries so
        clean_text stays a valid Arrow string."""
        import random

        import ray.data as rd

        from gliner_ray.functions.dedup import (
            substring_dedup_rewrite, substring_dups,
        )

        rng = random.Random(11)
        # 2-byte (é), 3-byte (界), 4-byte (😀) code points mixed with ASCII
        alpha = "abcdé界😀xyz"
        docs = ["".join(rng.choice(alpha) for _ in range(300)) for _ in range(6)]
        shared = "".join(rng.choice(alpha) for _ in range(80))
        docs[1] = docs[1][:17] + shared + docs[1][17:]
        docs[4] = docs[4][:111] + shared + docs[4][111:]
        ds = rd.from_arrow(pa.table({
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }))
        hits = fdedup.substring_dups(ds, L=48, stride=4)
        cross = [r for r in hits.to_pylist()
                 if {r["doc_a"], r["doc_b"]} == {1, 4}]
        assert cross, "planted non-ASCII shared run not detected"
        out = substring_dedup_rewrite(ds, L=48, stride=4).to_pandas()
        assert len(out) == len(docs)
        for txt in out["clean_text"]:
            txt.encode("utf-8")  # valid round-trippable string
        cut = out.set_index("doc_id")["n_cut_bytes"]
        assert cut[4] > 0 and cut[1] == 0  # loser cut, owner intact


class TestLmPerplexity:
    def test_gibberish_scores_higher_and_deterministic(self, ray_session):
        from gliner_ray.functions.text import lm_perplexity

        common = "the quick brown fox jumps over the lazy dog " * 4
        rows = [(i, common) for i in range(8)]
        rows.append((100, "zqxj vkpw qzzx jjjj wwqq xxkk zzvv ppqq"))
        out = {
            r["doc_id"]: r["perplexity"]
            for r in lm_perplexity(_docs_ds(rows)).to_pandas().to_dict("records")
        }
        # the gibberish doc must be the clear perplexity outlier
        assert out[100] > 2 * max(out[i] for i in range(8))
        again = {
            r["doc_id"]: r["perplexity"]
            for r in lm_perplexity(_docs_ds(rows)).to_pandas().to_dict("records")
        }
        assert out == again  # deterministic: fixed counts, fixed math

    def test_partials_merge_equals_sequential(self, ray_session):
        """The per-block count partials summed must equal a sequential
        count over the concatenated corpus (mergeability)."""
        import numpy as np

        from gliner_ray.functions.text import char_bigram_model

        texts = ["hello world", "hold the door", "wold hello"]
        rows = list(enumerate(texts))
        got = char_bigram_model(_docs_ds(rows))
        want = np.zeros((256, 256), dtype=np.int64)
        for t in texts:
            b = np.frombuffer(t.encode(), np.uint8)
            for a, c in zip(b[:-1], b[1:]):
                want[a, c] += 1
        np.testing.assert_array_equal(got, want)

    def test_short_docs_nan(self, ray_session):
        from gliner_ray.functions.text import lm_perplexity

        import math

        out = lm_perplexity(_docs_ds([(0, "x"), (1, "ab")])).to_pandas()
        assert math.isnan(out.loc[out.doc_id == 0, "perplexity"].item())
        assert out.loc[out.doc_id == 1, "perplexity"].item() > 0


class TestGlobalShuffle:
    def test_positions_are_exact_permutation(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.sampling import global_shuffle_positions

        ids = list(range(1, 501))
        ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64())}))
        out = global_shuffle_positions(ds, "doc_id", n_bins=16).to_pandas()
        assert sorted(out["pos"]) == list(range(1, 501))
        assert sorted(out["doc_id"]) == ids

    def test_deterministic_and_layout_invariant(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.sampling import global_shuffle_positions

        ids = pa.table({"doc_id": pa.array(range(100), pa.int64())})
        a = (
            global_shuffle_positions(rd.from_arrow(ids), "doc_id")
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        b = (
            global_shuffle_positions(
                rd.from_arrow(ids).repartition(7), "doc_id"
            )
            .to_pandas().sort_values("doc_id", ignore_index=True)
        )
        assert a["pos"].tolist() == b["pos"].tolist()


class TestBm25:
    def test_empty_corpus(self, ray_session):
        import ray.data as rd

        from gliner_ray.functions.text import bm25_topk

        ds = rd.from_arrow(
            pa.table({"doc_id": pa.array([], pa.int64()),
                      "text": pa.array([], pa.string())})
        )
        out = bm25_topk(ds, ["alpha"], k=5)
        assert out.num_rows == 0

    def test_tf_and_dl_ordering(self, ray_session):
        """More query-term hits rank higher; at equal tf the shorter
        doc wins (BM25 length normalization)."""
        import ray.data as rd

        from gliner_ray.functions.text import bm25_topk

        docs = pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(
                    [
                        "alpha alpha alpha beta",          # tf=3
                        "alpha beta gamma delta",          # tf=1, dl=4
                        "alpha beta gamma delta eps zeta", # tf=1, dl=6
                        "no match here",                   # tf=0 -> absent
                    ],
                    pa.string(),
                ),
            }
        )
        out = bm25_topk(rd.from_arrow(docs), ["alpha"], k=10).to_pylist()
        assert [r["doc_id"] for r in out] == [1, 2, 3]
        assert out[0]["score"] > out[1]["score"] > out[2]["score"]
