"""Property-based conformance tests (hypothesis).

The reference ships no property tests (SURVEY.md §5); these pin the
kernel invariants that the e2e parity gate depends on, over random
inputs rather than hand-picked cases."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from gliner_ray.kernels.chunk import chunk_token_ranges
from gliner_ray.kernels.decode import (
    decode_candidates,
    decode_logits,
    greedy_nms,
    has_overlapping,
    has_overlapping_nested,
)
from gliner_ray.kernels.linking import link_variant_edges
from gliner_ray.kernels.normalize import normalize_ident, normalize_primary, variants
from gliner_ray.kernels.tokenize import tokenize_with_offsets

spans_strategy = st.lists(
    st.tuples(
        st.integers(0, 20),                      # start
        st.integers(0, 8),                       # width-1
        st.sampled_from(["a", "b", "c"]),        # label
        st.floats(0.01, 0.99),                   # score
    ),
    max_size=25,
).map(lambda xs: [(s, s + w, lab, sc) for s, w, lab, sc in xs])


class TestNMSProperties:
    @given(spans_strategy, st.booleans(), st.booleans())
    @settings(max_examples=200, deadline=None)
    def test_kept_spans_mutually_compatible(self, spans, flat, multi):
        kept = greedy_nms(list(spans), flat_ner=flat, multi_label=multi)
        pred = has_overlapping if flat else has_overlapping_nested
        for i in range(len(kept)):
            for j in range(i + 1, len(kept)):
                assert not pred(kept[i], kept[j], multi)

    @given(spans_strategy, st.booleans())
    @settings(max_examples=200, deadline=None)
    def test_dropped_spans_blocked_by_higher_rank(self, spans, flat):
        # greedy first-fit: every dropped candidate overlaps a kept span
        # that precedes it in the (stable) score-descending order
        kept = greedy_nms(list(spans), flat_ner=flat)
        pred = has_overlapping if flat else has_overlapping_nested
        order = sorted(spans, key=lambda x: -x[-1])
        kept_set = set(kept)
        for idx, cand in enumerate(order):
            if cand in kept_set:
                continue
            earlier_kept = [k for k in order[:idx] if k in kept_set]
            assert any(pred(cand, k) for k in earlier_kept)

    @given(spans_strategy)
    @settings(max_examples=100, deadline=None)
    def test_output_sorted_and_subset(self, spans):
        kept = greedy_nms(list(spans))
        starts = [k[0] for k in kept]
        assert starts == sorted(starts)
        assert all(k in spans for k in kept)


class TestDenseSparseEquivalence:
    @given(
        st.integers(1, 12),   # n_tokens
        st.integers(1, 4),    # K
        st.integers(1, 3),    # C
        st.integers(0, 10_000),
    )
    @settings(max_examples=100, deadline=None)
    def test_decode_paths_agree(self, L, K, C, seed):
        rng = np.random.RandomState(seed)
        logits = rng.randn(L, K, C) * 3
        id_to_class = {i + 1: f"c{i}" for i in range(C)}
        dense = decode_logits(L, id_to_class, logits)
        probs = 1 / (1 + np.exp(-logits))
        cands = [
            (s, k, id_to_class[c + 1], float(probs[s, k, c]))
            for s in range(L)
            for k in range(K)
            for c in range(C)
            if probs[s, k, c] > 0.5
        ]
        sparse = decode_candidates(cands, L)
        assert [x[:3] for x in dense] == [x[:3] for x in sparse]


class TestChunkProperties:
    @given(st.integers(0, 5000), st.integers(2, 400), st.integers(0, 50))
    @settings(max_examples=200, deadline=None)
    def test_full_coverage_no_gaps(self, n, max_len, overlap):
        if overlap >= max_len:
            overlap = max_len - 1
        ranges = chunk_token_ranges(n, max_len, overlap)
        assert ranges[0][0] == 0
        assert ranges[-1][1] == max(n, 0)
        for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
            assert s1 <= e0  # no gap
            assert e1 > e0   # progress
            assert e0 - s1 == overlap  # exact lookback


class TestTokenizerProperties:
    @given(st.text(max_size=200))
    @settings(max_examples=200, deadline=None)
    def test_offsets_slice_back(self, text):
        toks, starts, ends = tokenize_with_offsets(text)
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t
        # offsets strictly increasing, non-overlapping
        for i in range(1, len(toks)):
            assert starts[i] >= ends[i - 1]

    @given(st.text(max_size=100))
    @settings(max_examples=100, deadline=None)
    def test_no_whitespace_in_tokens(self, text):
        toks, _, _ = tokenize_with_offsets(text)
        assert all(not any(ch.isspace() for ch in t) for t in toks)


class TestNormalizeProperties:
    @given(st.text(max_size=60))
    @settings(max_examples=200, deadline=None)
    def test_idempotent(self, text):
        assert normalize_primary(normalize_primary(text)) == normalize_primary(text)
        assert normalize_ident(normalize_ident(text)) == normalize_ident(text)

    @given(st.text(max_size=60))
    @settings(max_examples=100, deadline=None)
    def test_variants_nonempty_unique(self, text):
        vs = variants(text)
        assert len(vs) == len(set(vs))
        assert all(v == v.lower() for v in vs)


class TestUnionFindProperties:
    @given(
        st.lists(
            st.tuples(st.sampled_from("abcdefgh"), st.sampled_from("abcdefgh")),
            max_size=20,
        ),
        st.integers(0, 1000),
    )
    @settings(max_examples=200, deadline=None)
    def test_edge_order_invariant(self, edges, seed):
        m1 = link_variant_edges(list(edges))
        rng = np.random.RandomState(seed)
        shuffled = list(edges)
        rng.shuffle(shuffled)
        m2 = link_variant_edges(shuffled)
        assert m1 == m2

    @given(
        st.lists(
            st.tuples(st.sampled_from("abcdef"), st.sampled_from("abcdef")),
            max_size=15,
        )
    )
    @settings(max_examples=200, deadline=None)
    def test_canonical_is_component_min(self, edges):
        m = link_variant_edges(list(edges))
        # brute-force components
        nodes = {v for e in edges for v in e}
        for v in nodes:
            comp = {v}
            changed = True
            while changed:
                changed = False
                for a, b in edges:
                    if a in comp and b not in comp:
                        comp.add(b); changed = True
                    if b in comp and a not in comp:
                        comp.add(a); changed = True
            assert m[v] == "ent:" + min(comp)


class TestSubwordProperties:
    """prepare_word_mask invariants (processor.py:130-155) under random
    words and piece lengths."""

    words_strategy = st.lists(
        st.text(alphabet="abcdefgh漢字", min_size=1, max_size=12), min_size=1, max_size=20
    )

    @given(words_strategy, st.integers(min_value=0, max_value=3),
           st.integers(min_value=1, max_value=5))
    @settings(max_examples=60, deadline=None)
    def test_words_mask_invariants(self, words, n_prompt_labels, piece_len):
        from gliner_ray.kernels.subword import ToySubwordTokenizer, build_prompt

        tok = ToySubwordTokenizer(piece_len=piece_len)
        prompt = build_prompt([f"label{i}" for i in range(n_prompt_labels)])
        enc = tok.encode_words(prompt + words, prompt_length=len(prompt))
        nz = [v for v in enc.words_mask if v > 0]
        # nonzero values are exactly 1..n_text_words, in order, once each
        assert nz == list(range(1, len(words) + 1))
        assert enc.text_length == len(words)
        # mask aligns with word_ids: value v sits at the FIRST subtoken
        # of text word v-1
        for pos, v in enumerate(enc.words_mask):
            if v > 0:
                wid = enc.word_ids[pos]
                assert wid == len(prompt) + v - 1
                assert enc.word_ids[pos - 1] != wid
        # ids and word_ids stay aligned
        assert len(enc.input_ids) == len(enc.word_ids) == len(enc.words_mask)

    @given(st.text(alphabet="abc漢字 .-_", max_size=60))
    @settings(max_examples=60, deadline=None)
    def test_cjk_offsets_roundtrip(self, text):
        from gliner_ray.kernels.tokenize import tokenize_with_offsets_cjk

        toks, starts, ends = tokenize_with_offsets_cjk(text)
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t
        # CJK chars always single-token
        for t in toks:
            if any("一" <= ch <= "鿿" for ch in t):
                assert len(t) == 1


# ---------------------------------------------------- media codecs


class TestCodecRoundTripProperties:
    """encode(decode(x)) == x for random shapes/content — the invariant
    the real multimodal decode path rests on."""

    @given(
        h=st.integers(1, 24),
        w=st.integers(1, 24),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_bmp_roundtrip(self, h, w, seed):
        from gliner_ray.functions import codecs

        rgb = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3)
        ).astype(np.uint8)
        np.testing.assert_array_equal(codecs.decode_bmp(codecs.encode_bmp(rgb)), rgb)

    @given(
        n=st.integers(1, 500),
        ch=st.integers(1, 2),
        rate=st.sampled_from([8000, 16000, 44100]),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_wav_roundtrip(self, n, ch, rate, seed):
        from gliner_ray.functions import codecs

        samples = (
            np.random.RandomState(seed).randint(-32768, 32768, size=(n, ch))
        ).astype(np.int16)
        got_rate, got = codecs.decode_wav(codecs.encode_wav(samples, rate))
        assert got_rate == rate
        np.testing.assert_array_equal(got, samples)

    @given(
        t=st.integers(0, 6),
        h=st.integers(1, 16),
        w=st.integers(1, 16),
        fps=st.integers(1, 60),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_y4m_roundtrip(self, t, h, w, fps, seed):
        from gliner_ray.functions import codecs

        frames = np.random.RandomState(seed).randint(
            0, 256, size=(t, h, w)
        ).astype(np.uint8)
        got_fps, got = codecs.decode_y4m(codecs.encode_y4m(frames, fps=fps))
        assert got_fps == fps
        np.testing.assert_array_equal(got, frames)

    @given(
        h=st.integers(1, 20),
        w=st.integers(1, 20),
        oh=st.integers(1, 20),
        ow=st.integers(1, 20),
        seed=st.integers(0, 2**31 - 1),
    )
    @settings(max_examples=40, deadline=None)
    def test_resize_shape_and_pixel_provenance(self, h, w, oh, ow, seed):
        from gliner_ray.functions import codecs

        rgb = np.random.RandomState(seed).randint(
            0, 256, size=(h, w, 3)
        ).astype(np.uint8)
        out = codecs.resize_nearest(rgb, ow, oh)
        assert out.shape == (oh, ow, 3)
        # every output pixel is an input pixel (nearest neighbour)
        flat_in = {bytes(px) for px in rgb.reshape(-1, 3)}
        assert all(bytes(px) in flat_in for px in out.reshape(-1, 3))


class TestOrderStatsProperties:
    """_exact_int_order_stats (the bin-narrowing engine behind
    quantile_disc / quantile_cont / quartiles) vs a numpy sort, under
    random signed-int arrays and random rank sets."""

    @given(
        vals=st.lists(
            st.integers(min_value=-(10**9), max_value=10**9),
            min_size=1, max_size=300,
        ),
        seed=st.integers(min_value=0, max_value=2**31),
    )
    @settings(max_examples=12, deadline=None)
    def test_matches_numpy_sort(self, vals, seed):
        import pyarrow as pa
        import ray.data as rd

        from gliner_ray.queries.relational import _exact_int_order_stats

        rng = np.random.default_rng(seed)
        n = len(vals)
        ranks = sorted(set(rng.integers(0, n, size=min(4, n)).tolist()))
        ds = rd.from_arrow(pa.table({"cents": pa.array(vals, pa.int64())}))
        got = _exact_int_order_stats(ds, lambda _: ranks)
        want = [int(np.sort(np.asarray(vals))[r]) for r in ranks]
        assert got == want


class TestRankTiesLemma:
    """The threshold lemma q_top_orders_rank_ties relies on: rows with
    RANK() ≤ k (descending) are EXACTLY the rows ≥ the k-th largest
    row value — under random duplicates."""

    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=20), min_size=1, max_size=200
        ),
        k=st.integers(min_value=1, max_value=5),
    )
    @settings(max_examples=50, deadline=None)
    def test_threshold_equals_rank_filter(self, vals, k):
        import pandas as pd

        s = pd.Series(vals)
        rank = s.rank(method="min", ascending=False)
        want = set(s.index[rank <= k])
        v3 = np.sort(np.asarray(vals))[::-1][min(k, len(vals)) - 1]
        got = set(s.index[s >= v3])
        assert got == want
