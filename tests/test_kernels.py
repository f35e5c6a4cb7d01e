"""Unit tests for the pure kernels (SURVEY.md §5 test strategy)."""

import numpy as np
import pytest

from gliner_ray.kernels.chunk import chunk_token_ranges
from gliner_ray.kernels.decode import (
    decode_candidates,
    decode_logits,
    greedy_nms,
    has_overlapping,
    has_overlapping_nested,
    is_nested,
)
from gliner_ray.kernels.evalmetrics import compute_prf, triple_prf
from gliner_ray.kernels.linking import link_variant_edges
from gliner_ray.kernels.normalize import normalize_ident, normalize_primary, variants
from gliner_ray.kernels.scoring import DeterministicScorerKernel
from gliner_ray.kernels.tokenize import tokenize_with_offsets


class TestTokenizer:
    # mirrors reference WhitespaceTokenSplitter (tokenizer.py:15-21)

    def test_offsets_roundtrip(self):
        text = "def parse_config(x):\n    return left-pad(x)"
        toks, starts, ends = tokenize_with_offsets(text)
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t

    def test_hyphen_underscore_chaining(self):
        toks, _, _ = tokenize_with_offsets("left-pad snake_case CVE-2021-44228")
        assert toks == ["left-pad", "snake_case", "CVE-2021-44228"]

    def test_symbols_split(self):
        toks, _, _ = tokenize_with_offsets("f(x)>=2.0,<3")
        assert toks == ["f", "(", "x", ")", ">", "=", "2", ".", "0", ",", "<", "3"]

    def test_empty(self):
        assert tokenize_with_offsets("") == ([], [], [])


class TestCjkSplitter:
    # the jieba/mecab splitters' role (tokenizer.py:24-266) as
    # deterministic char-class segmentation, routed per lang

    def test_cjk_chars_segment_individually(self):
        from gliner_ray.kernels.tokenize import tokenize_with_offsets_cjk

        text = "深度学习 deep learning"
        toks, starts, ends = tokenize_with_offsets_cjk(text)
        assert toks == ["深", "度", "学", "习", "deep", "learning"]
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t

    def test_latin_run_never_swallows_adjacent_cjk(self):
        from gliner_ray.kernels.tokenize import tokenize_with_offsets_cjk

        toks, _, _ = tokenize_with_offsets_cjk("abc中def")
        assert toks == ["abc", "中", "def"]

    def test_kana_and_hangul(self):
        from gliner_ray.kernels.tokenize import tokenize_with_offsets_cjk

        toks, _, _ = tokenize_with_offsets_cjk("カタカナ 한글")
        assert toks == ["カ", "タ", "カ", "ナ", "한", "글"]

    def test_route_for_lang(self):
        from gliner_ray.kernels.tokenize import route_for_lang

        assert route_for_lang("zh") == "maxmatch_zh"
        assert route_for_lang("ja") == "cjk"
        assert route_for_lang("ko") == "cjk"
        assert route_for_lang("zh-CN") == "maxmatch_zh"
        assert route_for_lang("en") == "whitespace"
        assert route_for_lang(None) == "whitespace"

    def test_words_splitter_registry_cjk(self):
        from gliner_ray.kernels.tokenize import WordsSplitter

        triples = list(WordsSplitter("cjk")("深度 net"))
        assert [t for t, _, _ in triples] == ["深", "度", "net"]

    def test_lang_routed_stage_mixed_corpus(self, ray_session):
        """Mixed-lang e2e through the actor-pool routing stage: each
        row tokenized by its lang's splitter, offsets slice back."""
        import pyarrow as pa
        import ray.data as rd

        from gliner_ray.kernels.tokenize import LangRoutedTokenizer

        rows = [
            {"doc_id": 0, "text": "the quick brown fox", "lang": "en"},
            {"doc_id": 1, "text": "深度学习模型", "lang": "zh"},
            {"doc_id": 2, "text": "素早い狐", "lang": "ja"},
            {"doc_id": 3, "text": "schnelle braune Füchse", "lang": "de"},
        ]
        out = (
            rd.from_items(rows)
            .map_batches(
                LangRoutedTokenizer, batch_format="pyarrow", concurrency=(1, 2)
            )
            .to_pandas()
            .set_index("doc_id")
            .sort_index()
        )
        assert out.loc[0, "splitter"] == "whitespace"
        # zh routes through the lexicon maxmatch segmenter: 深度学习
        # and 模型 are lexicon words, so they stay whole
        assert out.loc[1, "splitter"] == "maxmatch_zh"
        assert list(out.loc[1, "tokens"]) == ["深度学习", "模型"]
        assert out.loc[2, "splitter"] == "cjk"
        assert out.loc[3, "splitter"] == "whitespace"
        assert list(out.loc[3, "tokens"]) == ["schnelle", "braune", "Füchse"]
        for _, row in out.iterrows():
            text = row["text"]
            for t, s, e in zip(row["tokens"], row["tok_start"], row["tok_end"]):
                assert text[s:e] == t

    def test_maxmatch_longest_wins_and_offsets(self):
        """Forward maximum matching: the longest lexicon entry at each
        position wins (自然语言 over 语言, 机器学习 over 学习), unknown
        chars fall back to single-char tokens, offsets slice back."""
        from gliner_ray.kernels.tokenize import tokenize_with_offsets_maxmatch

        text = "自然语言处理和机器学习"
        toks, starts, ends = tokenize_with_offsets_maxmatch(text)
        assert toks == ["自然语言", "处理", "和", "机器学习"]
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t

    def test_maxmatch_mixed_latin_and_symbols(self):
        from gliner_ray.kernels.tokenize import tokenize_with_offsets_maxmatch

        text = "用 python 做数据处理!"
        toks, _, _ = tokenize_with_offsets_maxmatch(text)
        assert toks == ["用", "python", "做", "数据处理", "!"]

    def test_maxmatch_matches_sequential_oracle(self):
        """Segmentation equals a brute-force sequential maxmatch over a
        random CJK/latin soup (the path-independence pin)."""
        import random

        from gliner_ray.kernels.tokenize import (
            ZH_LEXICON,
            tokenize_with_offsets_maxmatch,
        )

        rng = random.Random(7)
        vocab = sorted(ZH_LEXICON) + list("天地人上下左右") + ["abc", "x1"]
        text = "".join(
            rng.choice(vocab) + (" " if rng.random() < 0.3 else "")
            for _ in range(60)
        )
        toks, starts, ends = tokenize_with_offsets_maxmatch(text)
        # brute-force oracle: same greedy rule, written independently
        maxlen = max(map(len, ZH_LEXICON))
        want = []
        i = 0
        import re as _re

        from gliner_ray.kernels.tokenize import CJK_WORD_RE, _CJK_CHAR_RE

        while i < len(text):
            if text[i].isspace():
                i += 1
                continue
            if _CJK_CHAR_RE.match(text[i]):
                for ln in range(min(maxlen, len(text) - i), 0, -1):
                    if ln == 1 or text[i:i + ln] in ZH_LEXICON:
                        want.append(text[i:i + ln])
                        i += ln
                        break
            else:
                m = CJK_WORD_RE.match(text, i)
                want.append(m.group())
                i = m.end()
        assert toks == want
        for t, s, e in zip(toks, starts, ends):
            assert text[s:e] == t

    def test_words_splitter_registry_maxmatch(self):
        from gliner_ray.kernels.tokenize import WordsSplitter

        triples = list(WordsSplitter("maxmatch_zh")("知识图谱 graph"))
        assert [t for t, _, _ in triples] == ["知识图谱", "graph"]


class TestOverlapPredicates:
    # mirrors decoding/utils.py:1-21 incl. equal-boundary + multi_label

    def test_equal_boundaries(self):
        assert has_overlapping((1, 3), (1, 3))
        assert not has_overlapping((1, 3), (1, 3), multi_label=True)
        assert has_overlapping_nested((1, 3), (1, 3))
        assert not has_overlapping_nested((1, 3), (1, 3), multi_label=True)

    def test_disjoint(self):
        assert not has_overlapping((0, 1), (2, 3))
        assert not has_overlapping((4, 5), (2, 3))

    def test_partial_overlap(self):
        assert has_overlapping((0, 2), (2, 4))
        assert has_overlapping_nested((0, 2), (2, 4))

    def test_nested_allowed_in_nested_mode(self):
        assert is_nested((0, 5), (1, 3))
        assert has_overlapping((0, 5), (1, 3))
        assert not has_overlapping_nested((0, 5), (1, 3))


class TestGreedyNMS:
    # mirrors decoder.py:31-51 (stable sort + first-fit + start re-sort)

    def test_flat_suppression(self):
        spans = [(0, 2, "a", 0.9), (1, 3, "b", 0.8), (5, 6, "c", 0.7)]
        assert greedy_nms(spans) == [(0, 2, "a", 0.9), (5, 6, "c", 0.7)]

    def test_tie_stability(self):
        # equal scores: candidate-emission order wins (Python stable sort)
        spans = [(0, 2, "a", 0.8), (0, 2, "b", 0.8)]
        assert greedy_nms(spans) == [(0, 2, "a", 0.8)]
        assert greedy_nms(list(reversed(spans))) == [(0, 2, "b", 0.8)]

    def test_nested_mode_keeps_contained(self):
        spans = [(0, 5, "a", 0.9), (1, 3, "b", 0.8)]
        assert greedy_nms(spans, flat_ner=False) == spans

    def test_multi_label_same_boundary(self):
        spans = [(0, 2, "a", 0.9), (0, 2, "b", 0.8)]
        out = greedy_nms(spans, flat_ner=True, multi_label=True)
        assert out == spans

    def test_output_sorted_by_start(self):
        spans = [(5, 6, "c", 0.99), (0, 1, "a", 0.5)]
        assert [s[0] for s in greedy_nms(spans)] == [0, 5]


class TestDecode:
    def test_threshold_and_sentence_bound(self):
        # logits grid (L=3, K=2, C=1): span (2, k=1) ends at 3 > n_tokens → skipped
        logits = np.full((3, 2, 1), -10.0)
        logits[0, 0, 0] = 3.0   # span (0,0)
        logits[2, 1, 0] = 3.0   # span (2,3) — exceeds sentence
        out = decode_logits(3, {1: "x"}, logits)
        assert out == [(0, 0, "x", pytest.approx(1 / (1 + np.exp(-3.0))))]

    def test_dense_sparse_equivalence(self):
        sc = DeterministicScorerKernel()
        text = "foo parse_config ( ) Jane Doe <jane@example.com> uses numpy 1.2.3"
        toks, _, _ = tokenize_with_offsets(text)
        cands = sc.score_tokens(toks, "shaX", 0)
        sparse = decode_candidates(cands, len(toks))
        dense = decode_logits(len(toks), sc.id_to_class(), sc.dense_logits(toks, "shaX"))
        assert len(sparse) == len(dense)
        for a, b in zip(sparse, dense):
            assert a[:3] == b[:3]
            assert a[3] == pytest.approx(b[3], abs=1e-12)

    def test_chunk_invariant_scores(self):
        sc = DeterministicScorerKernel()
        toks, _, _ = tokenize_with_offsets("aa bb numpy cc")
        c1 = sc.score_tokens(toks, "sha", tok_offset=0)
        # same tokens seen from a chunk starting 10 tokens later
        c2 = sc.score_tokens(toks, "sha", tok_offset=0)
        assert c1 == c2


class TestChunking:
    def test_short_doc_single_chunk(self):
        assert chunk_token_ranges(10, 384, 16) == [(0, 10)]

    def test_coverage_and_overlap(self):
        ranges = chunk_token_ranges(1000, 384, 16)
        assert ranges[0] == (0, 384)
        for (s0, e0), (s1, e1) in zip(ranges, ranges[1:]):
            assert s1 == e0 - 16
        assert ranges[-1][1] == 1000

    def test_empty(self):
        assert chunk_token_ranges(0, 384, 16) == [(0, 0)]

    def test_overlap_validation(self):
        with pytest.raises(ValueError):
            chunk_token_ranges(10, 8, 8)


class TestEvalMetrics:
    # mirrors evaluator.py:52-121 micro P/R/F1

    def test_perfect(self):
        y = [("a", (0, 1), 0), ("b", (2, 3), 0)]
        m = compute_prf(y, list(y))
        assert m == {"precision": 1.0, "recall": 1.0, "f_score": 1.0}

    def test_partial(self):
        y_true = [("a", (0, 1), 0), ("a", (2, 3), 0)]
        y_pred = [("a", (0, 1), 0), ("a", (5, 6), 0)]
        m = compute_prf(y_true, y_pred)
        assert m["precision"] == 0.5 and m["recall"] == 0.5 and m["f_score"] == 0.5

    def test_zero_division(self):
        assert compute_prf([], [])["f_score"] == 0.0
        assert compute_prf([("a", (0, 1), 0)], [])["recall"] == 0.0

    def test_type_mismatch_not_tp(self):
        m = compute_prf([("a", (0, 1), 0)], [("b", (0, 1), 0)])
        assert m["precision"] == 0.0

    def test_triple_prf(self):
        g = [("s", "p", "o"), ("s2", "p", "o2")]
        p = [("s", "p", "o"), ("s3", "p", "o3")]
        m = triple_prf(g, p)
        assert m["precision"] == 0.5 and m["recall"] == 0.5


class TestNormalize:
    def test_primary(self):
        assert normalize_primary("  HttpClient, ") == "httpclient"
        assert normalize_primary("'left-pad'") == "left-pad"

    def test_ident_split(self):
        assert normalize_ident("HttpClient") == "http client"
        assert normalize_ident("http_client") == "http client"
        assert normalize_ident("HTTP-Client") == "http client"
        assert normalize_ident("getUserByID") == "get user by id"

    def test_variants_dedup(self):
        assert variants("numpy") == ["numpy"]
        assert variants("HttpClient") == ["httpclient", "http client"]


class TestUnionFind:
    def test_transitive_merge(self):
        # a~b via shared variant, b~c via another → one component, min id
        edges = [("a", "b"), ("b", "c"), ("z", "z")]
        m = link_variant_edges(edges)
        assert m["a"] == m["b"] == m["c"] == "ent:a"
        assert m["z"] == "ent:z"

    def test_deterministic_canonical(self):
        m1 = link_variant_edges([("x", "y"), ("q", "x")])
        m2 = link_variant_edges([("q", "x"), ("x", "y")])
        assert m1 == m2 == {"x": "ent:q", "y": "ent:q", "q": "ent:q"}
