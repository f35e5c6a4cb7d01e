"""Pure-numpy safetensors loader (round-3 verdict item #3): container
round-trip, reference state-dict name mapping per span mode, LSTM gate
folding, strict semantics, and end-to-end from_safetensors parity."""

import json

import numpy as np
import pytest

from gliner_ray.kernels.numpy_model import SPAN_MODES, NumpySpanModel
from gliner_ray.kernels.safetensors_io import (
    export_reference_state,
    load_reference_state,
    read_safetensors,
    write_safetensors,
)

LABELS = ["function", "class", "library"]


def _share_encoder(dst: NumpySpanModel, src: NumpySpanModel) -> None:
    """The encoder-lite (hash-embed + mix) has no reference-checkpoint
    twin (the real transformer stack is skipped), so forward-parity
    tests share it between models and let the LOADED modules (span rep
    / prompt MLP / rnn) carry the comparison."""
    dst.embed = src.embed.copy()
    dst.mix_w, dst.mix_b = src.mix_w.copy(), src.mix_b.copy()


class TestContainer:
    def test_roundtrip_all_dtypes(self, tmp_path):
        rng = np.random.RandomState(3)
        tensors = {
            "a": rng.standard_normal((4, 5)).astype(np.float32),
            "b": rng.standard_normal((2, 3, 4)).astype(np.float64),
            "c": rng.randint(-100, 100, size=(7,)).astype(np.int64),
            "d": rng.randint(0, 255, size=(2, 2)).astype(np.uint8),
            "e": (rng.standard_normal(6) > 0),
            "f": rng.standard_normal((3,)).astype(np.float16),
            "scalar": np.float32(2.5).reshape(()),
        }
        p = write_safetensors(
            str(tmp_path / "t.safetensors"), tensors, {"format": "pt"}
        )
        back, meta = read_safetensors(p)
        assert meta == {"format": "pt"}
        assert set(back) == set(tensors)
        for k in tensors:
            np.testing.assert_array_equal(back[k], tensors[k])
            assert back[k].dtype == tensors[k].dtype

    def test_reads_foreign_layout(self, tmp_path):
        """Hand-assembled file (not our writer): header key order and
        non-contiguous offsets must not matter."""
        a = np.arange(6, dtype="<f4").reshape(2, 3)
        b = np.arange(4, dtype="<i8")
        header = {
            "second": {"dtype": "I64", "shape": [4],
                       "data_offsets": [24, 24 + 32]},
            "first": {"dtype": "F32", "shape": [2, 3],
                      "data_offsets": [0, 24]},
        }
        hdr = json.dumps(header).encode()
        p = tmp_path / "foreign.safetensors"
        with open(p, "wb") as f:
            f.write(len(hdr).to_bytes(8, "little"))
            f.write(hdr)
            f.write(a.tobytes())
            f.write(b.tobytes())
        back, meta = read_safetensors(str(p))
        np.testing.assert_array_equal(back["first"], a)
        np.testing.assert_array_equal(back["second"], b)
        assert meta == {}

    def test_bf16_widens_to_float32(self, tmp_path):
        vals = np.array([1.0, -2.5, 0.15625, 3.0e5], dtype=np.float32)
        bf16_bits = (vals.view(np.uint32) >> 16).astype("<u2")  # truncate
        hdr = json.dumps(
            {"x": {"dtype": "BF16", "shape": [4], "data_offsets": [0, 8]}}
        ).encode()
        p = tmp_path / "bf16.safetensors"
        with open(p, "wb") as f:
            f.write(len(hdr).to_bytes(8, "little"))
            f.write(hdr)
            f.write(bf16_bits.tobytes())
        back, _ = read_safetensors(str(p))
        assert back["x"].dtype == np.float32
        # exact for values representable in bf16 (1.0, -2.5, 0.15625)
        np.testing.assert_array_equal(back["x"][:3], vals[:3])
        assert abs(back["x"][3] - vals[3]) / vals[3] < 0.01

    def test_malformed_raises(self, tmp_path):
        p = tmp_path / "bad.safetensors"
        p.write_bytes(b"\x00\x01")
        with pytest.raises(ValueError, match="too short"):
            read_safetensors(str(p))
        hdr = json.dumps(
            {"x": {"dtype": "F32", "shape": [4], "data_offsets": [0, 999]}}
        ).encode()
        p2 = tmp_path / "bad2.safetensors"
        with open(p2, "wb") as f:
            f.write(len(hdr).to_bytes(8, "little"))
            f.write(hdr)
            f.write(b"\x00" * 4)
        with pytest.raises(ValueError, match="out of range"):
            read_safetensors(str(p2))


class TestReferenceMapping:
    """export_reference_state writes REFERENCE key names/layouts, so
    load_reference_state(export(...)) must reproduce the source model
    exactly — this pins both directions of the name map against the
    documented reference state-dict layout (base.py:393-401,
    span_rep.py, layers.py:6-42)."""

    @pytest.mark.parametrize("mode", sorted(SPAN_MODES))
    def test_roundtrip_per_span_mode(self, mode):
        src = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                             span_mode=mode)
        state = export_reference_state(src)
        # every key uses reference naming conventions
        for k in state:
            assert k.startswith(("span_rep_layer.span_rep_layer.",
                                 "prompt_rep_layer.", "rnn.lstm.")), k
        dst = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=99,
                             span_mode=mode)  # different seed
        _share_encoder(dst, src)
        report = load_reference_state(dst, state, strict=True)
        assert not report["missing"]
        toks = [["alpha", "beta", "gamma", "delta"]]
        np.testing.assert_allclose(
            src.forward(toks)[0], dst.forward(toks)[0], rtol=1e-6
        )

    def test_expected_reference_keys_markerV0(self):
        """The default mode's key set matches the documented reference
        layout exactly: three create_projection_layer Sequentials
        (Linear@0 / Linear@3) under span_rep_layer.span_rep_layer, one
        under prompt_rep_layer."""
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        keys = set(export_reference_state(m))
        want = set()
        for mod in ("project_start", "project_end", "out_project"):
            for idx in ("0", "3"):
                for leaf in ("weight", "bias"):
                    want.add(f"span_rep_layer.span_rep_layer.{mod}.{idx}.{leaf}")
        for idx in ("0", "3"):
            for leaf in ("weight", "bias"):
                want.add(f"prompt_rep_layer.{idx}.{leaf}")
        assert keys == want

    def test_torch_linear_orientation(self):
        """Reference Linear weights are [out, in]; the loader must
        transpose. prompt_rep_layer.0.weight has shape (4h, h) in the
        checkpoint and (h, 4h) in the numpy module."""
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        state = export_reference_state(m)
        h = 32
        assert state["prompt_rep_layer.0.weight"].shape == (4 * h, h)
        assert m.prompt_rep_layer.w1.shape == (h, 4 * h)

    def test_lstm_fold_gate_order(self):
        """nn.LSTM keeps ih/hh separate with two bias vectors; the
        fused numpy cell must see ih.T stacked over hh.T and the bias
        SUM — verified by forward parity after a load into a
        different-seed model."""
        src = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                             has_rnn=True)
        state = export_reference_state(src)
        for suffix in ("", "_reverse"):
            assert state[f"rnn.lstm.weight_ih_l0{suffix}"].shape == (64, 32)
            assert state[f"rnn.lstm.weight_hh_l0{suffix}"].shape == (64, 16)
        # split the bias arbitrarily between ih and hh — load must SUM
        rng = np.random.RandomState(0)
        for suffix in ("", "_reverse"):
            b = state[f"rnn.lstm.bias_ih_l0{suffix}"]
            noise = rng.standard_normal(b.shape).astype(np.float32)
            state[f"rnn.lstm.bias_ih_l0{suffix}"] = b - noise
            state[f"rnn.lstm.bias_hh_l0{suffix}"] = noise
        dst = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=99,
                             has_rnn=True)
        _share_encoder(dst, src)
        load_reference_state(dst, state, strict=True)
        toks = [["one", "two", "three"]]
        np.testing.assert_allclose(
            src.forward(toks)[0], dst.forward(toks)[0], rtol=1e-5, atol=1e-6
        )

    def test_skipped_transformer_keys_reported(self):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        state = export_reference_state(m)
        state["token_rep_layer.bert_layer.model.encoder.layer.0.attention"
              ".self.query.weight"] = np.zeros((32, 32), np.float32)
        report = load_reference_state(m, state)
        assert any("token_rep_layer" in k for k in report["skipped"])

    def test_word_embedding_adopted_when_shape_matches(self):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                           vocab_size=100)
        state = export_reference_state(m)
        emb = np.random.RandomState(1).standard_normal((100, 32)).astype(
            np.float32
        )
        key = "token_rep_layer.bert_layer.model.embeddings.word_embeddings.weight"
        state[key] = emb
        report = load_reference_state(m, state)
        assert key in report["loaded"]
        np.testing.assert_array_equal(m.embed, emb)

    def test_strict_raises_on_missing_and_shape_mismatch(self):
        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7)
        state = export_reference_state(m)
        del state["prompt_rep_layer.0.weight"]
        with pytest.raises(ValueError, match="missing"):
            load_reference_state(
                NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=8),
                state, strict=True,
            )
        state2 = export_reference_state(m)
        state2["prompt_rep_layer.0.weight"] = np.zeros((8, 8), np.float32)
        with pytest.raises(ValueError, match="shape mismatch"):
            load_reference_state(
                NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=8),
                state2, strict=True,
            )


class TestFromSafetensors:
    def test_checkpoint_file_drives_model(self, tmp_path):
        """Full path a real public checkpoint would take: reference-
        named state → model.safetensors on disk → from_safetensors →
        identical logits to the source model."""
        src = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                             has_rnn=True)
        d = tmp_path / "ckpt"
        d.mkdir()
        write_safetensors(
            str(d / "model.safetensors"),
            export_reference_state(src),
            {"format": "pt"},
        )
        dst, report = NumpySpanModel.from_safetensors(
            str(d), LABELS, hidden_size=32, max_width=4, seed=99,
            has_rnn=True,
        )
        assert not report["missing"] and not report["skipped"]
        _share_encoder(dst, src)
        toks = [["import", "os", "sys"]]
        np.testing.assert_allclose(
            src.forward(toks)[0], dst.forward(toks)[0], rtol=1e-5, atol=1e-6
        )


class TestInferArchitecture:
    @pytest.mark.parametrize("mode,expect", [
        ("markerV0", "markerV0"), ("markerV1", "markerV1"),
        ("marker", "marker"), ("mlp", "mlp"), ("cat", "cat"),
        ("query", "query"), ("conv_conv", "conv_conv"),
        ("conv_share", "conv_share"), ("conv_max", None),
    ])
    def test_span_mode_signature(self, mode, expect):
        from gliner_ray.kernels.safetensors_io import infer_architecture

        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                           span_mode=mode)
        arch = infer_architecture(export_reference_state(m))
        assert arch["hidden_size"] == 32
        assert arch["has_rnn"] is False
        assert arch["span_mode"] == expect

    def test_rnn_detected(self):
        from gliner_ray.kernels.safetensors_io import infer_architecture

        m = NumpySpanModel(LABELS, hidden_size=32, max_width=4, seed=7,
                           has_rnn=True)
        assert infer_architecture(export_reference_state(m))["has_rnn"]


class TestScorerSafetensors:
    def test_scorer_loads_reference_checkpoint(self, tmp_path):
        """A reference-layout dir (model.safetensors only) drives
        NumpyGlinerScorer: architecture inferred from the weight
        signature, logits identical to the source model."""
        from dataclasses import replace

        from gliner_ray.config import DEFAULT_CONFIG
        from gliner_ray.stages.scorer import NumpyGlinerScorer

        cfg = replace(DEFAULT_CONFIG, max_width=4)
        src = NumpyGlinerScorer(cfg, hidden_size=32, seed=1234)
        d = tmp_path / "ref_ckpt"
        d.mkdir()
        write_safetensors(
            str(d / "model.safetensors"),
            export_reference_state(src.model),
            {"format": "pt"},
        )
        dst = NumpyGlinerScorer(cfg, model_dir=str(d))
        toks = [["import", "os", "sys"]]
        np.testing.assert_allclose(
            src.model.forward(toks, prompts_embedding=src.label_embeds)[0],
            dst.model.forward(toks, prompts_embedding=dst.label_embeds)[0],
            rtol=1e-5, atol=1e-6,
        )


class TestKgMentionsSafetensorsE2E:
    """Round-4 verdict item #3: a reference-layout safetensors
    checkpoint drives the full distributed extraction — and produces
    EXACTLY the mentions the npz checkpoint path of the same weights
    produces (the two `from_pretrained` layouts are interchangeable)."""

    def test_mentions_parity_npz_vs_safetensors(self, tmp_path, ray_session):
        from gliner_ray.config import DEFAULT_CONFIG
        from gliner_ray.corpus import write_corpus
        from gliner_ray.pipelines.kg import extract_mentions, read_files
        from gliner_ray.stages.scorer import NumpyGlinerScorer

        cfg = DEFAULT_CONFIG
        src = NumpySpanModel(
            list(cfg.labels), hidden_size=64, max_width=cfg.max_width,
            seed=1234, has_rnn=True,
        )
        npz_dir = tmp_path / "npz"
        src.save(str(npz_dir))
        st_dir = tmp_path / "st"
        st_dir.mkdir()
        write_safetensors(
            str(st_dir / "model.safetensors"),
            export_reference_state(src),
            {"format": "pt"},
        )

        corpus = tmp_path / "files"
        write_corpus(str(corpus), n_files=40, n_repos=8, seed=3)

        def run(model_dir):
            ds = extract_mentions(
                read_files(str(corpus), cfg), cfg,
                scorer_cls=NumpyGlinerScorer, fused=False,
                scorer_kwargs={"model_dir": str(model_dir)},
            ).select_columns(
                ["doc_sha256", "start", "end", "tok_start", "tok_end",
                 "text", "label", "score"]
            )
            df = ds.to_pandas()
            return df.sort_values(list(df.columns), ignore_index=True)

        a, b = run(npz_dir), run(st_dir)
        assert len(a) == len(b) and len(a) > 0
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)

    def test_driver_entry_runs(self, ray_session):
        """kg_mentions_safetensors synthesizes its checkpoint once and
        returns a streaming mentions Dataset with the standard schema."""
        from gliner_ray.queries import corpus_ops as co

        ds = co.kg_mentions_safetensors("/root/testdata/sf0.001")
        df = ds.to_pandas()
        assert len(df) > 0
        assert list(df.columns) == [
            "doc_sha256", "start", "end", "tok_start", "tok_end",
            "text", "label", "score",
        ]
