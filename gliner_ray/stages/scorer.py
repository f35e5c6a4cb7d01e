"""Stage [B] — span scoring (stateful actor-pool map_batches).

The distributed analog of ``GLiNER.run``'s forward pass
(``gliner/model.py:352-449`` → ``modeling/base.py:498-586``): a
callable class whose ``__init__`` loads the model once per actor
(reference ``from_pretrained``, ``model.py:768-919``) and whose
``__call__`` scores one Arrow batch of chunks, appending the sparse
span-candidate columns consumed by the decode stage.

Backends:

- :class:`DeterministicScorer` — the CI backend (FIXTURES.md §5
  contract, ``kernels/scoring.py``). CPU-only, pure Python state.
- :class:`TorchGlinerScorer` — the real-model backend; requires torch
  + a GLiNER checkpoint, neither of which exists in this container, so
  it raises ``NotImplementedError`` at construction. The Ray-side
  plumbing (actor signature, batch flow, output schema) is identical
  to the deterministic backend and is what the tests exercise.

Usage::

    ds.map_batches(DeterministicScorer, fn_constructor_kwargs={"cfg": cfg},
                   batch_format="pyarrow", batch_size=cfg.scorer_batch_size,
                   concurrency=N, num_cpus=1)   # GPU backend: num_gpus=1
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.scoring import DeterministicScorerKernel

CANDIDATE_FIELDS = [
    ("cand_s", pa.list_(pa.int32())),
    ("cand_k", pa.list_(pa.int32())),
    ("cand_label", pa.list_(pa.string())),
    ("cand_score", pa.list_(pa.float64())),
]


class DeterministicScorer:
    """Actor-pool scorer using the deterministic hash kernel."""

    def __init__(self, cfg: PipelineConfig):
        # Once per actor: build the vocabulary index (the analog of
        # loading model weights + tokenizer in __init__).
        self.kernel = DeterministicScorerKernel(cfg.vocab, cfg.labels)

    def __call__(self, batch: pa.Table) -> pa.Table:
        tokens_col = batch["tokens"].to_pylist()
        shas = batch["doc_sha256"].to_pylist()
        offsets = batch["tok_offset"].to_pylist()
        out_s, out_k, out_label, out_score = [], [], [], []
        for tokens, sha, off in zip(tokens_col, shas, offsets):
            cands = self.kernel.score_tokens(tokens, sha, tok_offset=off)
            out_s.append([c[0] for c in cands])
            out_k.append([c[1] for c in cands])
            out_label.append([c[2] for c in cands])
            out_score.append([c[3] for c in cands])
        arrays = [
            pa.array(out_s, pa.list_(pa.int32())),
            pa.array(out_k, pa.list_(pa.int32())),
            pa.array(out_label, pa.list_(pa.string())),
            pa.array(out_score, pa.list_(pa.float64())),
        ]
        for (name, _), arr in zip(CANDIDATE_FIELDS, arrays):
            batch = batch.append_column(name, arr)
        return batch


class NumpyGlinerScorer:
    """Real span-model math backend (``kernels/numpy_model.py``):
    subword tokenize + words_mask → encoder-lite → prompt/word
    embedding extraction → SpanMarkerV0 span reps → prompt projection
    → ``BLKD,BCD->BLKC`` einsum → dense sigmoid over the span grid —
    the reference forward (``modeling/base.py:498-551``) with small
    deterministic fixed weights instead of a trained checkpoint.

    Same sparse candidate output contract as
    :class:`DeterministicScorer` (row-major ``(s, k, c)`` emission of
    ``sigmoid(logit) > emit_threshold``), so the decode stage consumes
    it unchanged. ``__init__`` builds the weights AND pre-embeds the
    label prompts once per actor — the bi-encoder label-cache fast
    path (``gliner/model.py:604-630`` ``encode_labels``;
    ``batch_predict_with_embeds`` ``model.py:476-531``).
    """

    # ~40x more compute per chunk than DeterministicScorer: small
    # batches so the actor pool parallelizes instead of one task
    # swallowing the whole chunk table (see extract_mentions)
    preferred_batch_size = 8

    def __init__(
        self,
        cfg: PipelineConfig,
        hidden_size: int = 64,
        seed: int = 1234,
        model_dir: str | None = None,
        span_mode: str = "markerV0",
        encoder: str = "mix",
    ):
        import numpy as np

        from ..kernels.numpy_model import NumpySpanModel

        self._np = np
        if model_dir is not None:
            # checkpoint source: every actor loads the same weights
            # (the from_pretrained analog, model.py:768-919). A
            # REFERENCE-format dir (model.safetensors, the
            # save_pretrained layout) loads through the pure-numpy
            # safetensors parser with architecture params inferred
            # from the weight signature; the engine's own npz layout
            # keeps its config.json round-trip.
            import os as _os

            st_path = (
                model_dir
                if model_dir.endswith(".safetensors")
                else _os.path.join(model_dir, "model.safetensors")
            )
            if _os.path.exists(st_path) and not _os.path.exists(
                _os.path.join(model_dir, "model.npz")
            ):
                from ..kernels.safetensors_io import (
                    infer_architecture,
                    read_safetensors,
                )

                tensors, _meta = read_safetensors(st_path)
                arch = infer_architecture(tensors)
                self.model, _report = NumpySpanModel.from_safetensors(
                    st_path,
                    labels=list(cfg.labels),
                    hidden_size=arch.get("hidden_size", hidden_size),
                    max_width=cfg.max_width,
                    seed=seed,
                    span_mode=arch.get("span_mode") or span_mode,
                    encoder=encoder,
                    has_rnn=arch.get("has_rnn", False),
                )
            else:
                self.model = NumpySpanModel.load(model_dir)
        else:
            self.model = NumpySpanModel(
                labels=list(cfg.labels),
                hidden_size=hidden_size,
                max_width=cfg.max_width,
                seed=seed,
                span_mode=span_mode,
                encoder=encoder,
            )
        self.label_embeds = self.model.label_embeddings()  # (C, D), cached
        self.emit_threshold = cfg.threshold

    def __call__(self, batch: pa.Table) -> pa.Table:
        np = self._np
        token_lists = batch["tokens"].to_pylist()
        logits, text_lengths = self.model.forward(
            token_lists, prompts_embedding=self.label_embeds
        )
        # float64 sigmoid of the float32 logits — bit-identical to
        # decode_logits' dense path so sparse == dense holds exactly
        probs = 1.0 / (1.0 + np.exp(-logits.astype(np.float64)))  # (B, W, K, C)
        labels = self.model.labels
        out_s, out_k, out_label, out_score = [], [], [], []
        for i in range(len(token_lists)):
            n = int(text_lengths[i])
            # row-major (s, k, c) — torch.where order (decoder.py:100)
            s_idx, k_idx, c_idx = np.nonzero(probs[i] > self.emit_threshold)
            keep = s_idx + k_idx + 1 <= n
            out_s.append(s_idx[keep].astype("int32").tolist())
            out_k.append(k_idx[keep].astype("int32").tolist())
            out_label.append([labels[c] for c in c_idx[keep]])
            out_score.append(probs[i][s_idx[keep], k_idx[keep], c_idx[keep]].tolist())
        arrays = [
            pa.array(out_s, pa.list_(pa.int32())),
            pa.array(out_k, pa.list_(pa.int32())),
            pa.array(out_label, pa.list_(pa.string())),
            pa.array(out_score, pa.list_(pa.float64())),
        ]
        for (name, _), arr in zip(CANDIDATE_FIELDS, arrays):
            batch = batch.append_column(name, arr)
        return batch


class OnnxGlinerScorer:
    """ONNX-runtime backend stub: same batch contract as the torch
    path but CPU-friendly — the reference ships an ORT session wrapper
    (``gliner/onnx/model.py:10-119``, ``SpanORTModel.forward``). The
    actor would hold one ``ort.InferenceSession`` per replica
    (``__init__``), run the span head per batch, and emit the sparse
    above-threshold candidate set. onnxruntime is not in this
    container, so construction is import-gated."""

    def __init__(self, cfg: PipelineConfig, model_path: str = ""):
        try:
            import onnxruntime  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "OnnxGlinerScorer requires onnxruntime (not available "
                "here). Use DeterministicScorer (same batch contract)."
            ) from e
        raise NotImplementedError("ONNX backend not wired in this sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError


class TorchGlinerScorer:
    """Real-model backend stub: same interface, torch-gated.

    At construction it would ``GLiNER.from_pretrained(model_dir)``
    (reference ``model.py:768-919``), pre-embed the label prompts
    (``model.py:604-630``), and in ``__call__`` run prompt build →
    subword tokenize → forward (``base.py:498-586``) → emit the sparse
    ``sigmoid(logits) > threshold`` candidate set in row-major
    ``(s, k, c)`` order — the identical output contract as
    :class:`DeterministicScorer`.
    """

    def __init__(self, cfg: PipelineConfig, model_dir: str = ""):
        try:
            import torch  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "TorchGlinerScorer requires torch + a GLiNER checkpoint; "
                "neither is available in this environment. Use "
                "DeterministicScorer (same batch contract)."
            ) from e
        raise NotImplementedError("real-model backend not wired in this sandbox")

    def __call__(self, batch: pa.Table) -> pa.Table:  # pragma: no cover
        raise NotImplementedError
