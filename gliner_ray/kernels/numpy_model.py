"""Numpy span-model forward — the real GLiNER scoring math with small
deterministic fixed weights (no torch in this environment).

Faithful to the reference dataflow, layer by layer:

- encoder-lite: embedding table + sinusoid positions + one
  tanh-mixing layer with a ±1 neighborhood average — the structural
  stand-in for ``gliner/modeling/encoder.py:41-186`` (contextual
  subword embeddings in, contextual subword embeddings out).
- prompt/word embedding extraction: ``modeling/base.py:33-82``
  (``extract_prompt_features_and_word_embeddings``) — class-token
  gather at ``input_ids == class_token_index``, first-subtoken scatter
  via ``words_mask`` values (1-based target word index).
- span representation: SpanMarkerV0 (``modeling/span_rep.py:262-286``)
  — project_start/project_end MLPs, endpoint gather by ``span_idx``,
  concat → relu → out_project, reshape ``(B, L, K, D)``.
- prompt projection: ``prompt_rep_layer`` (``modeling/base.py:401``),
  the ``create_projection_layer`` MLP (``modeling/layers.py:30-42``:
  Linear(D→4D) → ReLU → Linear(4D→D); dropout inert at eval).
- scorer: ``scores = einsum("BLKD,BCD->BLKC", span_rep,
  prompts_embedding)`` (``modeling/base.py:547``).
- span grid: ``preprocess_example`` (``processor.py:345-367``) —
  ``span_idx = [(i, i+j) for i in range(L) for j in range(K)]``, mask
  invalid when the end exceeds the sentence.

Weights are drawn once from a seeded RNG scaled ``1/sqrt(fan_in)``, so
every actor holds the identical model and results are reproducible —
the checkpoint-loading analog of ``GLiNER.from_pretrained``
(``gliner/model.py:768-919``).

The logits feed :func:`gliner_ray.kernels.decode.decode_logits`
unchanged — that is the whole contract: tokenize → forward → dense
``(L, K, C)`` logits → sigmoid decode + NMS.
"""

from __future__ import annotations

import numpy as np

from .subword import ENT_TOKEN_ID, SUBWORD_TOKENIZERS, encode_batch


def _linear_init(rng: np.random.RandomState, fan_in: int, fan_out: int):
    # float32: inference-only weights; halves memory traffic and
    # doubles SIMD width vs float64 with no effect on decode decisions
    # (threshold crossings are O(1) logits, noise is ~1e-6)
    w = rng.standard_normal((fan_in, fan_out)) / np.sqrt(fan_in)
    b = rng.standard_normal(fan_out) * 0.01
    return w.astype(np.float32), b.astype(np.float32)


class _Projection:
    """``create_projection_layer`` (layers.py:30-42): D→4·out → ReLU →
    4·out→out. Dropout is eval-inert and omitted."""

    def __init__(self, rng: np.random.RandomState, d_in: int, d_out: int | None = None):
        d_out = d_in if d_out is None else d_out
        self.w1, self.b1 = _linear_init(rng, d_in, d_out * 4)
        self.w2, self.b2 = _linear_init(rng, d_out * 4, d_out)

    def __call__(self, x: np.ndarray) -> np.ndarray:
        # collapse leading dims: one big 2-D GEMM instead of numpy's
        # per-batch loop of tiny (K, D) matmuls on >2-D inputs
        shp = x.shape
        x2 = np.ascontiguousarray(x.reshape(-1, shp[-1]), dtype=np.float32)
        h = np.maximum(x2 @ self.w1 + self.b1, 0.0)
        out = h @ self.w2 + self.b2
        return out.reshape(shp[:-1] + (out.shape[-1],))


class _BiLstm:
    """``LstmSeq2SeqEncoder`` (``modeling/layers.py:6-27``) in numpy:
    bidirectional single-layer LSTM, hidden D//2 per direction,
    outputs concatenated back to D. The standard LSTM cell recurrence,
    deterministic seeded weights, masked to each row's length."""

    def __init__(self, rng: np.random.RandomState, d: int):
        h = d // 2
        self.h = h
        # one fused weight per direction: [x ; h_prev] → 4 gates
        self.w_f, self.b_f = _linear_init(rng, d + h, 4 * h)
        self.w_b, self.b_b = _linear_init(rng, d + h, 4 * h)

    @staticmethod
    def _sigmoid(x):
        return 1.0 / (1.0 + np.exp(-np.clip(x, -30, 30)))

    def _run(self, x: np.ndarray, lengths: np.ndarray, w, b, reverse: bool):
        B, T, _ = x.shape
        h = np.zeros((B, self.h), dtype=np.float32)
        c = np.zeros((B, self.h), dtype=np.float32)
        out = np.zeros((B, T, self.h), dtype=np.float32)
        steps = range(T - 1, -1, -1) if reverse else range(T)
        for t in steps:
            gates = np.concatenate([x[:, t], h], axis=1) @ w + b
            i, f, g, o = np.split(gates, 4, axis=1)
            i, f, o = self._sigmoid(i), self._sigmoid(f), self._sigmoid(o)
            g = np.tanh(g)
            # only update rows whose sequence covers step t
            alive = (t < lengths)[:, None]
            c = np.where(alive, f * c + i * g, c)
            h = np.where(alive, o * np.tanh(c), h)
            out[:, t] = np.where(alive, h, 0.0)
        return out

    def __call__(self, x: np.ndarray, lengths: np.ndarray) -> np.ndarray:
        fwd = self._run(x, lengths, self.w_f, self.b_f, reverse=False)
        bwd = self._run(x, lengths, self.w_b, self.b_b, reverse=True)
        return np.concatenate([fwd, bwd], axis=-1)


def _layernorm(x: np.ndarray, g: np.ndarray, b: np.ndarray) -> np.ndarray:
    mu = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    return (x - mu) / np.sqrt(var + 1e-5) * g + b


class _AttnEncoder:
    """Transformer-lite encoder (the structural analog of the
    reference's transformer backbone, ``modeling/encoder.py:41-186`` —
    real weights live in a pretrained checkpoint the sandbox cannot
    load, so the weights are seeded, but the MATH is the standard
    stack): ``n_layers`` × [masked multi-head self-attention →
    residual+LN → FFN(D→4D→relu→D) → residual+LN]. Key positions with
    ``attention_mask == 0`` are −1e9'd before the softmax, so padded
    batch-mates can never leak into a row's representation (the
    mask-invariance test pins this)."""

    def __init__(self, rng: np.random.RandomState, d: int,
                 n_heads: int = 4, n_layers: int = 2):
        assert d % n_heads == 0
        self.d, self.h, self.n_layers = d, n_heads, n_layers
        self.layers = []
        for _ in range(n_layers):
            lay = {}
            for nm in ("wq", "wk", "wv", "wo"):
                lay[nm], lay[nm.replace("w", "b")] = _linear_init(rng, d, d)
            lay["ffn"] = _Projection(rng, d)
            lay["g1"] = np.ones(d, np.float32)
            lay["b1_ln"] = np.zeros(d, np.float32)
            lay["g2"] = np.ones(d, np.float32)
            lay["b2_ln"] = np.zeros(d, np.float32)
            self.layers.append(lay)

    def weights(self) -> dict[str, np.ndarray]:
        out: dict[str, np.ndarray] = {}
        for i, lay in enumerate(self.layers):
            for nm in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                       "g1", "b1_ln", "g2", "b2_ln"):
                out[f"l{i}.{nm}"] = lay[nm]
            for wn in ("w1", "b1", "w2", "b2"):
                out[f"l{i}.ffn.{wn}"] = getattr(lay["ffn"], wn)
        return out

    def load_weights(self, arrays, prefix: str) -> None:
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        for i, lay in enumerate(self.layers):
            for nm in ("wq", "bq", "wk", "bk", "wv", "bv", "wo", "bo",
                       "g1", "b1_ln", "g2", "b2_ln"):
                lay[nm] = f32(arrays[f"{prefix}l{i}.{nm}"])
            for wn in ("w1", "b1", "w2", "b2"):
                setattr(lay["ffn"], wn, f32(arrays[f"{prefix}l{i}.ffn.{wn}"]))

    def __call__(
        self,
        e: np.ndarray,
        attention_mask: np.ndarray,
        return_hidden: bool = False,
    ):
        B, T, D = e.shape
        H, dh = self.h, D // self.h
        key_bias = np.where(attention_mask[:, None, None, :] > 0, 0.0, -1e9)
        hidden = [e]  # output_hidden_states analog: [embeddings, layer1, ...]
        for lay in self.layers:
            q = (e @ lay["wq"] + lay["bq"]).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
            k = (e @ lay["wk"] + lay["bk"]).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
            v = (e @ lay["wv"] + lay["bv"]).reshape(B, T, H, dh).transpose(0, 2, 1, 3)
            scores = q @ k.transpose(0, 1, 3, 2) / np.sqrt(dh) + key_bias
            scores -= scores.max(axis=-1, keepdims=True)
            attn = np.exp(scores)
            attn /= attn.sum(axis=-1, keepdims=True)
            ctx = (attn @ v).transpose(0, 2, 1, 3).reshape(B, T, D)
            e = _layernorm(e + ctx @ lay["wo"] + lay["bo"], lay["g1"], lay["b1_ln"])
            e = _layernorm(e + lay["ffn"](e), lay["g2"], lay["b2_ln"])
            hidden.append(e)
        out = (e * attention_mask[:, :, None]).astype(np.float32)
        if return_hidden:
            return out, hidden
        return out


class _LayersFuser:
    """``LayersFuser`` (``layers.py:178-218``): squeeze-excitation over
    the encoder's per-layer hidden states — skip the embedding layer
    (``encoder_outputs[1:]``), squeeze Linear(D→1) + mean over tokens,
    excite K→K/2→K with relu+sigmoid, gate-and-sum the layers, final
    Linear(D→D)."""

    def __init__(self, rng: np.random.RandomState, num_layers: int, d: int):
        self.k = num_layers
        kh = max(num_layers // 2, 1)
        self.sq_w, self.sq_b = _linear_init(rng, d, 1)
        self.w1, self.b1 = _linear_init(rng, num_layers, kh)
        self.w2, self.b2 = _linear_init(rng, kh, num_layers)
        self.out_w, self.out_b = _linear_init(rng, d, d)

    def __call__(self, outputs: list[np.ndarray]) -> np.ndarray:
        U = np.stack(outputs[1:], axis=1)  # (B, K, L, D)
        Z = (U @ self.sq_w + self.sq_b)[..., 0].mean(axis=2)  # (B, K)
        s = 1.0 / (
            1.0 + np.exp(-(np.maximum(Z @ self.w1 + self.b1, 0.0) @ self.w2 + self.b2))
        )
        return (U * s[:, :, None, None]).sum(axis=1) @ self.out_w + self.out_b

    def weights(self):
        return {
            "sq_w": self.sq_w, "sq_b": self.sq_b,
            "w1": self.w1, "b1": self.b1, "w2": self.w2, "b2": self.b2,
            "out_w": self.out_w, "out_b": self.out_b,
        }

    def load_weights(self, arrays, prefix: str):
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        for nm in self.weights():
            setattr(self, nm, f32(arrays[f"{prefix}{nm}"]))


class _LabelsTower:
    """``BiEncoder`` labels encoder (``encoder.py:157-186``): a SECOND
    encoder tower (own embedding table + context mix) that encodes each
    label text independently and MEAN-POOLS its subtokens over the
    attention mask (``encode_labels`` + ``mean_pooling``,
    ``encoder.py:170-180``) → one (C, D) matrix, input-independent, so
    it is the natural label-embedding cache."""

    def __init__(self, rng: np.random.RandomState, d: int, vocab_size: int):
        self.embed = (rng.standard_normal((vocab_size, d)) / np.sqrt(d)).astype(
            np.float32
        )
        self.mix_w, self.mix_b = _linear_init(rng, d, d)

    def encode(
        self, input_ids: np.ndarray, attention_mask: np.ndarray,
        positions: np.ndarray,
    ) -> np.ndarray:
        e = self.embed[input_ids] + positions[None, : input_ids.shape[1], :]
        e = e * attention_mask[:, :, None].astype(np.float32)
        ctx = e.copy()
        ctx[:, 1:] += e[:, :-1]
        ctx[:, :-1] += e[:, 1:]
        ctx /= 3.0
        out = np.tanh(ctx @ self.mix_w + self.mix_b)
        m = attention_mask[:, :, None].astype(np.float32)
        return ((out * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)).astype(
            np.float32
        )

    def weights(self):
        return {"embed": self.embed, "mix_w": self.mix_w, "mix_b": self.mix_b}

    def load_weights(self, arrays, prefix: str):
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        for nm in self.weights():
            setattr(self, nm, f32(arrays[f"{prefix}{nm}"]))


class _CrossFuser:
    """``CrossFuser`` + Self/CrossAttentionBlock
    (``layers.py:89-177``): schema tokens ``l2l``/``t2t`` run masked
    self-attention on the labels/text stream, ``l2t``/``t2l`` run
    cross-attention (labels attend to text / text to labels). Each
    block mirrors the reference structure: pre-LN, block-level q/k/v
    projections, an inner MHA with its OWN q/k/v linears (the double
    projection is in the reference too), residual on the normed
    query, post-LN. Dropout is eval-inert and omitted."""

    def __init__(
        self, rng: np.random.RandomState, d: int,
        schema: str = "l2l-l2t", n_heads: int = 4, n_layers: int = 1,
    ):
        if d % n_heads != 0:
            raise ValueError("hidden_size must divide n_heads")
        self.schema = schema.split("-")
        for tok in self.schema:
            if tok not in ("l2l", "t2t", "l2t", "t2l"):
                raise ValueError(f"unknown post_fusion schema token {tok!r}")
        self.d, self.h = d, n_heads
        self.n_layers = n_layers
        self.layers: list[list[dict]] = []
        for _ in range(n_layers):
            subs = []
            for tok in self.schema:
                blk: dict = {"tok": tok}
                if tok in ("l2l", "t2t"):
                    for nm in ("pq", "pk", "pv"):
                        blk[f"{nm}_w"], blk[f"{nm}_b"] = _linear_init(rng, d, d)
                else:
                    blk["pv_w"], blk["pv_b"] = _linear_init(rng, d, d)
                for nm in ("aq", "ak", "av"):
                    blk[f"{nm}_w"], blk[f"{nm}_b"] = _linear_init(rng, d, d)
                blk["pre_g"] = np.ones(d, np.float32)
                blk["pre_b"] = np.zeros(d, np.float32)
                blk["post_g"] = np.ones(d, np.float32)
                blk["post_b"] = np.zeros(d, np.float32)
                subs.append(blk)
            self.layers.append(subs)

    def _mha(self, blk, q, k, v, mask):
        B, Tq, D = q.shape
        H, dh = self.h, D // self.h
        qh = (q @ blk["aq_w"] + blk["aq_b"]).reshape(B, Tq, H, dh).transpose(0, 2, 1, 3)
        kh = (k @ blk["ak_w"] + blk["ak_b"]).reshape(B, -1, H, dh).transpose(0, 2, 1, 3)
        vh = (v @ blk["av_w"] + blk["av_b"]).reshape(B, -1, H, dh).transpose(0, 2, 1, 3)
        s = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh)
        if mask is not None:
            s = s + np.where(mask[:, None] > 0, 0.0, -1e9)
        s -= s.max(axis=-1, keepdims=True)
        a = np.exp(s)
        a /= np.maximum(a.sum(axis=-1, keepdims=True), 1e-12)
        return (a @ vh).transpose(0, 2, 1, 3).reshape(B, Tq, D)

    def _self_block(self, blk, x, mask):
        xn = _layernorm(x, blk["pre_g"], blk["pre_b"])
        q = xn @ blk["pq_w"] + blk["pq_b"]
        k = xn @ blk["pk_w"] + blk["pk_b"]
        v = xn @ blk["pv_w"] + blk["pv_b"]
        out = xn + self._mha(blk, q, k, v, mask)
        return _layernorm(out, blk["post_g"], blk["post_b"])

    def _cross_block(self, blk, q_seq, k_seq, mask):
        qn = _layernorm(q_seq, blk["pre_g"], blk["pre_b"])
        v = k_seq @ blk["pv_w"] + blk["pv_b"]
        out = qn + self._mha(blk, qn, k_seq, v, mask)
        return _layernorm(out, blk["post_g"], blk["post_b"])

    def __call__(self, query, key, query_mask=None, key_mask=None):
        """(labels, text) streams — returns (labels, text), like the
        reference's ``forward(query=labels, key=text)``."""
        for subs in self.layers:
            for blk in subs:
                tok = blk["tok"]
                if tok == "l2l":
                    m = (
                        query_mask[:, :, None] * query_mask[:, None, :]
                        if query_mask is not None else None
                    )
                    query = self._self_block(blk, query, m)
                elif tok == "t2t":
                    m = (
                        key_mask[:, :, None] * key_mask[:, None, :]
                        if key_mask is not None else None
                    )
                    key = self._self_block(blk, key, m)
                elif tok == "l2t":
                    m = (
                        query_mask[:, :, None] * key_mask[:, None, :]
                        if query_mask is not None and key_mask is not None
                        else None
                    )
                    query = self._cross_block(blk, query, key, m)
                else:  # t2l
                    m = (
                        key_mask[:, :, None] * query_mask[:, None, :]
                        if query_mask is not None and key_mask is not None
                        else None
                    )
                    key = self._cross_block(blk, key, query, m)
        return query, key

    def weights(self):
        out = {}
        for i, subs in enumerate(self.layers):
            for j, blk in enumerate(subs):
                for nm, arr in blk.items():
                    if nm != "tok":
                        out[f"l{i}.b{j}.{nm}"] = arr
        return out

    def load_weights(self, arrays, prefix: str):
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        for i, subs in enumerate(self.layers):
            for j, blk in enumerate(subs):
                for nm in list(blk):
                    if nm != "tok":
                        blk[nm] = f32(arrays[f"{prefix}l{i}.b{j}.{nm}"])


# -------------------------------- span-representation plugin registry
#
# ``SpanRepLayer`` (``modeling/span_rep.py:381-417``): the reference
# dispatches on ``config.span_mode``. Each numpy twin exposes
# ``__call__(words_embedding, span_idx, span_mask) -> (B, W, K, D)``
# and ``weights()`` for the checkpoint. Marker modes gather endpoints
# per span (and skip invalid spans — masked to -30 downstream); grid
# modes (query/mlp/cat) derive every (position, width) cell from the
# start token alone, exactly like the reference.


class _SpanMarkerV0:
    """``SpanMarkerV0`` (``span_rep.py:262-286``): project_start/end →
    endpoint gather → concat → relu → out_project."""

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.project_start = _Projection(rng, d)
        self.project_end = _Projection(rng, d)
        self.out_project = _Projection(rng, d * 2, d)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        K = span_idx.shape[1] // W
        start_rep = self.project_start(we)
        end_rep = self.project_end(we)
        vb, vs = np.nonzero(span_mask)
        cat = np.maximum(
            np.concatenate(
                [start_rep[vb, span_idx[vb, vs, 0]],
                 end_rep[vb, span_idx[vb, vs, 1]]],
                axis=-1,
            ),
            0.0,
        )
        out = np.zeros((B, W * K, D), dtype=start_rep.dtype)
        out[vb, vs] = self.out_project(cat)
        return out.reshape(B, W, K, D)

    def weights(self):
        out = {}
        for name in ("project_start", "project_end", "out_project"):
            p = getattr(self, name)
            for wn in ("w1", "b1", "w2", "b2"):
                out[f"{name}.{wn}"] = getattr(p, wn)
        return out


class _SpanMarkerV1:
    """``SpanMarkerV1`` (``span_rep.py:288-350``): endpoints plus a
    sequence-mean feature → concat → relu → 3D→D out_project. Mirrors
    the reference dataflow exactly, including that the mean is over
    the PADDED axis and that ``project_first`` is instantiated but
    unused in forward (``span_rep.py:303`` vs ``:318``)."""

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.project_start = _Projection(rng, d)
        self.project_end = _Projection(rng, d)
        self.project_first = _Projection(rng, d)  # dead layer, as in ref
        self.out_project = _Projection(rng, d * 3, d)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        K = span_idx.shape[1] // W
        start_rep = self.project_start(we)
        end_rep = self.project_end(we)
        mean_rep = we.mean(axis=1)  # (B, D), torch.mean(h, dim=1)
        vb, vs = np.nonzero(span_mask)
        cat = np.maximum(
            np.concatenate(
                [start_rep[vb, span_idx[vb, vs, 0]],
                 end_rep[vb, span_idx[vb, vs, 1]],
                 mean_rep[vb]],
                axis=-1,
            ),
            0.0,
        )
        out = np.zeros((B, W * K, D), dtype=start_rep.dtype)
        out[vb, vs] = self.out_project(cat)
        return out.reshape(B, W, K, D)

    def weights(self):
        out = {}
        for name in ("project_start", "project_end", "project_first", "out_project"):
            p = getattr(self, name)
            for wn in ("w1", "b1", "w2", "b2"):
                out[f"{name}.{wn}"] = getattr(p, wn)
        return out


class _SpanMLP:
    """``SpanMLP`` (``span_rep.py:33-50``): Linear(D → D·K), reshape
    (B, L, K, D), relu."""

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.k = max_width
        self.w, self.b = _linear_init(rng, d, d * max_width)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        rep = we.reshape(-1, D) @ self.w + self.b
        return np.maximum(rep.reshape(B, W, self.k, D), 0.0)

    def weights(self):
        return {"mlp.w": self.w, "mlp.b": self.b}


class _SpanCAT:
    """``SpanCAT`` (``span_rep.py:53-81``): token rep ‖ a learned
    128-d per-width query column → Linear(D+128 → D) → relu."""

    QDIM = 128

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.k = max_width
        self.query_seg = rng.standard_normal((self.QDIM, max_width)).astype(
            np.float32
        )
        self.w, self.b = _linear_init(rng, d + self.QDIM, d)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        K = self.k
        h = np.broadcast_to(we[:, :, None, :], (B, W, K, D))
        q = np.broadcast_to(
            self.query_seg.T[None, None, :, :], (B, W, K, self.QDIM)
        )
        cat = np.concatenate([h, q], axis=-1).reshape(-1, D + self.QDIM)
        return np.maximum((cat @ self.w + self.b).reshape(B, W, K, D), 0.0)

    def weights(self):
        return {"cat.query_seg": self.query_seg, "cat.w": self.w, "cat.b": self.b}


class _SpanQuery:
    """``SpanQuery`` (``span_rep.py:7-30``): uniform(-1,1) query
    matrix (D, K), ``bld,ds->blsd`` einsum → Linear(D → D) → relu."""

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.k = max_width
        self.query_seg = rng.uniform(-1.0, 1.0, size=(d, max_width)).astype(
            np.float32
        )
        self.w, self.b = _linear_init(rng, d, d)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        rep = np.einsum("bld,ds->blsd", we, self.query_seg)
        rep = rep.reshape(-1, D) @ self.w + self.b
        return np.maximum(rep.reshape(B, W, self.k, D), 0.0)

    def weights(self):
        return {"query.query_seg": self.query_seg, "query.w": self.w, "query.b": self.b}


class _SpanMarker:
    """Plain ``SpanMarker`` (``span_rep.py:218-259``): per-endpoint
    2-layer MLP with a 2·D hidden (Linear(D→2D) → ReLU → Dropout →
    Linear(2D→D)) — narrower than the 4× ``create_projection_layer``
    of markerV0 — endpoint gather → concat → relu → a SINGLE Linear
    2D→D out_project. Dropout is eval-inert and omitted."""

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.s_w1, self.s_b1 = _linear_init(rng, d, d * 2)
        self.s_w2, self.s_b2 = _linear_init(rng, d * 2, d)
        self.e_w1, self.e_b1 = _linear_init(rng, d, d * 2)
        self.e_w2, self.e_b2 = _linear_init(rng, d * 2, d)
        self.o_w, self.o_b = _linear_init(rng, d * 2, d)

    def _mlp(self, x, w1, b1, w2, b2):
        shp = x.shape
        x2 = np.ascontiguousarray(x.reshape(-1, shp[-1]), dtype=np.float32)
        return (np.maximum(x2 @ w1 + b1, 0.0) @ w2 + b2).reshape(
            shp[:-1] + (w2.shape[-1],)
        )

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        K = span_idx.shape[1] // W
        start_rep = self._mlp(we, self.s_w1, self.s_b1, self.s_w2, self.s_b2)
        end_rep = self._mlp(we, self.e_w1, self.e_b1, self.e_w2, self.e_b2)
        vb, vs = np.nonzero(span_mask)
        cat = np.maximum(
            np.concatenate(
                [start_rep[vb, span_idx[vb, vs, 0]],
                 end_rep[vb, span_idx[vb, vs, 1]]],
                axis=-1,
            ),
            0.0,
        )
        out = np.zeros((B, W * K, D), dtype=start_rep.dtype)
        out[vb, vs] = cat @ self.o_w + self.o_b
        return out.reshape(B, W, K, D)

    def weights(self):
        return {
            "marker.s_w1": self.s_w1, "marker.s_b1": self.s_b1,
            "marker.s_w2": self.s_w2, "marker.s_b2": self.s_b2,
            "marker.e_w1": self.e_w1, "marker.e_b1": self.e_b1,
            "marker.e_w2": self.e_w2, "marker.e_b2": self.e_b2,
            "marker.o_w": self.o_w, "marker.o_b": self.o_b,
        }


def _sliding_windows(x: np.ndarray, k: int) -> np.ndarray:
    """(B, L, D) right-zero-padded by k−1 → (B, L, k, D) windows:
    window l covers positions l..l+k−1, mirroring the reference's
    ``F.pad(x, (0, k-1))`` + stride-1 conv/pool (``span_rep.py:84-113``)."""
    B, L, D = x.shape
    xp = np.concatenate(
        [x, np.zeros((B, k - 1, D), dtype=x.dtype)], axis=1
    ) if k > 1 else x
    win = np.lib.stride_tricks.sliding_window_view(xp, k, axis=1)
    # sliding_window_view puts the window axis LAST → (B, L, D, k)
    return np.ascontiguousarray(np.moveaxis(win, -1, 2))


class _SpanConv:
    """``SpanConv`` + ``SpanConvBlock`` (``span_rep.py:84-145``): one
    block per kernel size 2..K over the right-zero-padded sequence —
    ``conv_conv`` a real Conv1d (kaiming-style random weights),
    ``conv_max``/``conv_mean`` max/avg pooling, ``conv_sum`` avg·k —
    stacked with the raw tokens as width 1, then ReLU → Linear(D→D)
    (NOTE the reference projects relu-FIRST here, unlike the marker
    family)."""

    def __init__(
        self, rng: np.random.RandomState, d: int, max_width: int,
        span_mode: str = "conv_conv",
    ):
        self.k = max_width
        self.mode = span_mode
        if span_mode == "conv_conv":
            # torch Conv1d weight (out, in, kw), kaiming_uniform relu
            self.convs = []
            for kw in range(2, max_width + 1):
                bound = np.sqrt(6.0 / (d * kw)) * np.sqrt(2.0)
                w = rng.uniform(-bound, bound, size=(d, d, kw)).astype(np.float32)
                fan_in = d * kw
                bb = 1.0 / np.sqrt(fan_in)
                b = rng.uniform(-bb, bb, size=d).astype(np.float32)
                self.convs.append((w, b))
        self.p_w, self.p_b = _linear_init(rng, d, d)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        reps = [we]
        for i, kw in enumerate(range(2, self.k + 1)):
            win = _sliding_windows(we, kw)  # (B, W, kw, D)
            if self.mode == "conv_conv":
                w, b = self.convs[i]
                # out[b,l,o] = Σ_{d,j} w[o,d,j]·win[b,l,j,d] + b[o]
                reps.append(np.einsum("bljd,odj->blo", win, w) + b)
            elif self.mode == "conv_max":
                reps.append(win.max(axis=2))
            elif self.mode == "conv_mean":
                reps.append(win.mean(axis=2))
            else:  # conv_sum = AvgPool1d · kernel_size
                reps.append(win.mean(axis=2) * kw)
        rep = np.stack(reps, axis=2).astype(np.float32)  # (B, W, K, D)
        rep = np.maximum(rep, 0.0)  # Sequential(ReLU, Linear)
        return (rep.reshape(-1, D) @ self.p_w + self.p_b).reshape(B, W, self.k, D)

    def weights(self):
        out = {"proj.w": self.p_w, "proj.b": self.p_b}
        if self.mode == "conv_conv":
            for i, (w, b) in enumerate(self.convs):
                out[f"conv{i}.w"] = w
                out[f"conv{i}.b"] = b
        return out

    def load_weights(self, arrays, prefix: str):
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        self.p_w = f32(arrays[f"{prefix}proj.w"])
        self.p_b = f32(arrays[f"{prefix}proj.b"])
        if self.mode == "conv_conv":
            self.convs = [
                (f32(arrays[f"{prefix}conv{i}.w"]), f32(arrays[f"{prefix}conv{i}.b"]))
                for i in range(self.k - 1)
            ]


class _ConvShare:
    """``ConvShare`` (``span_rep.py:170-201``): ONE shared weight
    tensor (D, D, K); width w uses its first w kernel columns as a
    bias-free conv over the right-zero-padded sequence, stacked over
    widths then ReLU → Linear(D→D)."""

    def __init__(self, rng: np.random.RandomState, d: int, max_width: int):
        self.k = max_width
        bound = np.sqrt(6.0 / (d * max_width)) * np.sqrt(2.0)
        self.conv_weight = rng.uniform(
            -bound, bound, size=(d, d, max_width)
        ).astype(np.float32)
        self.p_w, self.p_b = _linear_init(rng, d, d)

    def __call__(self, we, span_idx, span_mask):
        B, W, D = we.shape
        reps = []
        for width in range(1, self.k + 1):
            win = _sliding_windows(we, width)  # (B, W, width, D)
            w = self.conv_weight[:, :, :width]
            reps.append(np.einsum("bljd,odj->blo", win, w))
        rep = np.stack(reps, axis=2).astype(np.float32)
        rep = np.maximum(rep, 0.0)
        return (rep.reshape(-1, D) @ self.p_w + self.p_b).reshape(B, W, self.k, D)

    def weights(self):
        return {
            "conv_share.weight": self.conv_weight,
            "proj.w": self.p_w,
            "proj.b": self.p_b,
        }

    def load_weights(self, arrays, prefix: str):
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        self.conv_weight = f32(arrays[f"{prefix}conv_share.weight"])
        self.p_w = f32(arrays[f"{prefix}proj.w"])
        self.p_b = f32(arrays[f"{prefix}proj.b"])


def _conv_mode(mode: str):
    def make(rng, d, max_width):
        return _SpanConv(rng, d, max_width, span_mode=mode)

    return make


SPAN_MODES = {
    "marker": _SpanMarker,
    "markerV0": _SpanMarkerV0,
    "markerV1": _SpanMarkerV1,
    "mlp": _SpanMLP,
    "cat": _SpanCAT,
    "query": _SpanQuery,
    "conv_conv": _conv_mode("conv_conv"),
    "conv_max": _conv_mode("conv_max"),
    "conv_mean": _conv_mode("conv_mean"),
    "conv_sum": _conv_mode("conv_sum"),
    "conv_share": _ConvShare,
}


class NumpySpanModel:
    """SpanModel forward (``modeling/base.py:498-551``) in numpy."""

    def __init__(
        self,
        labels: list[str],
        hidden_size: int = 64,
        max_width: int = 12,
        vocab_size: int = 50_000,
        seed: int = 1234,
        has_rnn: bool = False,
        span_mode: str = "markerV0",
        encoder: str = "mix",
        labels_encoder: bool = False,
        post_fusion_schema: str = "",
        fuse_layers: bool = False,
        subword: str = "bpe",
    ):
        rng = np.random.RandomState(seed)
        D = hidden_size
        self.labels = list(labels)
        self.hidden_size = D
        self.max_width = max_width
        self.vocab_size = vocab_size
        self.seed = seed
        self.has_rnn = has_rnn
        self.span_mode = span_mode
        if encoder not in ("mix", "attn"):
            raise ValueError(f"unknown encoder {encoder!r}; 'mix' or 'attn'")
        self.encoder = encoder
        if subword not in SUBWORD_TOKENIZERS:
            raise ValueError(
                f"unknown subword {subword!r}; one of {sorted(SUBWORD_TOKENIZERS)}"
            )
        self.subword = subword
        # "bpe": learned merge rules (processor.py:157-212 fidelity);
        # "chunk": the fixed-stride round-1 stand-in, kept for
        # back-compat with configs that pinned it
        self.tokenizer = SUBWORD_TOKENIZERS[subword](vocab_size=vocab_size)
        # encoder-lite weights
        self.embed = (rng.standard_normal((vocab_size, D)) / np.sqrt(D)).astype(
            np.float32
        )
        self.mix_w, self.mix_b = _linear_init(rng, D, D)
        # span-rep plugin (same rng position as the pre-registry layout
        # so markerV0 results are unchanged)
        if span_mode not in SPAN_MODES:
            raise ValueError(
                f"unknown span_mode {span_mode!r}; one of {sorted(SPAN_MODES)}"
            )
        self.span_rep_layer = SPAN_MODES[span_mode](rng, D, max_width)
        self.prompt_rep_layer = _Projection(rng, D)
        # optional word-level BiLSTM (config.has_rnn, base.py:106-107)
        self.rnn = _BiLstm(rng, D) if has_rnn else None
        # transformer-lite encoder (opt-in; DECOUPLED rng stream so the
        # default "mix" weights — and every pinned result — are unchanged)
        self.attn = (
            _AttnEncoder(np.random.RandomState((seed ^ 0x5EED) & 0x7FFFFFFF), D)
            if encoder == "attn" else None
        )
        # --- BiEncoder / fuser options (all decoupled rng streams so
        # every existing pinned result is bit-identical) -------------
        self.labels_encoder = bool(labels_encoder)
        self.post_fusion_schema = post_fusion_schema or ""
        self.fuse_layers = bool(fuse_layers)
        if post_fusion_schema and not labels_encoder:
            raise ValueError(
                "post_fusion_schema requires labels_encoder=True (the "
                "cross-fuser runs in the bi-encoder representation path, "
                "base.py:176-178)"
            )
        if fuse_layers and encoder != "attn":
            raise ValueError(
                "fuse_layers needs per-layer hidden states — only the "
                "'attn' encoder exposes them (encoder.py:102-124)"
            )
        self.labels_tower = (
            _LabelsTower(
                np.random.RandomState((seed ^ 0x0B1E11C0) & 0x7FFFFFFF),
                D, vocab_size,
            )
            if labels_encoder else None
        )
        self.cross_fuser = (
            _CrossFuser(
                np.random.RandomState((seed ^ 0x0F05E12A) & 0x7FFFFFFF),
                D, schema=post_fusion_schema,
            )
            if post_fusion_schema else None
        )
        self.layers_fuser = (
            _LayersFuser(
                np.random.RandomState((seed ^ 0x1A7E55ED) & 0x7FFFFFFF),
                self.attn.n_layers, D,
            )
            if fuse_layers else None
        )
        # sinusoid positions, precomputed lazily per max length seen
        self._pos_cache: np.ndarray | None = None

    # ----------------------------------------- checkpoint sink / source
    def _weight_arrays(self) -> dict[str, np.ndarray]:
        out = {"embed": self.embed, "mix_w": self.mix_w, "mix_b": self.mix_b}
        if self.attn is not None:
            for wn, arr in self.attn.weights().items():
                out[f"attn.{wn}"] = arr
        for wn, arr in self.span_rep_layer.weights().items():
            out[f"span_rep.{wn}"] = arr
        for wn in ("w1", "b1", "w2", "b2"):
            out[f"prompt_rep_layer.{wn}"] = getattr(self.prompt_rep_layer, wn)
        if self.rnn is not None:
            for wn in ("w_f", "b_f", "w_b", "b_b"):
                out[f"rnn.{wn}"] = getattr(self.rnn, wn)
        for nm, obj in (
            ("labels_tower", self.labels_tower),
            ("cross_fuser", self.cross_fuser),
            ("layers_fuser", self.layers_fuser),
        ):
            if obj is not None:
                for wn, arr in obj.weights().items():
                    out[f"{nm}.{wn}"] = arr
        return out

    def save(self, model_dir: str) -> str:
        """Checkpoint sink (``GLiNER.save_pretrained`` analog,
        ``gliner/model.py:921-963``): weights as one ``.npz`` +
        ``config.json`` with the architecture params."""
        import json
        import os

        os.makedirs(model_dir, exist_ok=True)
        np.savez(os.path.join(model_dir, "model.npz"), **self._weight_arrays())
        with open(os.path.join(model_dir, "config.json"), "w") as f:
            json.dump(
                {
                    "labels": self.labels,
                    "hidden_size": self.hidden_size,
                    "max_width": self.max_width,
                    "vocab_size": self.vocab_size,
                    "seed": self.seed,
                    "has_rnn": self.has_rnn,
                    "span_mode": self.span_mode,
                    "encoder": self.encoder,
                    "labels_encoder": self.labels_encoder,
                    "post_fusion_schema": self.post_fusion_schema,
                    "fuse_layers": self.fuse_layers,
                    "subword": self.subword,
                },
                f,
            )
        return model_dir

    @classmethod
    def load(cls, model_dir: str) -> "NumpySpanModel":
        """Checkpoint source (``GLiNER.from_pretrained`` analog,
        ``gliner/model.py:768-919``): rebuild from ``config.json`` and
        overwrite every weight from the ``.npz``."""
        import json
        import os

        with open(os.path.join(model_dir, "config.json")) as f:
            cfg = json.load(f)
        # Checkpoints written before the BPE tokenizer existed carry no
        # "subword" key; they were tokenized with "chunk" at save time,
        # so reloading them must NOT pick up the newer "bpe" default
        # (the reference keeps tokenizer config with the checkpoint).
        cfg.setdefault("subword", "chunk")
        model = cls(**cfg)
        arrays = np.load(os.path.join(model_dir, "model.npz"))
        f32 = lambda a: a.astype(np.float32, copy=False)  # noqa: E731
        model.embed = f32(arrays["embed"])
        model.mix_w, model.mix_b = f32(arrays["mix_w"]), f32(arrays["mix_b"])
        if model.attn is not None:
            model.attn.load_weights(arrays, "attn.")
        layer = model.span_rep_layer
        if hasattr(layer, "load_weights"):
            layer.load_weights(arrays, "span_rep.")
        else:
            for key in layer.weights():
                parts = key.split(".")
                target = (
                    getattr(layer, parts[0])
                    if len(parts) == 2
                    and isinstance(getattr(layer, parts[0], None), _Projection)
                    else layer
                )
                setattr(target, parts[-1], f32(arrays[f"span_rep.{key}"]))
        for wn in ("w1", "b1", "w2", "b2"):
            setattr(model.prompt_rep_layer, wn, f32(arrays[f"prompt_rep_layer.{wn}"]))
        if model.rnn is not None:
            for wn in ("w_f", "b_f", "w_b", "b_b"):
                setattr(model.rnn, wn, f32(arrays[f"rnn.{wn}"]))
        for nm, obj in (
            ("labels_tower", model.labels_tower),
            ("cross_fuser", model.cross_fuser),
            ("layers_fuser", model.layers_fuser),
        ):
            if obj is not None:
                obj.load_weights(arrays, f"{nm}.")
        return model

    @classmethod
    def from_safetensors(
        cls,
        path: str,
        labels: list[str],
        strict: bool = False,
        **config,
    ) -> tuple["NumpySpanModel", dict[str, list[str]]]:
        """Build a model from a REFERENCE-format ``model.safetensors``
        checkpoint (``GLiNER.save_pretrained`` output,
        ``gliner/model.py:741-744``) with no torch/safetensors deps —
        pure-numpy header+tensor parse and name mapping
        (:mod:`~gliner_ray.kernels.safetensors_io`). Returns
        ``(model, report)`` where report lists loaded / skipped /
        missing keys; ``strict=True`` raises on any gap
        (``gliner/model.py:876`` semantics)."""
        import os

        from .safetensors_io import load_reference_state, read_safetensors

        if os.path.isdir(path):
            path = os.path.join(path, "model.safetensors")
        tensors, _meta = read_safetensors(path)
        model = cls(labels, **config)
        report = load_reference_state(model, tensors, strict=strict)
        return model, report

    # ------------------------------------------------------ encoder-lite
    def _positions(self, T: int) -> np.ndarray:
        if self._pos_cache is None or self._pos_cache.shape[0] < T:
            D = self.hidden_size
            pos = np.arange(max(T, 512))[:, None]
            div = np.exp(np.arange(0, D, 2) * (-np.log(10000.0) / D))
            pe = np.zeros((max(T, 512), D), dtype=np.float32)
            pe[:, 0::2] = np.sin(pos * div)
            pe[:, 1::2] = np.cos(pos * div)
            self._pos_cache = pe
        return self._pos_cache[:T]

    def encode_tokens(
        self, input_ids: np.ndarray, attention_mask: np.ndarray
    ) -> np.ndarray:
        """(B, T) ids → (B, T, D) contextual embeddings."""
        B, T = input_ids.shape
        e = self.embed[input_ids] + self._positions(T)[None, :, :]
        e = e * attention_mask[:, :, None].astype(np.float32)
        if self.attn is not None:  # transformer-lite path
            if self.layers_fuser is not None:
                # config.fuse_layers (encoder.py:102-124): squeeze-
                # excitation sum of the per-layer hidden states
                _, hidden = self.attn(e, attention_mask, return_hidden=True)
                fused = self.layers_fuser(hidden)
                return (fused * attention_mask[:, :, None]).astype(np.float32)
            return self.attn(e, attention_mask)
        # ±1 neighborhood average = minimal context mixing
        ctx = e.copy()
        ctx[:, 1:] += e[:, :-1]
        ctx[:, :-1] += e[:, 1:]
        ctx /= 3.0
        return np.tanh(ctx @ self.mix_w + self.mix_b)

    # ----------------------------------- embedding extraction (base.py:33-82)
    def extract_embeddings(
        self,
        token_embeds: np.ndarray,
        input_ids: np.ndarray,
        words_mask: np.ndarray,
        text_lengths: np.ndarray,
    ):
        """→ (prompts_embedding (B,C,D), prompts_mask (B,C),
        words_embedding (B,W,D), words_mask_out (B,W))."""
        B, T, D = token_embeds.shape
        class_token_mask = input_ids == ENT_TOKEN_ID
        num_class_tokens = class_token_mask.sum(axis=1)
        C = int(num_class_tokens.max()) if B else 0
        W = int(text_lengths.max()) if B else 0

        prompts_embedding = np.zeros((B, C, D), dtype=token_embeds.dtype)
        prompts_mask = (
            np.arange(C)[None, :] < num_class_tokens[:, None]
        ).astype(np.int64)
        b_idx, t_idx = np.nonzero(class_token_mask)
        # within-row running index of each class token
        order = np.concatenate([np.arange(n) for n in num_class_tokens]) if B else []
        prompts_embedding[b_idx, order] = token_embeds[b_idx, t_idx]

        words_embedding = np.zeros((B, W, D), dtype=token_embeds.dtype)
        wb_idx, wt_idx = np.nonzero(words_mask > 0)
        target = words_mask[wb_idx, wt_idx] - 1
        words_embedding[wb_idx, target] = token_embeds[wb_idx, wt_idx]
        words_mask_out = (
            np.arange(W)[None, :] < text_lengths[:, None]
        ).astype(np.int64)
        return prompts_embedding, prompts_mask, words_embedding, words_mask_out

    # --------------------------------------------- span grid (processor.py)
    def span_grid(self, text_lengths: np.ndarray, W: int):
        """→ span_idx (B, L·K, 2), span_mask (B, L·K) over a padded
        length-W grid (``preprocess_example`` + ``create_batch_dict``)."""
        K = self.max_width
        B = len(text_lengths)
        starts = np.repeat(np.arange(W), K)
        ends = starts + np.tile(np.arange(K), W)
        span_idx = np.stack([starts, ends], axis=1)[None].repeat(B, axis=0)
        span_mask = ends[None, :] <= (text_lengths[:, None] - 1)
        # zero invalid idx like ``span_idx * span_mask`` (base.py:533)
        span_idx = span_idx * span_mask[:, :, None]
        return span_idx, span_mask.astype(np.int64)

    # ------------------------------------------------------------ forward
    def label_embeddings(self) -> np.ndarray:
        """(C, D) prompt embeddings from a prompt-only input — the
        label pre-embedding cache (``gliner/model.py:604-630``,
        ``encode_labels``): compute once, reuse for every batch via
        :meth:`forward` ``prompts_embedding=``.

        In bi-encoder mode (``labels_encoder=True``) this is the
        labels TOWER output: each label encoded independently and
        mean-pooled (``encoder.py:170-180``) — raw, un-projected,
        because ``prompt_rep_layer`` applies after the (optional)
        cross-fuser in forward, exactly like the reference
        (``base.py:546``)."""
        if self.labels_tower is not None:
            rows = [lbl.split() or [lbl] for lbl in self.labels]
            enc = encode_batch(self.tokenizer, rows, [])
            return self.labels_tower.encode(
                enc["input_ids"], enc["attention_mask"],
                self._positions(enc["input_ids"].shape[1]),
            )
        enc = encode_batch(self.tokenizer, [[]], self.labels)
        token_embeds = self.encode_tokens(enc["input_ids"], enc["attention_mask"])
        pe, _, _, _ = self.extract_embeddings(
            token_embeds, enc["input_ids"], enc["words_mask"],
            np.maximum(enc["text_lengths"], 1),
        )
        return self.prompt_rep_layer(pe[0])

    def forward(
        self,
        token_lists: list[list[str]],
        prompts_embedding: np.ndarray | None = None,
    ) -> tuple[np.ndarray, np.ndarray]:
        """Batch of word-token lists → (logits (B, W, K, C), text_lengths).

        ``prompts_embedding`` (C, D): optional pre-computed label
        embeddings (the ``batch_predict_with_embeds`` fast path,
        ``model.py:476-531``) — skips per-batch prompt extraction and
        drops the prompt tokens from the encoder input entirely. In
        uni mode pass the PROJECTED :meth:`label_embeddings` output;
        in bi-encoder mode pass the RAW tower output (also what
        :meth:`label_embeddings` returns there) — projection happens
        after the optional cross-fuser, as in the reference.
        """
        bi = self.labels_tower is not None
        if bi or prompts_embedding is not None:
            enc = encode_batch(self.tokenizer, token_lists, [])
        else:
            enc = encode_batch(self.tokenizer, token_lists, self.labels)
        text_lengths = enc["text_lengths"]
        token_embeds = self.encode_tokens(enc["input_ids"], enc["attention_mask"])
        pe, _, words_embedding, words_mask_out = self.extract_embeddings(
            token_embeds, enc["input_ids"], enc["words_mask"], text_lengths
        )
        B, W, D = words_embedding.shape
        K = self.max_width
        if W == 0:  # all-empty batch
            C = len(self.labels)
            self.last_span_rep = np.zeros((B, 0, K, D))
            return np.zeros((B, 0, K, C)), text_lengths
        labels_b = None
        if bi:
            # get_bi_representations (base.py:149-180): tower labels →
            # broadcast to the batch → optional cross-fuser enhancement
            # of BOTH streams. NOTE no rnn in the bi path, as in ref.
            labels_raw = (
                prompts_embedding
                if prompts_embedding is not None
                else self.label_embeddings()
            )
            labels_b = np.broadcast_to(
                labels_raw[None], (B,) + labels_raw.shape
            ).astype(words_embedding.dtype)
            if self.cross_fuser is not None:
                labels_mask = np.ones(labels_b.shape[:2], np.int64)
                labels_b, words_embedding = self.cross_fuser(
                    labels_b, words_embedding, labels_mask, words_mask_out
                )
        elif self.rnn is not None:  # config.has_rnn (base.py:106-107)
            words_embedding = self.rnn(words_embedding, text_lengths)

        span_idx, span_mask = self.span_grid(text_lengths, W)

        # span-rep plugin dispatch (SpanRepLayer, span_rep.py:381-417).
        # Marker modes project ONLY the valid spans (span_mask == 1):
        # padding rows and past-the-end spans are masked to -30 below
        # anyway, and at K=12 the out_project GEMM over the dense
        # padded grid is the forward's hot spot.
        span_rep = self.span_rep_layer(words_embedding, span_idx, span_mask)
        # kept for the decoder-mode stage (select_span_decoder_embedding
        # consumes span_rep alongside the scores, base.py:549-560)
        self.last_span_rep = span_rep

        if bi:
            # prompt_rep_layer applies AFTER the fuser (base.py:546)
            prompts_embedding_b = self.prompt_rep_layer(labels_b)
        elif prompts_embedding is None:
            prompts_embedding_b = self.prompt_rep_layer(pe)  # (B, C, D)
        else:
            prompts_embedding_b = np.broadcast_to(
                prompts_embedding[None], (B,) + prompts_embedding.shape
            )
        logits = np.einsum("BLKD,BCD->BLKC", span_rep, prompts_embedding_b)
        # mask invalid spans hard-off so sigmoid can never cross 0.5
        # (-30 → sigmoid ≈ 1e-13 without float64 exp overflow warnings)
        logits = np.where(
            span_mask.reshape(B, W, K, 1).astype(bool), logits, -30.0
        )
        return logits, text_lengths


class _TokenScorerHead:
    """``Scorer`` head (``modeling/scorers.py:4-35``) in numpy:
    proj_token/proj_label split into two D-halves; concat
    [token₀ ‖ label₀ ‖ token₁·label₁] → MLP(3D→4D→relu→3) →
    (B, L, C, 3) start/end/inside logits."""

    def __init__(self, rng: np.random.RandomState, d: int):
        self.w_tok, self.b_tok = _linear_init(rng, d, d * 2)
        self.w_lab, self.b_lab = _linear_init(rng, d, d * 2)
        self.w_m1, self.b_m1 = _linear_init(rng, d * 3, d * 4)
        self.w_m2, self.b_m2 = _linear_init(rng, d * 4, 3)

    def __call__(self, token_rep: np.ndarray, label_rep: np.ndarray) -> np.ndarray:
        B, L, D = token_rep.shape
        C = label_rep.shape[1]
        tok = (token_rep @ self.w_tok + self.b_tok).reshape(B, L, 2, D)
        lab = (label_rep @ self.w_lab + self.b_lab).reshape(B, C, 2, D)
        t0 = np.broadcast_to(tok[:, :, None, 0], (B, L, C, D))
        l0 = np.broadcast_to(lab[:, None, :, 0], (B, L, C, D))
        t1l1 = tok[:, :, None, 1] * lab[:, None, :, 1]
        cat = np.concatenate([t0, l0, t1l1], axis=-1)
        h = np.maximum(cat @ self.w_m1 + self.b_m1, 0.0)
        return h @ self.w_m2 + self.b_m2  # (B, L, C, 3)


class NumpyTokenModel:
    """TokenModel forward (``modeling/base.py:630-679``): the same
    encoder + prompt/word extraction as :class:`NumpySpanModel`, with
    the per-token start/end/inside ``Scorer`` head instead of the span
    grid. Logits feed ``kernels/token_decode.decode_token_logits``
    unchanged."""

    def __init__(
        self,
        labels: list[str],
        hidden_size: int = 64,
        vocab_size: int = 50_000,
        seed: int = 1234,
    ):
        self.base = NumpySpanModel(
            labels, hidden_size=hidden_size, max_width=1,
            vocab_size=vocab_size, seed=seed,
        )
        self.labels = list(labels)
        rng = np.random.RandomState(seed + 1)
        self.scorer = _TokenScorerHead(rng, hidden_size)

    def forward(self, token_lists: list[list[str]]):
        """→ (logits (B, W, C, 3), text_lengths)."""
        m = self.base
        enc = encode_batch(m.tokenizer, token_lists, self.labels)
        token_embeds = m.encode_tokens(enc["input_ids"], enc["attention_mask"])
        pe, _, words_embedding, _ = m.extract_embeddings(
            token_embeds, enc["input_ids"], enc["words_mask"], enc["text_lengths"]
        )
        B, W, D = words_embedding.shape
        if W == 0:
            return np.zeros((B, 0, len(self.labels), 3)), enc["text_lengths"]
        return self.scorer(words_embedding, pe), enc["text_lengths"]
