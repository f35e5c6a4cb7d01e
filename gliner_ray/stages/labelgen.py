"""Decoder-mode label generation — trie-constrained span labeling.

The reference's span-decoder mode (``config.labels_decoder``) runs a
seq2seq decoder over kept span embeddings to GENERATE label strings,
constrained to the allowed-label set by a token-prefix trie:

- span selection: ``select_span_decoder_embedding``
  (``modeling/base.py:407-460``) — ``sigmoid(scores).max(-1) >
  threshold`` over the flat ``(B, L·K)`` grid, keeping the span
  embeddings and their flat indices (``sel_idx``, padded ``-1``).
- constrained generation loop: ``generate_from_embeds_custom``
  (``modeling/decoder.py:90-180``) — per step: mask logits to
  ``trie.get(generated_so_far)`` (dead end → ``[eos]``), greedy
  argmax, stop at eos.
- id remapping: ``update_id_to_classes`` (``decoding/decoder.py:17-29``)
  — prompt mode replaces each example's class map with its slice of
  the generated labels (cursor walk).
- span↔gen-label alignment: ``SpanDecoder.decode``
  (``decoding/decoder.py:84-129``) — ``gen_labels`` are ordered like
  ``sel_idx`` flattened row-major; each span gets
  ``num_gen_sequences`` consecutive labels keyed by ``flat_idx = s *
  max_width + k``.

The torch LM is replaced by a deterministic numpy recurrence with
fixed seeded weights (same rationale as ``kernels/numpy_model``): the
CONTROL FLOW — trie masking, greedy argmax, eos, cursor alignment —
is the reference's, testable without a checkpoint.
"""

from __future__ import annotations

import numpy as np

from ..kernels.decode import greedy_nms
from ..kernels.numpy_model import NumpySpanModel, _linear_init
from ..kernels.trie import LabelsTrie

EOS_ID = 0  # generation sentinel (never a label-piece id; piece ids ≥ 5)


def update_id_to_classes(
    id_to_classes,
    gen_labels: list[str],
    batch_size: int,
    decoder_mode: str = "prompt",
    has_decoder: bool = True,
):
    """``BaseDecoder.update_id_to_classes`` (decoding/decoder.py:17-29):
    prompt mode replaces each example's ``{1: label0, ...}`` map with
    its generated-label slice; span mode (and no-decoder) passes
    through unchanged."""
    if not has_decoder or decoder_mode != "prompt":
        return id_to_classes
    new_id_to_classes = []
    cursor = 0
    for i in range(batch_size):
        original = id_to_classes[i] if isinstance(id_to_classes, list) else id_to_classes
        k = len(original)
        mapping = {idx + 1: gen_labels[cursor + idx] for idx in range(k)}
        new_id_to_classes.append(mapping)
        cursor += k
    return new_id_to_classes


class NumpyLabelDecoder:
    """Deterministic autoregressive label decoder over span embeddings.

    ``__init__`` builds the label-token trie ONCE (per actor — the
    reference builds ``LabelsTrie`` from the decoder tokenizer's label
    encodings, ``gliner/model.py``), plus fixed recurrence weights.
    ``generate`` mirrors the custom generation loop step for step.
    """

    def __init__(
        self,
        labels: list[str],
        model: NumpySpanModel,
        max_new_tokens: int | None = None,
        seed: int = 99,
    ):
        self.model = model
        tok = model.tokenizer
        self.label_seqs = {lab: tuple(tok.word_pieces(lab)) for lab in labels}
        # generation budget must cover the LONGEST label's piece
        # sequence (+eos step) or trie-terminality breaks — the piece
        # count is tokenizer-dependent (BPE fragments rare words finer
        # than the chunk stand-in did)
        longest = max((len(s) for s in self.label_seqs.values()), default=1)
        self.max_new_tokens = (
            max_new_tokens if max_new_tokens is not None else longest + 1
        )
        self.trie = LabelsTrie(self.label_seqs.values())
        self.seq_to_label = {seq: lab for lab, seq in self.label_seqs.items()}
        D = model.hidden_size
        rng = np.random.RandomState(seed)
        self.w_init, self.b_init = _linear_init(rng, D, D)
        self.w_h, self.b_h = _linear_init(rng, D, D)
        self.w_out, _ = _linear_init(rng, D, 1)  # scores via embed table below
        # token "output head": score(v) = state · embed[v]; reuse the
        # span model's embedding table so weights stay small
        self.embed = model.embed

    def generate(self, span_embeds: np.ndarray) -> list[list[int]]:
        """(N, D) span embeddings → N generated token-id sequences.

        Per step (generate_from_embeds_custom, modeling/decoder.py:123-170):
        allowed = trie.get(generated); empty → [eos]; mask; argmax;
        append; eos finishes the row."""
        N, D = span_embeds.shape
        state = np.tanh(span_embeds @ self.w_init + self.b_init)
        generated: list[list[int]] = [[] for _ in range(N)]
        unfinished = np.ones(N, dtype=bool)
        for _ in range(self.max_new_tokens):
            if not unfinished.any():
                break
            for b in range(N):
                if not unfinished[b]:
                    continue
                allowed = self.trie.get(generated[b])
                if not allowed:
                    allowed = [EOS_ID]
                # masked greedy argmax over allowed ids only
                scores = self.embed[allowed] @ state[b]
                nxt = allowed[int(np.argmax(scores))]
                if nxt == EOS_ID:
                    unfinished[b] = False
                    continue
                generated[b].append(nxt)
                state[b] = np.tanh(
                    state[b] @ self.w_h + self.embed[nxt] + self.b_h
                )
        return generated

    def generate_labels(self, span_embeds: np.ndarray) -> list[str]:
        """token sequences → label strings (decoder-tokenizer decode
        analog); a sequence that is not a complete label (max-token cut
        mid-trie) falls back to its longest trie-terminal prefix."""
        out = []
        for seq in self.generate(span_embeds):
            t = tuple(seq)
            while t and t not in self.seq_to_label:
                t = t[:-1]
            out.append(self.seq_to_label.get(t, ""))
        return out


def select_span_embeddings(
    logits: np.ndarray,
    span_rep: np.ndarray,
    text_lengths: np.ndarray,
    max_width: int,
    threshold: float = 0.5,
):
    """``select_span_decoder_embedding`` (base.py:407-460), span mode:
    keep flat spans with ``sigmoid(scores).max(-1) > threshold`` (and
    valid), return (flat span_reps row-major (N, D), sel_idx (B, M)
    padded -1)."""
    B, L, K, C = logits.shape
    probs = 1.0 / (1.0 + np.exp(-logits))
    flat_prob = probs.max(axis=-1).reshape(B, L * K)
    starts = np.repeat(np.arange(L), K)[None, :]
    ends = starts + np.tile(np.arange(K), L)[None, :]
    valid = ends < text_lengths[:, None]
    keep = (flat_prob > threshold) & valid
    flat_rep = span_rep.reshape(B, L * K, -1)
    M = int(keep.sum(axis=1).max()) if B else 0
    sel_idx = np.full((B, M), -1, dtype=np.int64)
    reps = []
    for b in range(B):
        idx = np.nonzero(keep[b])[0]
        sel_idx[b, : len(idx)] = idx
        reps.append(flat_rep[b, idx])
    flat = np.concatenate(reps, axis=0) if reps else np.zeros((0, span_rep.shape[-1]))
    return flat, sel_idx


def decode_with_gen_labels(
    tokens: list[list[str]],
    id_to_classes,
    logits: np.ndarray,
    sel_idx: np.ndarray | None = None,
    gen_labels: list[str] | None = None,
    num_gen_sequences: int = 1,
    flat_ner: bool = True,
    threshold: float = 0.5,
    multi_label: bool = False,
) -> list[list[tuple]]:
    """``SpanDecoder.decode`` with generation (decoding/decoder.py:55-129):
    spans are ``(s, e, ent_type, gen_ent_type, prob)``; ``gen_labels``
    align to ``sel_idx`` flattened row-major, ``num_gen_sequences``
    consecutive labels per kept span."""
    B, L, K, C = logits.shape
    probs = 1.0 / (1.0 + np.exp(-np.asarray(logits, dtype=np.float64)))

    span_label_maps: list[dict] = [{} for _ in range(B)]
    if sel_idx is not None and gen_labels is not None:
        cursor = 0
        for b in range(B):
            valid_pos = sel_idx[b] != -1
            n = int(valid_pos.sum())
            if n:
                flat_indices = sel_idx[b][valid_pos].tolist()
                start_index = cursor * num_gen_sequences
                span_labels = gen_labels[start_index : start_index + n * num_gen_sequences]
                labels_b = [
                    span_labels[i * num_gen_sequences : (i + 1) * num_gen_sequences]
                    for i in range(n)
                ]
                span_label_maps[b] = dict(zip(flat_indices, labels_b))
            cursor += n

    out: list[list[tuple]] = []
    for i in range(B):
        id_to_class_i = id_to_classes[i] if isinstance(id_to_classes, list) else id_to_classes
        span_i = []
        s_idx, k_idx, c_idx = np.nonzero(probs[i] > threshold)
        for s, k, c in zip(s_idx.tolist(), k_idx.tolist(), c_idx.tolist()):
            if s + k + 1 > len(tokens[i]):
                continue
            flat_idx = s * K + k
            gen_ent_type = (
                span_label_maps[i].get(flat_idx) if gen_labels is not None else None
            )
            ent_type = id_to_class_i[c + 1]
            span_i.append((s, s + k, ent_type, gen_ent_type, float(probs[i][s, k, c])))
        out.append(greedy_nms(span_i, flat_ner=flat_ner, multi_label=multi_label))
    return out


class GenLabelExtractor:
    """Actor-pool stage: documents batch → generated-label span rows.

    One actor holds model + trie + decoder weights (``__init__``); each
    batch runs forward → span selection → trie-constrained generation →
    aligned decode. Output: (doc_id, start, end, label, gen_label,
    score) — the decoder-mode analog of the mention extractor."""

    def __init__(
        self,
        labels: list[str],
        hidden_size: int = 64,
        max_width: int = 6,
        threshold: float = 0.5,
        seed: int = 1234,
    ):
        self.model = NumpySpanModel(
            labels, hidden_size=hidden_size, max_width=max_width, seed=seed
        )
        self.decoder = NumpyLabelDecoder(labels, self.model)
        self.threshold = threshold
        self.labels = labels

    def process_token_lists(
        self, token_lists: list[list[str]]
    ) -> list[list[tuple]]:
        logits, tl = self.model.forward(token_lists)
        span_rep = self.model.last_span_rep
        flat, sel_idx = select_span_embeddings(
            logits, span_rep, tl, self.model.max_width, self.threshold
        )
        gen = self.decoder.generate_labels(flat)
        id_to_class = {i + 1: lab for i, lab in enumerate(self.labels)}
        return decode_with_gen_labels(
            token_lists, id_to_class, logits,
            sel_idx=sel_idx, gen_labels=gen, threshold=self.threshold,
        )

    def __call__(self, batch):
        import pyarrow as pa

        token_lists = [t.split() for t in batch["text"].to_pylist()]
        doc_ids = batch["doc_id"].to_pylist()
        spans_per_doc = self.process_token_lists(token_lists)
        rows = {"doc_id": [], "start": [], "end": [], "label": [],
                "gen_label": [], "score": []}
        for did, spans in zip(doc_ids, spans_per_doc):
            for s, e, lab, gen, p in spans:
                rows["doc_id"].append(did)
                rows["start"].append(s)
                rows["end"].append(e)
                rows["label"].append(lab)
                rows["gen_label"].append(gen[0] if gen else None)
                rows["score"].append(p)
        return pa.table(
            {
                "doc_id": pa.array(rows["doc_id"], pa.int64()),
                "start": pa.array(rows["start"], pa.int32()),
                "end": pa.array(rows["end"], pa.int32()),
                "label": pa.array(rows["label"], pa.string()),
                "gen_label": pa.array(rows["gen_label"], pa.string()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )


class GenMentionExtractor:
    """Decoder-mode MENTION extractor over corpus file rows — the
    ``GLiNER.run`` decoder-mode analog (``gliner/model.py:405-413``):
    same actor-pool shape and output schema as the prompt-mode
    extractor (doc_sha256, char/tok offsets, text, label, score) plus
    the trie-constrained ``gen_label``. One actor holds model + trie +
    decoder weights; each batch runs offset tokenization → forward →
    span selection → constrained generation → aligned decode."""

    def __init__(
        self,
        labels: list[str],
        hidden_size: int = 48,
        max_width: int = 4,
        threshold: float = 0.5,
        seed: int = 1234,
    ):
        self.model = NumpySpanModel(
            labels, hidden_size=hidden_size, max_width=max_width, seed=seed
        )
        self.decoder = NumpyLabelDecoder(labels, self.model)
        self.threshold = threshold
        self.labels = labels

    def __call__(self, batch):
        import hashlib

        import pyarrow as pa

        from ..kernels.tokenize import tokenize_with_offsets

        texts = batch["content"].to_pylist()
        shas = [hashlib.sha256(t.encode("utf-8")).hexdigest() for t in texts]
        toks_offs = [tokenize_with_offsets(t) for t in texts]
        token_lists = [t for t, _, _ in toks_offs]

        logits, tl = self.model.forward(token_lists)
        span_rep = self.model.last_span_rep
        flat, sel_idx = select_span_embeddings(
            logits, span_rep, tl, self.model.max_width, self.threshold
        )
        gen = self.decoder.generate_labels(flat)
        id_to_class = {i + 1: lab for i, lab in enumerate(self.labels)}
        spans_per_doc = decode_with_gen_labels(
            token_lists, id_to_class, logits,
            sel_idx=sel_idx, gen_labels=gen, threshold=self.threshold,
        )

        rows: dict[str, list] = {
            "doc_sha256": [], "start": [], "end": [],
            "tok_start": [], "tok_end": [], "text": [],
            "label": [], "gen_label": [], "score": [],
        }
        for (toks, starts, ends), sha, txt, spans in zip(
            toks_offs, shas, texts, spans_per_doc
        ):
            for s, e, lab, gl, p in spans:
                cs, ce = starts[s], ends[e]
                rows["doc_sha256"].append(sha)
                rows["start"].append(cs)
                rows["end"].append(ce)
                rows["tok_start"].append(s)
                rows["tok_end"].append(e)
                rows["text"].append(txt[cs:ce])
                rows["label"].append(lab)
                rows["gen_label"].append(gl[0] if gl else None)
                rows["score"].append(p)
        return pa.table(
            {
                "doc_sha256": pa.array(rows["doc_sha256"], pa.string()),
                "start": pa.array(rows["start"], pa.int32()),
                "end": pa.array(rows["end"], pa.int32()),
                "tok_start": pa.array(rows["tok_start"], pa.int32()),
                "tok_end": pa.array(rows["tok_end"], pa.int32()),
                "text": pa.array(rows["text"], pa.string()),
                "label": pa.array(rows["label"], pa.string()),
                "gen_label": pa.array(rows["gen_label"], pa.string()),
                "score": pa.array(rows["score"], pa.float64()),
            }
        )
