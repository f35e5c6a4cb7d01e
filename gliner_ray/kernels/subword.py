"""Subword tokenization + ``words_mask`` construction.

Mirrors the reference's HF-tokenizer plumbing with a deterministic toy
subword vocabulary (no network, no checkpoint):

- prompt build: ``[<<ENT>>, label, <<ENT>>, label, ..., <<SEP>>]`` then
  the text words (``gliner/data_processing/processor.py:104-128``,
  ``prepare_inputs``).
- subword split: greedy fixed-size character pieces per word — the
  structural stand-in for BPE. Piece ids come from a stable hash, so
  every actor builds the identical vocabulary with zero state.
- ``words_mask``: first-subtoken-per-word marking with prompt zeroing —
  the exact semantics of ``processor.py:130-155`` (``prepare_word_mask``):
  position gets ``word_id - prompt_length + 1`` iff it is the first
  subtoken of a NON-prompt word, else 0. ``[CLS]``/``[SEP]``/``[PAD]``
  (word_id None) are 0.

The ids feed :class:`gliner_ray.kernels.numpy_model.NumpySpanModel`,
whose prompt-embedding extraction keys off ``input_ids ==
ENT_TOKEN_ID`` exactly like ``input_ids == config.class_token_index``
in ``modeling/base.py:57``.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass

import numpy as np

PAD_ID = 0
CLS_ID = 1
SEP_ID = 2
ENT_TOKEN_ID = 3  # <<ENT>> — the class token (config.class_token_index)
SEP_TOKEN_ID = 4  # <<SEP>> — prompt/text separator

_SPECIAL = {"<<ENT>>": ENT_TOKEN_ID, "<<SEP>>": SEP_TOKEN_ID}


def _piece_id(piece: str, vocab_size: int) -> int:
    h = int.from_bytes(hashlib.blake2b(piece.encode(), digest_size=8).digest(), "big")
    return 5 + h % (vocab_size - 5)


@dataclass
class SubwordEncoding:
    """One example's encoding (lists, unpadded)."""

    input_ids: list[int]
    word_ids: list[int | None]  # HF BatchEncoding.word_ids analog
    words_mask: list[int]
    prompt_length: int  # words in the prompt incl. <<SEP>>
    text_length: int  # words in the text


class ToySubwordTokenizer:
    """Deterministic word → subword-piece tokenizer.

    ``piece_len`` chars per piece (greedy left-to-right) models the
    multi-subtoken words that make ``words_mask`` non-trivial; special
    prompt tokens are never split (HF ``add_tokens`` analog)."""

    def __init__(self, vocab_size: int = 50_000, piece_len: int = 4):
        assert vocab_size > 5
        self.vocab_size = vocab_size
        self.piece_len = piece_len

    def word_pieces(self, word: str) -> list[int]:
        if word in _SPECIAL:
            return [_SPECIAL[word]]
        if not word:
            return [_piece_id("", self.vocab_size)]
        n = self.piece_len
        return [
            _piece_id(word[i : i + n], self.vocab_size)
            for i in range(0, len(word), n)
        ]

    def encode_words(
        self, words: list[str], prompt_length: int = 0
    ) -> SubwordEncoding:
        """words (prompt words first) → ids + words_mask.

        ``prompt_length`` counts the leading prompt WORDS (labels +
        markers + ``<<SEP>>``); their subtokens are zeroed in
        ``words_mask`` per ``prepare_word_mask``'s ``words_count <
        prompt_length`` rule."""
        input_ids: list[int] = [CLS_ID]
        word_ids: list[int | None] = [None]
        for wi, w in enumerate(words):
            for pid in self.word_pieces(w):
                input_ids.append(pid)
                word_ids.append(wi)
        input_ids.append(SEP_ID)
        word_ids.append(None)

        # prepare_word_mask (processor.py:130-155), token_level=False
        words_mask: list[int] = []
        prev_word_id: int | None = None
        words_count = 0
        for word_id in word_ids:
            if word_id is None:
                words_mask.append(0)
            elif word_id != prev_word_id:
                if words_count < prompt_length:
                    words_mask.append(0)
                else:
                    words_mask.append(word_id - prompt_length + 1)
                words_count += 1
            else:
                words_mask.append(0)
            prev_word_id = word_id
        return SubwordEncoding(
            input_ids=input_ids,
            word_ids=word_ids,
            words_mask=words_mask,
            prompt_length=prompt_length,
            text_length=len(words) - prompt_length,
        )


# ------------------------------------------------------------ toy BPE
#
# A REAL byte-pair-encoding vocabulary (merge rules, not fixed-size
# chunks) so multi-piece segmentation follows learned merges like the
# reference's HF tokenizer (``processor.py:157-212``). The merges are
# learned at import time from a small deterministic corpus embedded
# below — every worker process derives the identical merge table with
# zero shipped state, preserving the stateless-actor property of the
# chunk tokenizer.

_BPE_TRAIN_TEXT = (
    "def def def def def class class class import import import "
    "return return return self self self the the the the of of of "
    "and and to to in in for for is is not none true false function "
    "function module module value values name names type types data "
    "path paths file files read write open close list dict set int "
    "str float print range index item items error errors test tests "
    "result results parse parser token tokens word words text texts "
    "label labels span spans model models layer layers batch batches "
    "encode decode encoder decoder input inputs output outputs mask "
    "masks length lengths node nodes edge edges graph table tables "
    "call calls init args kwargs object objects string number numbers "
    "the quick brown fox jumps over the lazy dog winter spring summer "
    "loading processing mapping filtering grouping sorting counting"
)


def _learn_merges(num_merges: int) -> dict[tuple[str, str], int]:
    """Classic BPE training (Sennrich 2016): repeatedly merge the most
    frequent adjacent symbol pair (lexicographic-max tie-break for
    determinism). Returns pair → merge rank."""
    from collections import Counter

    wcounts = Counter(_BPE_TRAIN_TEXT.split())
    seqs = {w: tuple(w) + ("</w>",) for w in wcounts}
    merges: dict[tuple[str, str], int] = {}
    for rank in range(num_merges):
        pairs: Counter = Counter()
        for w, c in wcounts.items():
            s = seqs[w]
            for i in range(len(s) - 1):
                pairs[(s[i], s[i + 1])] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges[best] = rank
        joined = best[0] + best[1]
        for w, s in seqs.items():
            out: list[str] = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


_MERGE_CACHE: dict[int, dict[tuple[str, str], int]] = {}


class BpeSubwordTokenizer(ToySubwordTokenizer):
    """Merge-rule subword tokenizer: encode applies the learned merges
    lowest-rank-first until none apply (the standard BPE encode), so a
    word's piece boundaries track corpus statistics instead of a fixed
    stride. Piece ids still come from the stable hash — identical
    vocabulary in every actor, no shipped state."""

    MAX_CACHE = 250_000

    def __init__(self, vocab_size: int = 50_000, num_merges: int = 256):
        super().__init__(vocab_size=vocab_size)
        if num_merges not in _MERGE_CACHE:
            _MERGE_CACHE[num_merges] = _learn_merges(num_merges)
        self.merges = _MERGE_CACHE[num_merges]
        self.num_merges = num_merges
        self._cache: dict[str, list[int]] = {}

    def word_pieces(self, word: str) -> list[int]:
        if word in _SPECIAL:
            return [_SPECIAL[word]]
        if not word:
            return [_piece_id("", self.vocab_size)]
        hit = self._cache.get(word)
        if hit is not None:
            return hit
        s = list(word) + ["</w>"]
        merges = self.merges
        while len(s) > 1:
            best_rank = None
            best_pair = None
            for i in range(len(s) - 1):
                r = merges.get((s[i], s[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (s[i], s[i + 1])
            if best_pair is None:
                break
            joined = best_pair[0] + best_pair[1]
            out: list[str] = []
            i = 0
            while i < len(s):
                if i < len(s) - 1 and (s[i], s[i + 1]) == best_pair:
                    out.append(joined)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            s = out
        ids = [_piece_id(p, self.vocab_size) for p in s]
        if len(self._cache) > self.MAX_CACHE:
            self._cache.clear()
        self._cache[word] = ids
        return ids


SUBWORD_TOKENIZERS = {
    "chunk": ToySubwordTokenizer,
    "bpe": BpeSubwordTokenizer,
}


def build_prompt(labels: list[str]) -> list[str]:
    """``prepare_inputs`` prompt: ``<<ENT>> label`` per label + ``<<SEP>>``."""
    out: list[str] = []
    for lab in labels:
        out.append("<<ENT>>")
        out.append(lab)
    out.append("<<SEP>>")
    return out


def encode_batch(
    tokenizer: ToySubwordTokenizer,
    token_lists: list[list[str]],
    labels: list[str],
) -> dict[str, np.ndarray]:
    """Batch of word-token lists → padded model inputs.

    Returns ``input_ids``/``attention_mask``/``words_mask`` ``(B, T)``
    int64 (padded with 0) + ``text_lengths`` ``(B,)`` — the
    ``tokenize_inputs`` output contract (``processor.py:157-176``)."""
    prompt = build_prompt(labels)
    plen = len(prompt)
    encs = [
        tokenizer.encode_words(prompt + list(toks), prompt_length=plen)
        for toks in token_lists
    ]
    T = max(len(e.input_ids) for e in encs)
    B = len(encs)
    input_ids = np.zeros((B, T), dtype=np.int64)
    attention_mask = np.zeros((B, T), dtype=np.int64)
    words_mask = np.zeros((B, T), dtype=np.int64)
    text_lengths = np.zeros((B,), dtype=np.int64)
    for i, e in enumerate(encs):
        n = len(e.input_ids)
        input_ids[i, :n] = e.input_ids
        attention_mask[i, :n] = 1
        words_mask[i, :n] = e.words_mask
        text_lengths[i] = e.text_length
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "words_mask": words_mask,
        "text_lengths": text_lengths,
    }
