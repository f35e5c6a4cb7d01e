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
