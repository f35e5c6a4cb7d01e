"""Deterministic span scorer kernel (the CI backend of stage [B]).

Contract (FIXTURES.md §5): the logit/probability for span ``(i, i+j)``
and label ``c`` is a pure function of the span surface + label (salted
with the doc sha + absolute token start so scores vary per occurrence
but are process-independent). A (span, label) pair scores above the
sigmoid threshold iff the span's token sequence is in the planted
entity vocabulary with that label — plus deterministic *distractor*
candidates (overlapping, lower-scored, different label) that exercise
greedy NMS exactly like real model noise would.

This mirrors the shape of the reference scorer output
(``gliner/modeling/base.py:547`` einsum → ``(B, L, K, C)`` logits →
``SpanDecoder.decode`` ``gliner/decoding/decoder.py:54-128``) but emits
the *sparse* candidate set directly: the set ``{(s,k,c):
sigmoid(logit) > threshold}`` is identical to what dense decode would
visit, in the same row-major ``(s, k, c)`` order, so
``decode_candidates`` reproduces dense-path semantics without
materializing an ``L×K×C`` grid per row (unit-tested equivalence in
``tests/test_kernels.py``).

A real-model backend (torch GLiNER checkpoint) would plug in at the
same interface — see ``stages/scorer.py``.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

# (surface form, label) planted-entity vocabulary — FIXTURES.md §1.
ENTITY_VOCAB: list[tuple[str, str]] = [
    ("parse_config", "function"),
    ("run_batch", "function"),
    ("get_user_by_id", "function"),
    ("HttpClient", "class"),
    ("SpanDecoder", "class"),
    ("LRUCache", "class"),
    ("numpy", "library"),
    ("ray", "library"),
    ("pyarrow", "library"),
    ("left-pad", "library"),
    ("Apache-2.0", "license"),
    ("MIT", "license"),
    ("GPL-3.0-only", "license"),
    ("Jane Doe <jane@example.com>", "author"),
    ("Jane Doe", "author"),  # overlaps the email form → exercises NMS
    ("bobsmith", "author"),
    ("CVE-2021-44228", "cve"),
    ("CVE-2014-0160", "cve"),
    ("1.2.3", "version"),
    ("v0.9.0-rc1", "version"),
    (">=2.0,<3", "version"),
]

LABELS: list[str] = ["function", "class", "library", "license", "author", "cve", "version"]


def _hash_frac(*parts: object) -> float:
    """Deterministic float in [0, 1) from sha256 of the joined parts."""
    h = hashlib.sha256("|".join(str(p) for p in parts).encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") / float(1 << 64)


class DeterministicScorerKernel:
    """Pure-Python scorer: token sequence → sparse span candidates.

    Holds the compiled vocabulary index (built once; in the distributed
    stage this lives in the actor's ``__init__``, amortized per actor).
    """

    #: planted matches score in [0.80, 0.99); distractors in [0.55, 0.65)
    PLANT_LO, PLANT_SPAN = 0.80, 0.19
    DISTRACT_LO, DISTRACT_SPAN = 0.55, 0.10
    #: emit a distractor for roughly this fraction of width≥2 matches
    DISTRACT_RATE = 0.5

    def __init__(
        self,
        vocab: Sequence[tuple[str, str]] = tuple(ENTITY_VOCAB),
        labels: Sequence[str] = tuple(LABELS),
    ):
        from .tokenize import tokenize_with_offsets

        self.labels = list(labels)
        self.label_id = {lab: i for i, lab in enumerate(self.labels)}
        # token-sequence → list of labels (a surface may carry several)
        self.index: dict[tuple[str, ...], list[str]] = {}
        for surface, label in vocab:
            toks, _, _ = tokenize_with_offsets(surface)
            key = tuple(toks)
            self.index.setdefault(key, [])
            if label not in self.index[key]:
                self.index[key].append(label)
        self.widths = sorted({len(k) for k in self.index})
        self.max_width = max(self.widths) if self.widths else 1
        # first-token prefilter: most positions are non-entity tokens,
        # so the hot loop pays one dict miss instead of |widths| slice
        # lookups (measured ~6× on the bench corpus)
        self.by_first: dict[str, list[tuple[int, tuple[str, ...]]]] = {}
        for key in self.index:
            self.by_first.setdefault(key[0], []).append((len(key), key))
        for lst in self.by_first.values():
            lst.sort(key=lambda wk: wk[0])  # ascending width (k order)

    def score_tokens(
        self,
        tokens: Sequence[str],
        doc_sha: str,
        tok_offset: int = 0,
    ) -> list[tuple[int, int, str, float]]:
        """Return sparse candidates ``(s, k, label, prob)`` in row-major
        ``(s, k, label_id)`` order (dense-decode visit order).

        ``tok_offset`` is the chunk's absolute token start in the doc so
        occurrence scores are chunk-invariant (the same span scored from
        two overlapping chunks gets the same probability).
        """
        n = len(tokens)
        out: list[tuple[int, int, str, float]] = []
        by_first = self.by_first
        for s in range(n):
            cand_keys = by_first.get(tokens[s])
            if cand_keys is None:
                continue
            # candidate widths at this start, ascending k then label id
            for w, key in cand_keys:
                if s + w > n:
                    continue
                if tuple(tokens[s : s + w]) != key:
                    continue
                found = self.index[key]
                k = w - 1
                abs_s = tok_offset + s
                for label in sorted(found, key=self.label_id.__getitem__):
                    prob = self.PLANT_LO + self.PLANT_SPAN * _hash_frac(
                        doc_sha, abs_s, " ".join(key), label
                    )
                    out.append((s, k, label, prob))
                    # deterministic overlapping distractor: same start,
                    # one token shorter, rotated label, sub-plant score
                    if k >= 1 and _hash_frac("d?", doc_sha, abs_s, label) < self.DISTRACT_RATE:
                        dlabel = self.labels[
                            (self.label_id[label] + 1) % len(self.labels)
                        ]
                        dprob = self.DISTRACT_LO + self.DISTRACT_SPAN * _hash_frac(
                            "dp", doc_sha, abs_s, dlabel
                        )
                        out.append((s, k - 1, dlabel, dprob))
        # restore strict row-major (s, k, label_id) order (distractors
        # were emitted out of k-order); dedupe same-cell candidates
        # keeping the last emitted, matching dense-grid overwrite order
        out.sort(key=lambda c: (c[0], c[1], self.label_id[c[2]]))
        deduped: dict[tuple[int, int, str], tuple[int, int, str, float]] = {}
        for c in out:
            deduped[(c[0], c[1], c[2])] = c
        return list(deduped.values())

    def dense_logits(self, tokens: Sequence[str], doc_sha: str, tok_offset: int = 0):
        """Materialize the dense ``(L, K, C)`` logit grid (tests only).

        Non-candidate cells get a large negative logit (prob ≈ 0);
        candidate cells get ``logit(prob)``. Mirrors the reference
        tensor contract ``modeling/base.py:547``.
        """
        import numpy as np

        n = len(tokens)
        grid = np.full((n, self.max_width, len(self.labels)), -12.0, dtype=np.float64)
        for s, k, label, prob in self.score_tokens(tokens, doc_sha, tok_offset):
            grid[s, k, self.label_id[label]] = float(np.log(prob / (1.0 - prob)))
        return grid

    def id_to_class(self) -> dict[int, str]:
        """1-based label map (0 = pad) — reference ``model.py:201-205``."""
        return {i + 1: lab for i, lab in enumerate(self.labels)}
