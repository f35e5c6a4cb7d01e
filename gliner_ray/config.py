"""Engine configuration.

Defaults mirror the reference where one exists: ``max_len`` (word
truncation length, ``gliner/config.py:26`` / ``processor.py:350-352``),
``max_width`` (span width cap, ``gliner/config.py:13``), decode
``threshold`` 0.5 (``model.py:371``, ``evaluate.py`` protocol),
``flat_ner`` (``model.py:368``; nested only for ACE/GENIA-style data,
``evaluate.py:88-90``).

Where the reference truncates documents at ``max_len``
(``processor.py:350-352``), this engine *chunks* with an overlap of
``chunk_overlap ≥ max span width`` and exact-dedups mentions found in
the overlap — no text is dropped. The single-threaded oracle applies
the identical chunking so span parity is exact.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from .kernels.scoring import ENTITY_VOCAB, LABELS


@dataclass(frozen=True)
class PipelineConfig:
    max_len: int = 384              # words per chunk (reference truncation length)
    max_width: int = 12             # max span width in words (gliner/config.py:13)
    chunk_overlap: int = 16         # ≥ longest vocab span (9 tokens) and distractors
    threshold: float = 0.5          # sigmoid decode threshold
    flat_ner: bool = True           # greedy NMS mode (flat vs nested)
    multi_label: bool = False
    n_buckets: int = 64             # repo-hash output partitions (resume granularity + write parallelism)
    labels: tuple = tuple(LABELS)
    vocab: tuple = tuple(ENTITY_VOCAB)
    # stage sizing (single 32-CPU node defaults; a real cluster scales
    # these with concurrency=(min, max) autoscaling pools)
    scorer_batch_size: int = 256
    scorer_concurrency: int | None = None  # None → stateless-task elasticity
    link_broadcast_limit: int = 5_000_000  # variant→entity map rows; above → shuffle join


DEFAULT_CONFIG = PipelineConfig()
