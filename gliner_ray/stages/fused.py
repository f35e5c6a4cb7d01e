"""Fused extraction stage: [A] chunk → [B] score → [C] decode in ONE
actor ``__call__``.

The modular stages ship the intermediate chunk table (token lists +
char-offset lists + chunk text ≈ 3–4× the corpus bytes) through the
object store twice — at 100 TB that traffic, not compute, dominates
extraction (measured: an 11× scorer-kernel speedup moved end-to-end
wall time by ~0%). Fusing the three per-row stages into one actor-pool
``map_batches`` keeps every intermediate in actor memory: the only
object-store traffic is the input files batch in and the (small)
mentions batch out. This also mirrors the reference control flow,
which decodes immediately after the forward pass inside one loop
(``gliner/model.py:399-425``).

The modular stages remain available (and oracle-tested) for pipelines
that need to checkpoint or branch between [A]/[B]/[C] — e.g. a GPU
scorer pool fed by CPU chunkers would deliberately un-fuse [B].
"""

from __future__ import annotations

import pyarrow as pa

from ..config import PipelineConfig
from .decode_stage import make_decoder
from .normalize import make_chunker
from .scorer import DeterministicScorer


class FusedExtractor:
    """files batch (repo, path, commit, lang, content, bucket) →
    mentions batch (MENTION_SCHEMA). State (vocab index) built once
    per actor."""

    def __init__(self, cfg: PipelineConfig, scorer_cls=DeterministicScorer):
        self.chunk = make_chunker(cfg)
        self.score = scorer_cls(cfg)
        self.decode = make_decoder(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.decode(self.score(self.chunk(batch)))
