"""Fused extraction stage: [A] chunk → [B] score → [C] decode in ONE
actor ``__call__``, with no intermediate Arrow tables.

Two measured motivations (kept in git history):

1. The modular stages ship the intermediate chunk table (token lists +
   char-offset lists + chunk text ≈ 3–4× the corpus bytes) through the
   object store twice — at 100 TB that traffic, not compute, dominates
   extraction (an 11× scorer-kernel speedup moved end-to-end wall time
   ~0% until the stages were fused).
2. Even fused as ``decode(score(chunk(batch)))``, ~40% of the
   remaining CPU was Arrow↔Python round-trips BETWEEN the sub-stages
   (``to_pylist`` of token/offset list columns, rebuilt per stage).
   This class therefore runs the kernels directly per row and builds
   Arrow exactly once, at the output.

Semantics are identical to the modular path (and to the sequential
oracle, ``gliner_ray/oracle.py``): word tokenize with char offsets
(``tokenizer.py:15-21``), overlap chunking with the deterministic
ownership rule, sparse scoring (FIXTURES.md §5), threshold + greedy
NMS decode (``decoder.py:31-128``), quarantine routing for failed
rows. This mirrors the reference control flow, which decodes right
after the forward pass inside one loop (``gliner/model.py:399-425``).

The modular stages remain available (``extract_mentions(fused=False)``)
for pipelines that checkpoint or branch between [A]/[B]/[C] — e.g. a
GPU scorer pool fed by CPU chunkers would deliberately un-fuse [B].
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.chunk import chunk_token_ranges
from ..kernels.decode import decode_candidates
from ..kernels.normalize import variants
from ..kernels.scoring import DeterministicScorerKernel
from ..kernels.tokenize import tokenize_batch_safe
from .decode_stage import MENTION_SCHEMA, QUARANTINE_LABEL, mention_owned_by_chunk


class FusedExtractor:
    """files batch (repo, path, commit, lang, content, bucket) →
    mentions batch (MENTION_SCHEMA). State (vocab index) built once
    per actor."""

    def __init__(self, cfg: PipelineConfig, scorer_cls=None,
                 scorer_kwargs: dict | None = None):
        self.cfg = cfg
        if scorer_cls is None or scorer_cls.__name__ == "DeterministicScorer":
            self.kernel = DeterministicScorerKernel(cfg.vocab, cfg.labels)
            self._scorer_stage = None
            # variants() is pure and mention surface forms repeat
            # heavily across a corpus (the distinct set is
            # vocabulary-scale, not mention-scale) — memoize per actor.
            # Bounded so a long-lived worker can't grow it unboundedly
            # (same guard as tokenize._WordHasher).
            self._variants_cache: dict[str, list[str]] = {}
        else:
            # non-default scorer backend: fall back to composing the
            # modular stages so the custom batch contract is honored
            from .decode_stage import make_decoder
            from .normalize import make_chunker

            self._chunk = make_chunker(cfg)
            self._scorer_stage = scorer_cls(cfg, **(scorer_kwargs or {}))
            self._decode = make_decoder(cfg)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self._scorer_stage is not None:
            return self._decode(self._scorer_stage(self._chunk(batch)))
        cfg, kernel, vcache = self.cfg, self.kernel, self._variants_cache
        cols: dict[str, list] = {name: [] for name in MENTION_SCHEMA.names}

        def emit(repo, path, commit, bucket, sha, start, end, ts, te, text, label, score, v0, v1):
            cols["repo"].append(repo)
            cols["path"].append(path)
            cols["commit"].append(commit)
            cols["bucket"].append(bucket)
            cols["doc_sha256"].append(sha)
            cols["start"].append(start)
            cols["end"].append(end)
            cols["tok_start"].append(ts)
            cols["tok_end"].append(te)
            cols["text"].append(text)
            cols["label"].append(label)
            cols["score"].append(score)
            cols["variant0"].append(v0)
            cols["variant1"].append(v1)

        contents = batch["content"].to_pylist()
        tokenized = tokenize_batch_safe(contents)  # one vectorized pass
        for repo, path, commit, bucket, content, tok in zip(
            batch["repo"].to_pylist(),
            batch["path"].to_pylist(),
            batch["commit"].to_pylist(),
            batch["bucket"].to_pylist(),
            contents,
            tokenized,
        ):
            if isinstance(tok, Exception):
                emit(repo, path, commit, bucket, "", -1, -1, -1, -1,
                     f"{type(tok).__name__}: {tok}"[:500], QUARANTINE_LABEL, 0.0, None, None)
                continue
            sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
            tokens, starts, ends = tok
            n = len(tokens)
            for cs, ce in chunk_token_ranges(n, cfg.max_len, cfg.chunk_overlap):
                cands = kernel.score_tokens(tokens[cs:ce], sha, tok_offset=cs)
                spans = decode_candidates(
                    cands, ce - cs,
                    flat_ner=cfg.flat_ner,
                    threshold=cfg.threshold,
                    multi_label=cfg.multi_label,
                )
                for s_rel, e_rel, label, score in spans:
                    te = cs + e_rel
                    if not mention_owned_by_chunk(cs, cfg.chunk_overlap, te):
                        continue
                    ts = cs + s_rel
                    start, end = starts[ts], ends[te]
                    text = content[start:end]
                    vs = vcache.get(text)
                    if vs is None:
                        if len(vcache) > 65536:
                            vcache.clear()
                        vs = vcache[text] = variants(text)
                    emit(repo, path, commit, bucket, sha, start, end, ts, te,
                         text, label, float(score),
                         vs[0] if vs else None, vs[1] if len(vs) > 1 else None)
        return pa.table(
            {name: pa.array(cols[name], type=MENTION_SCHEMA.field(name).type)
             for name in MENTION_SCHEMA.names}
        )
