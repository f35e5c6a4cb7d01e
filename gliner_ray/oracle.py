"""Single-threaded reference-semantics oracle.

Runs the exact same kernels as the distributed pipeline — tokenize
(``tokenizer.py:15-21`` semantics), chunk, deterministic scorer
(FIXTURES.md §5 contract), sigmoid+NMS decode
(``decoder.py:31-128`` semantics), union-find entity linking, triple
rules — sequentially in plain Python. The e2e test compares the Ray
pipeline's mentions/triples against this oracle with the reference's
micro span-P/R protocol (``evaluator.py:52-121``); target P/R ≥ 0.95,
expected 1.0.
"""

from __future__ import annotations

from typing import Iterable

import pyarrow as pa

from .config import DEFAULT_CONFIG, PipelineConfig
from .corpus import sha256_hex
from .kernels.chunk import chunk_token_ranges
from .kernels.decode import decode_candidates
from .kernels.linking import link_variant_edges
from .kernels.normalize import variants
from .kernels.scoring import DeterministicScorerKernel
from .kernels.tokenize import tokenize_with_offsets


def oracle_mentions(
    files: pa.Table,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict]:
    """Mentions for a ``files`` table, sequentially. One dict per unique
    ``(doc_sha256, start, end, label)`` with char+token offsets."""
    from .stages.decode_stage import mention_owned_by_chunk

    scorer = DeterministicScorerKernel(cfg.vocab, cfg.labels)
    mentions: list[dict] = []
    for row in files.to_pylist():
        content = row["content"]
        doc_sha = sha256_hex(content)
        tokens, starts, ends = tokenize_with_offsets(content)
        for cs, ce in chunk_token_ranges(len(tokens), cfg.max_len, cfg.chunk_overlap):
            chunk_toks = tokens[cs:ce]
            cands = scorer.score_tokens(chunk_toks, doc_sha, tok_offset=cs)
            spans = decode_candidates(
                cands,
                n_tokens=len(chunk_toks),
                flat_ner=cfg.flat_ner,
                threshold=cfg.threshold,
                multi_label=cfg.multi_label,
            )
            for s_rel, e_rel, label, score in spans:
                ts, te = cs + s_rel, cs + e_rel
                # same chunk-ownership rule as the distributed decode
                # stage (stages/decode_stage.py) — no global dedup needed
                if not mention_owned_by_chunk(cs, cfg.chunk_overlap, te):
                    continue
                start, end = int(starts[ts]), int(ends[te])
                mentions.append(
                    {
                        "repo": row["repo"],
                        "path": row["path"],
                        "commit": row["commit"],
                        "doc_sha256": doc_sha,
                        "start": start,
                        "end": end,
                        "tok_start": ts,
                        "tok_end": te,
                        "text": content[start:end],
                        "label": label,
                        "score": float(score),
                    }
                )
    return mentions


def oracle_entity_map(mention_texts: Iterable[str]) -> dict[str, str]:
    """variant → canonical entity id over the full mention set."""
    edges: list[tuple[str, str]] = []
    for text in mention_texts:
        vs = variants(text)
        if not vs:
            continue
        if len(vs) == 1:
            edges.append((vs[0], vs[0]))
        else:
            for a, b in zip(vs, vs[1:]):
                edges.append((a, b))
    return link_variant_edges(edges)


def mention_entity_id(text: str, entity_map: dict[str, str]) -> str | None:
    vs = variants(text)
    return entity_map.get(vs[0]) if vs else None


def oracle_triples(
    files: pa.Table,
    mentions: list[dict] | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict]:
    """(subj, pred, obj, repo) triples — rule set of SURVEY.md §7 [E]:
    repo-contains-file, file-defines-entity, entity-typed-as."""
    if mentions is None:
        mentions = oracle_mentions(files, cfg)
    entity_map = oracle_entity_map(m["text"] for m in mentions)

    # dedup key includes repo (provenance per repo); score = max over
    # contributing mentions — mirrors the distributed groupby+Max stage
    triples: dict[tuple[str, str, str, str], dict] = {}

    def add(subj: str, pred: str, obj: str, repo: str, score: float = 1.0):
        key = (subj, pred, obj, repo)
        cur = triples.get(key)
        if cur is None or score > cur["score"]:
            triples[key] = {"subj": subj, "pred": pred, "obj": obj, "repo": repo, "score": score}

    for repo, path in zip(files["repo"].to_pylist(), files["path"].to_pylist()):
        add(repo, "repo-contains-file", f"{repo}/{path}", repo)
    for m in mentions:
        eid = mention_entity_id(m["text"], entity_map)
        if eid is None:
            continue
        add(f"{m['repo']}/{m['path']}", "file-defines-entity", eid, m["repo"], m["score"])
        add(eid, "entity-typed-as", m["label"], m["repo"], m["score"])
    return list(triples.values())
