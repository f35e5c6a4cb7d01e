"""Stage [A] — normalize + sha256 + tokenize + chunk (stateless map_batches).

Input batch: ``files`` rows ``(repo, path, commit, lang, content)``
(+ ``bucket`` added at read time). Output: one row per chunk with the
token window, absolute char-offset arrays, and the chunk's text slice,
so downstream stages never need the full ``content`` again (long docs
stop being wide rows immediately after this stage).

Mirrors reference semantics: word tokenization with char offsets
(``gliner/model.py:164-190`` / ``tokenizer.py:15-21``); truncation at
``max_len`` (``processor.py:350-352``) is replaced by overlapped
chunking with a deterministic ownership rule applied in the decode
stage (see ``kernels/chunk.py``).

Per-row sha256(content) is the BASELINE.json row-level invariant,
carried through every downstream table.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.chunk import chunk_token_ranges
from ..kernels.tokenize import tokenize_with_offsets

CHUNK_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("bucket", pa.int32()),
        ("doc_sha256", pa.string()),
        ("n_doc_tokens", pa.int32()),
        ("chunk_id", pa.int32()),
        ("tok_offset", pa.int32()),
        ("tokens", pa.list_(pa.string())),
        ("char_starts", pa.list_(pa.int32())),
        ("char_ends", pa.list_(pa.int32())),
        ("chunk_text", pa.string()),
        ("chunk_char_start", pa.int32()),
    ]
)


def make_chunker(cfg: PipelineConfig):
    """Build the [A] map_batches function (closure over config only)."""

    max_len, overlap = cfg.max_len, cfg.chunk_overlap

    def chunk_batch(batch: pa.Table) -> pa.Table:
        cols: dict[str, list] = {name: [] for name in CHUNK_SCHEMA.names}
        repos = batch["repo"].to_pylist()
        paths = batch["path"].to_pylist()
        commits = batch["commit"].to_pylist()
        langs = batch["lang"].to_pylist()
        buckets = batch["bucket"].to_pylist()
        contents = batch["content"].to_pylist()
        for repo, path, commit, lang, bucket, content in zip(
            repos, paths, commits, langs, buckets, contents
        ):
            try:
                doc_sha = hashlib.sha256(content.encode("utf-8")).hexdigest()
                tokens, starts, ends = tokenize_with_offsets(content)
            except Exception as e:  # noqa: BLE001
                # never silently drop a row (the reference's
                # skip-on-error, dataset.py:75-77, loses data): emit a
                # QUARANTINE chunk (chunk_id = -1) that the decode
                # stage forwards to the quarantine rows of the mentions
                # checkpoint, preserving the row for inspection/rerun
                cols["repo"].append(repo)
                cols["path"].append(path)
                cols["commit"].append(commit)
                cols["lang"].append(lang)
                cols["bucket"].append(bucket)
                cols["doc_sha256"].append("")
                cols["n_doc_tokens"].append(0)
                cols["chunk_id"].append(-1)
                cols["tok_offset"].append(0)
                cols["tokens"].append([])
                cols["char_starts"].append([])
                cols["char_ends"].append([])
                cols["chunk_text"].append(f"{type(e).__name__}: {e}"[:500])
                cols["chunk_char_start"].append(0)
                continue
            n = len(tokens)
            for cid, (cs, ce) in enumerate(chunk_token_ranges(n, max_len, overlap)):
                ccs = starts[cs] if n else 0
                cce = ends[ce - 1] if ce > cs else ccs
                cols["repo"].append(repo)
                cols["path"].append(path)
                cols["commit"].append(commit)
                cols["lang"].append(lang)
                cols["bucket"].append(bucket)
                cols["doc_sha256"].append(doc_sha)
                cols["n_doc_tokens"].append(n)
                cols["chunk_id"].append(cid)
                cols["tok_offset"].append(cs)
                cols["tokens"].append(tokens[cs:ce])
                cols["char_starts"].append(starts[cs:ce])
                cols["char_ends"].append(ends[cs:ce])
                cols["chunk_text"].append(content[ccs:cce])
                cols["chunk_char_start"].append(ccs)
        return pa.table(
            {name: pa.array(cols[name], type=CHUNK_SCHEMA.field(name).type)
             for name in CHUNK_SCHEMA.names}
        )

    return chunk_batch


def repo_bucket(repo: str, n_buckets: int) -> int:
    """``sha1(repo) % n_buckets`` — stable across processes (never
    Python ``hash()``, which is salted per process)."""
    return int.from_bytes(hashlib.sha1(repo.encode()).digest()[:8], "big") % n_buckets


def add_bucket_column(batch: pa.Table, n_buckets: int) -> pa.Table:
    """``bucket = sha1(repo) % n_buckets``. Hash once per DISTINCT repo
    (batches hold ~100 files per repo), then broadcast through the
    dictionary CODES with one numpy gather — no per-row Python dict
    lookup (round-4 verdict item #6; per-row sha1 was already a
    measured stage cost at 1.6M files)."""
    import numpy as np
    import pyarrow.compute as pc

    enc = pc.dictionary_encode(batch["repo"].combine_chunks())
    by_code = np.fromiter(
        (repo_bucket(r, n_buckets) for r in enc.dictionary.to_pylist()),
        dtype=np.int32,
        count=len(enc.dictionary),
    )
    buckets = by_code[enc.indices.to_numpy(zero_copy_only=False)]
    return batch.append_column("bucket", pa.array(buckets, pa.int32()))
