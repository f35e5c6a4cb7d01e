"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Generates the ``files`` input table — exactly the BASELINE.json
``input_hint`` shape ``(repo, path, commit, lang, content)`` — with
planted entities from the FIXTURES vocabulary, a skewed repo-size
distribution (a few mega-repos with ~100× the median file count, to
exercise repartitioning), and a long-document tail exceeding the
scorer's ``max_len`` (to exercise chunking parity). Seeded, no
wall-clock, no external data.

Golden outputs are NOT produced here: ``oracle.py`` computes them by
running the same kernels single-threaded, so the e2e comparison is
pure reference-semantics parity (distributed == sequential).
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from .kernels.scoring import ENTITY_VOCAB
from .kernels.tokenize import tokenize_with_offsets

_LANG_BY_EXT = {
    ".py": "python",
    ".java": "java",
    ".go": "go",
    ".rs": "rust",
    ".md": "markdown",
    ".txt": "text",
}
_EXTS = list(_LANG_BY_EXT)
_SYMBOL_FILLERS = ["(", ")", "{", "}", ";", ":"]

_SYLLABLES = [
    "ba", "ce", "di", "fo", "gu", "ha", "ki", "lo", "mu", "ne",
    "po", "qua", "ri", "so", "tu", "ve", "wi", "xo", "yu", "ze",
]


def _filler_words(n: int = 400) -> list[str]:
    """Deterministic filler vocabulary disjoint from entity-surface tokens."""
    entity_tokens: set[str] = set()
    for surface, _ in ENTITY_VOCAB:
        toks, _, _ = tokenize_with_offsets(surface)
        entity_tokens.update(t.lower() for t in toks)
    words: list[str] = []
    i = 0
    while len(words) < n:
        a = _SYLLABLES[i % 20]
        b = _SYLLABLES[(i // 20) % 20]
        c = _SYLLABLES[(i // 400) % 20]
        w = a + b + c
        if w not in entity_tokens:
            words.append(w)
        i += 1
    return words


def _commit_for(repo: str, path: str) -> str:
    return hashlib.sha256(f"{repo}/{path}".encode()).hexdigest()[:40]


def sha256_hex(text: str) -> str:
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


#: bump when the generator's output distribution changes — recorded in
#: the write_corpus _COMPLETE marker so stale caches regenerate
GEN_VERSION = 2

_GEN_CHUNK = 100_000


def _gen_chunk(args: tuple) -> tuple:
    """One deterministic chunk of files: per-file metadata draws +
    flat content assembly. Seeded by (seed, chunk index) so chunks are
    order-independent and parallelizable."""
    lo, n, n_repos, seed, long_tail = args
    rng = np.random.RandomState(
        int.from_bytes(
            hashlib.sha256(f"{seed}:{lo}".encode()).digest()[:4], "big"
        )
    )
    fillers = np.array(_filler_words(), dtype=object)
    surfaces = np.array([s for s, _ in ENTITY_VOCAB], dtype=object)
    symbols = np.array(_SYMBOL_FILLERS, dtype=object)

    repo_idx = rng.choice(n_repos, size=n, p=_repo_weights(n_repos))
    ext_idx = rng.randint(0, len(_EXTS), size=n)
    special = rng.rand(n) <= 0.1
    license_pick = rng.rand(n) > 0.5
    long_mask = (rng.rand(n) < 0.10) if long_tail else np.zeros(n, bool)
    n_words = np.where(
        long_mask,
        rng.randint(500, 3000, size=n),
        rng.randint(30, 380, size=n),
    )
    total = int(n_words.sum())
    r = rng.rand(total)
    pick_f = fillers[rng.randint(0, len(fillers), total)]
    pick_s = symbols[rng.randint(0, len(symbols), total)]
    pick_e = surfaces[rng.randint(0, len(surfaces), total)]
    bounds = np.cumsum(n_words)
    starts = np.concatenate([[0], bounds[:-1]])
    pos = np.arange(total) - np.repeat(starts, n_words)
    pieces = np.where(
        (r < 0.02) & (pos > 2), pick_e, np.where(r < 0.10, pick_s, pick_f)
    )
    # newline every ~14 pieces so content looks line-structured;
    # python-level pairwise join (np.char.add measured 4× slower)
    seps_l = np.where((pos + 1) % 14 == 0, "\n", " ").tolist()
    pieces_l = pieces.tolist()
    contents = [
        "".join(map("".join, zip(pieces_l[s:e], seps_l[s:e]))).rstrip()
        for s, e in zip(starts.tolist(), bounds.tolist())
    ]
    return repo_idx.tolist(), ext_idx.tolist(), special.tolist(), license_pick.tolist(), contents


def _repo_weights(n_repos: int) -> np.ndarray:
    weights = np.ones(n_repos)
    weights[: max(1, n_repos // 10)] = 100.0  # mega-repos
    return weights / weights.sum()


def generate_files(
    n_files: int = 200,
    n_repos: int = 20,
    seed: int = 42,
    long_tail: bool = True,
) -> pa.Table:
    """Build the ``files`` table. Repo sizes are skewed: the first
    ~10% of repos are "mega-repos" holding ~100× a median repo's
    weight.

    Fully vectorized in ~100k-file chunks: the v1 generator drew the
    weighted repo choice ONE FILE AT A TIME (`rng.choice(p=weights)`
    rebuilds the cumulative distribution per call → O(n_files ×
    n_repos); a 6.4M-file / 64k-repo corpus ran for 40+ minutes).
    All draws are now batched; only the per-file piece join remains a
    Python loop. Same distribution, different bit-stream (GEN_VERSION
    bumped)."""
    rng = np.random.RandomState(seed)  # path-collision suffixes only
    repo_names = np.array([f"org{i % 7}/proj{i}" for i in range(n_repos)], dtype=object)

    chunks = [
        (lo, min(_GEN_CHUNK, n_files - lo), n_repos, seed, long_tail)
        for lo in range(0, n_files, _GEN_CHUNK)
    ]
    if n_files >= 400_000:
        # chunks are independent (each derives its own RandomState from
        # (seed, chunk index)) → parallel generation for big corpora
        import multiprocessing as mp

        with mp.get_context("fork").Pool(min(16, len(chunks))) as pool:
            parts = pool.map(_gen_chunk, chunks)
    else:
        parts = [_gen_chunk(c) for c in chunks]

    repos, paths, commits, langs, contents = [], [], [], [], []
    seen_paths: set[tuple[str, str]] = set()
    for (lo, n, _, _, _), (repo_idx, ext_idx, special, license_pick, chunk_contents) in zip(
        chunks, parts
    ):
        for j in range(n):
            fi = lo + j
            repo = repo_names[repo_idx[j]]
            ext = _EXTS[ext_idx[j]]
            if special[j]:
                path = "LICENSE" if license_pick[j] else "README.md"
            else:
                path = f"src/mod_{fi}{ext}"
            if (repo, path) in seen_paths:
                path = f"src/mod_{fi}_{rng.randint(10_000)}{ext}"
            seen_paths.add((repo, path))
            repos.append(repo)
            paths.append(path)
            commits.append(_commit_for(repo, path))
            langs.append(_LANG_BY_EXT.get(os.path.splitext(path)[1], "text"))
            contents.append(chunk_contents[j])

    return pa.table(
        {
            "repo": pa.array(repos, pa.string()),
            "path": pa.array(paths, pa.string()),
            "commit": pa.array(commits, pa.string()),
            "lang": pa.array(langs, pa.string()),
            # large_string: a multi-GB corpus overflows 32-bit string
            # offsets in a single-chunk array
            "content": pa.array(contents, pa.large_string()),
        }
    )


def write_corpus(
    out_dir: str,
    n_files: int = 200,
    n_repos: int = 20,
    seed: int = 42,
    n_shards: int = 4,
    cluster_buckets: int = 64,
) -> str:
    """Write the corpus as BUCKET-CLUSTERED sharded Parquet: rows are
    grouped by ``sha1(repo) % cluster_buckets`` and each shard file
    holds whole buckets (filename ``part-b{first}-{last}.parquet``).

    This models the standard cluster-by-key ingest layout: a real
    100 TB corpus pays one bucketing repartition at ingest, after which
    every downstream read block is bucket-pure — the KG pipeline's
    partitioned checkpoint write then streams with no repartition, and
    resume prunes whole FILES (the bucket range is in the name).
    Unclustered inputs still work (the write just emits more files, or
    use ``read_files`` + an explicit ingest repartition).

    Idempotent cache: skips if ``_COMPLETE`` exists AND its recorded
    params match this call — a param mismatch regenerates instead of
    silently returning a stale corpus (round-1 ADVICE; matters for the
    shared scratch dirs used by the query layer).
    """
    os.makedirs(out_dir, exist_ok=True)
    marker = os.path.join(out_dir, "_COMPLETE")
    params = (
        f"n_files={n_files} n_repos={n_repos} seed={seed} "
        f"cluster_buckets={cluster_buckets} gen={GEN_VERSION}\n"
    )
    if os.path.exists(marker):
        with open(marker) as f:
            if f.read() == params:
                return out_dir
        # stale corpus with different params — wipe and regenerate
        for name in os.listdir(out_dir):
            p = os.path.join(out_dir, name)
            if os.path.isfile(p):
                os.remove(p)
    table = generate_files(n_files=n_files, n_repos=n_repos, seed=seed)
    buckets = np.array(
        [
            int.from_bytes(hashlib.sha1(r.encode()).digest()[:8], "big")
            % cluster_buckets
            for r in table["repo"].to_pylist()
        ]
    )
    # split bucket ids into n_shards contiguous ranges of whole buckets;
    # take per range (a single global take can overflow 32-bit string
    # offsets on multi-GB corpora)
    per_shard = max(1, (cluster_buckets + n_shards - 1) // n_shards)
    for lo in range(0, cluster_buckets, per_shard):
        hi = min(lo + per_shard - 1, cluster_buckets - 1)
        idx = np.nonzero((buckets >= lo) & (buckets <= hi))[0]
        if len(idx) == 0:
            continue
        shard = table.take(pa.array(idx))
        pq.write_table(
            shard, os.path.join(out_dir, f"part-b{lo:04d}-{hi:04d}.parquet")
        )
    with open(marker, "w") as f:
        f.write(params)
    return out_dir
