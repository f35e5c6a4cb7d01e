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


def generate_files(
    n_files: int = 200,
    n_repos: int = 20,
    seed: int = 42,
    long_tail: bool = True,
) -> pa.Table:
    """Build the ``files`` table. Repo sizes are skewed: the first two
    repos are "mega-repos" holding ~100× a median repo's weight."""
    rng = np.random.RandomState(seed)
    fillers = _filler_words()
    surfaces = [s for s, _ in ENTITY_VOCAB]

    weights = np.ones(n_repos)
    weights[: max(1, n_repos // 10)] = 100.0  # mega-repos
    weights = weights / weights.sum()
    repo_names = [f"org{i % 7}/proj{i}" for i in range(n_repos)]

    repos, paths, commits, langs, contents = [], [], [], [], []
    seen_paths: set[tuple[str, str]] = set()
    for fi in range(n_files):
        repo = repo_names[rng.choice(n_repos, p=weights)]
        ext = _EXTS[rng.randint(len(_EXTS))]
        path = f"src/mod_{fi}{ext}" if rng.rand() > 0.1 else ("LICENSE" if rng.rand() > 0.5 else "README.md")
        if (repo, path) in seen_paths:
            path = f"src/mod_{fi}_{rng.randint(10_000)}{ext}"
        seen_paths.add((repo, path))

        # token length: mostly short, ~10% exceeding max_len=384 words
        if long_tail and rng.rand() < 0.10:
            n_words = int(rng.randint(500, 3000))
        else:
            n_words = int(rng.randint(30, 380))

        # vectorized piece selection (one rng batch per file, not per token)
        r = rng.rand(n_words)
        pick_f = np.array(fillers, dtype=object)[rng.randint(0, len(fillers), n_words)]
        pick_s = np.array(_SYMBOL_FILLERS, dtype=object)[
            rng.randint(0, len(_SYMBOL_FILLERS), n_words)
        ]
        pick_e = np.array(surfaces, dtype=object)[
            rng.randint(0, len(surfaces), n_words)
        ]
        pos = np.arange(n_words)
        pieces = np.where(
            (r < 0.02) & (pos > 2), pick_e, np.where(r < 0.10, pick_s, pick_f)
        )
        # newline every ~14 pieces so content looks line-structured
        seps = np.where((pos + 1) % 14 == 0, "\n", " ")
        content = "".join(
            p + s for p, s in zip(pieces.tolist(), seps.tolist())
        ).rstrip()

        repos.append(repo)
        paths.append(path)
        commits.append(_commit_for(repo, path))
        langs.append(_LANG_BY_EXT.get(os.path.splitext(path)[1], "text"))
        contents.append(content)

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
        f"cluster_buckets={cluster_buckets}\n"
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
