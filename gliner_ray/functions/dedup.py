"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Ray-Data-first shapes (public MinHash/LSH and SimHash algorithms —
Broder 1997; Charikar 2002 — implemented from scratch):

- **exact**: sha256 content key added in a vectorized ``map_batches``,
  then ``groupby(key).map_groups(min doc_id)`` — one shuffle on a
  short hash key, never on the text itself.
- **MinHash-LSH**: per-batch vectorized shingle→minhash (numpy,
  one matrix per batch), explode to ``(band_id, band_hash, doc_id)``
  rows, ``groupby`` the band buckets, emit candidate pairs per bucket,
  verify with exact n-gram Jaccard, then connected components over
  verified pairs (driver union-find on the — small — pair set; the
  distributed min-label propagation in ``stages/linker.py`` is the
  scale path and shares the same semantics).
- **SimHash**: 64-bit signature per doc; near-dup candidates = equal
  band keys (4×16-bit bands → Hamming distance ≤ 3 guaranteed
  recall); verified by true Hamming distance.
"""

from __future__ import annotations

import hashlib
import re
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from ..kernels.linking import UnionFind

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

_WORD_RE = re.compile(r"\w+")

# ---------------------------------------------------------------- exact


def add_sha_key(batch: pa.Table, text_col: str = "text") -> pa.Table:
    keys = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in batch[text_col].to_pylist()
    ]
    return batch.append_column("content_key", pa.array(keys, pa.string()))


def exact_dedup(
    ds: "ray.data.Dataset", id_col: str = "doc_id", text_col: str = "text"
) -> "ray.data.Dataset":
    """Keep the min-id row per distinct text. Returns (doc_id,) rows."""
    from ray.data.aggregate import Min

    keyed = ds.map_batches(
        lambda t: add_sha_key(t, text_col).select([id_col, "content_key"]),
        batch_format="pyarrow",
    )
    return (
        keyed.groupby("content_key")
        .aggregate(Min(id_col, alias_name=id_col))
        .drop_columns(["content_key"])
    )


# ------------------------------------------------------------- shingles


def word_ngrams(text: str, n: int = 3) -> set[str]:
    words = _WORD_RE.findall(text.lower())
    if len(words) < n:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i : i + n]) for i in range(len(words) - n + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ------------------------------------------------------------- MinHash

def _minhash_params(num_perm: int, seed: int = 1) -> tuple[np.ndarray, np.ndarray]:
    """Multiply-shift universal hash family (Dietzfelbinger et al.):
    h_i(x) = (a_i * x + b_i) mod 2^64 with odd a_i — wrapping uint64
    arithmetic, no bigint needed."""
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 62, size=num_perm).astype(np.uint64) * 2 + 1
    b = rng.randint(0, 1 << 62, size=num_perm).astype(np.uint64)
    return a, b


def _shingle_hashes(text: str, n: int = 3) -> np.ndarray:
    grams = word_ngrams(text, n)
    if not grams:
        return np.array([0], dtype=np.uint64)
    return np.array(
        [
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in sorted(grams)
        ],
        dtype=np.uint64,
    )


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, n: int = 3) -> np.ndarray:
    """num_perm minimum hash values (vectorized: one outer product per doc)."""
    hv = _shingle_hashes(text, n)
    # (P, S) matrix of permuted hashes (wrapping uint64); min over shingles
    with np.errstate(over="ignore"):
        ph = a[:, None] * hv[None, :] + b[:, None]
    return ph.min(axis=1).astype(np.uint64)


class MinHashStage:
    """Actor-pool stage: documents batch → (doc_id, band_id, band_hash)
    rows. Permutation params built once per actor."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3, seed: int = 1):
        assert num_perm % bands == 0
        self.a, self.b = _minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, band_hashes = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            sig = minhash_signature(text, self.a, self.b, self.ngram)
            for bi in range(self.bands):
                chunk = sig[bi * self.rows_per_band : (bi + 1) * self.rows_per_band]
                bh = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                doc_ids.append(doc_id)
                band_ids.append(bi)
                band_hashes.append(bh)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hashes, pa.string()),
            }
        )


def _bucket_pairs(group: "pa.Table") -> pa.Table:
    """Within one LSH bucket: emit candidate pairs (smaller id first)."""
    ids = sorted(group["doc_id"].to_pylist())
    left, right = [], []
    # pair every doc with the bucket minimum — enough to make the
    # bucket one connected component without quadratic pair blowup
    for d in ids[1:]:
        left.append(ids[0])
        right.append(d)
    return pa.table(
        {"id_a": pa.array(left, pa.int64()), "id_b": pa.array(right, pa.int64())}
    )


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    concurrency: tuple | int = (1, 8),
) -> "ray.data.Dataset":
    """documents → distinct LSH candidate pairs (id_a < id_b)."""
    from ray.data.aggregate import Count

    bands_ds = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs={"num_perm": num_perm, "bands": bands, "ngram": ngram},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    pairs = bands_ds.groupby(["band_id", "band_hash"]).map_groups(
        _bucket_pairs, batch_format="pyarrow"
    )
    return pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="n")).drop_columns(["n"])


def verify_and_cluster(
    pairs: list[tuple[int, int]],
    texts_by_id: dict[int, str],
    threshold: float = 0.8,
    ngram: int = 3,
) -> dict[int, int]:
    """Exact n-gram Jaccard verification + union-find clustering.

    Returns doc_id → cluster representative (min doc_id). Driver-side:
    the verified-pair set is many orders of magnitude smaller than the
    corpus; at cluster scale the verification joins text via a
    broadcast/shuffle and components run through the distributed
    min-label propagation (stages/linker.py).
    """
    uf = UnionFind()
    for a, b in pairs:
        ja = jaccard(word_ngrams(texts_by_id[a], ngram), word_ngrams(texts_by_id[b], ngram))
        if ja >= threshold:
            uf.union(str(a), str(b))
    out: dict[int, int] = {}
    comp_min: dict[str, int] = {}
    for k in uf.parent:
        root = uf.find(k)
        comp_min[root] = min(comp_min.get(root, 1 << 62), int(k))
    for k in uf.parent:
        out[int(k)] = comp_min[uf.find(k)]
    return out


def minhash_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
) -> pa.Table:
    """Full near-dup pipeline. Returns (doc_id, cluster_id) for docs in
    a near-dup cluster of size ≥ 2 (cluster_id = min member id)."""
    pairs_ds = minhash_candidate_pairs(ds, num_perm, bands, ngram)
    pairs = [(r["id_a"], r["id_b"]) for r in pairs_ds.take_all()]
    if not pairs:
        return pa.table({"doc_id": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())})
    needed = {i for p in pairs for i in p}
    needed_arr = pa.array(sorted(needed), pa.int64())
    import pyarrow.compute as pc

    texts = ds.map_batches(
        lambda t: t.filter(pc.is_in(t["doc_id"], value_set=needed_arr)).select(
            ["doc_id", "text"]
        ),
        batch_format="pyarrow",
    ).take_all()
    texts_by_id = {r["doc_id"]: r["text"] for r in texts}
    clusters = verify_and_cluster(pairs, texts_by_id, threshold, ngram)
    items = sorted((d, c) for d, c in clusters.items())
    return pa.table(
        {
            "doc_id": pa.array([d for d, _ in items], pa.int64()),
            "cluster_id": pa.array([c for _, c in items], pa.int64()),
        }
    )


# ------------------------------------------------------------- SimHash


def simhash64(text: str, ngram: int = 2) -> int:
    """64-bit SimHash over word n-gram features (Charikar 2002)."""
    grams = word_ngrams(text, ngram)
    if not grams:
        return 0
    acc = np.zeros(64, dtype=np.int64)
    for g in grams:
        h = int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
        # h can exceed int64 — extract bits with Python-int shifts
        bits = np.frombuffer(
            bytes((h >> (8 * i)) & 0xFF for i in range(8)), dtype=np.uint8
        )
        bits = np.unpackbits(bits, bitorder="little").astype(np.int64)
        acc += 2 * bits - 1
    return int("".join("1" if v > 0 else "0" for v in acc[::-1]), 2)


def simhash_batch(batch: pa.Table, ngram: int = 2) -> pa.Table:
    sigs = [simhash64(t, ngram) for t in batch["text"].to_pylist()]
    return pa.table(
        {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.uint64())}
    )


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def simhash_near_dups(
    ds: "ray.data.Dataset", max_hamming: int = 3, ngram: int = 2
) -> pa.Table:
    """Banded SimHash near-dup detection: 4 bands × 16 bits — two docs
    within Hamming distance 3 share at least one exact band. Returns
    verified (id_a, id_b, hamming) pairs."""
    sigs_ds = ds.map_batches(
        lambda t: simhash_batch(t, ngram), batch_format="pyarrow"
    )

    def explode_bands(batch: pa.Table) -> pa.Table:
        doc_ids, band_ids, keys = [], [], []
        for doc_id, sig in zip(batch["doc_id"].to_pylist(), batch["simhash"].to_pylist()):
            for bi in range(4):
                doc_ids.append(doc_id)
                band_ids.append(bi)
                keys.append((sig >> (16 * bi)) & 0xFFFF)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_key": pa.array(keys, pa.int32()),
            }
        )

    pairs = (
        sigs_ds.map_batches(explode_bands, batch_format="pyarrow")
        .groupby(["band_id", "band_key"])
        .map_groups(_bucket_pairs, batch_format="pyarrow")
    )
    cand = {(r["id_a"], r["id_b"]) for r in pairs.take_all()}
    if not cand:
        return pa.table(
            {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
             "hamming": pa.array([], pa.int32())}
        )
    sig_by_id = {r["doc_id"]: r["simhash"] for r in sigs_ds.take_all()}
    out = sorted(
        (a, b, hamming64(sig_by_id[a], sig_by_id[b]))
        for a, b in cand
        if hamming64(sig_by_id[a], sig_by_id[b]) <= max_hamming
    )
    return pa.table(
        {
            "id_a": pa.array([a for a, _, _ in out], pa.int64()),
            "id_b": pa.array([b for _, b, _ in out], pa.int64()),
            "hamming": pa.array([h for _, _, h in out], pa.int32()),
        }
    )


# ---------------------------------------------------- embedding cosine


def embedding_near_dups(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Embedding-cosine near-dup pairs via blocked matmul.

    Each batch computes its normalized matrix once; the full pairwise
    comparison streams block×block through the driver accumulating only
    pairs ≥ threshold (at cluster scale the outer loop becomes a
    block-broadcast join; the per-block kernel is identical).
    """
    blocks: list[tuple[np.ndarray, np.ndarray]] = []
    for b in ds.select_columns([id_col, emb_col]).iter_batches(
        batch_size=4096, batch_format="pyarrow"
    ):
        ids = b[id_col].to_numpy()
        mat = np.asarray(b[emb_col].to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(mat, axis=1, keepdims=True)
        mat = mat / np.maximum(norms, 1e-12)
        blocks.append((ids, mat))
    ia, ib, cos = [], [], []
    for x in range(len(blocks)):
        ids_x, mx = blocks[x]
        for y in range(x, len(blocks)):
            ids_y, my = blocks[y]
            sims = mx @ my.T
            xi, yi = np.nonzero(sims >= threshold)
            for i, j in zip(xi.tolist(), yi.tolist()):
                a, b_ = int(ids_x[i]), int(ids_y[j])
                if a < b_:
                    ia.append(a); ib.append(b_); cos.append(float(sims[i, j]))
    order = np.argsort(np.array(ia) * (1 << 32) + np.array(ib)) if ia else []
    return pa.table(
        {
            "id_a": pa.array([ia[i] for i in order], pa.int64()),
            "id_b": pa.array([ib[i] for i in order], pa.int64()),
            "cosine": pa.array([cos[i] for i in order], pa.float64()),
        }
    )
