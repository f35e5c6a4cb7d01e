"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram
Jaccard verification, embedding-cosine near-dup.

Ray-Data-first shapes (public MinHash/LSH and SimHash algorithms —
Broder 1997; Charikar 2002 — implemented from scratch):

- **exact**: sha256 content key added in a vectorized ``map_batches``,
  then ``groupby(key)`` min doc_id — one shuffle on a short hash key,
  never on the text itself.
- **MinHash-LSH**: per-batch vectorized shingle→minhash (numpy word
  hashes with a per-actor cache, polynomial n-gram combine, one
  permute-matrix min per doc, fully vectorized band hashes), explode to
  ``(band_id, band_hash, doc_id)`` rows, ``groupby`` the band buckets,
  emit candidate pairs per bucket, verify with exact n-gram Jaccard
  **distributed** (texts joined onto the pair table), then form
  clusters through the GUARDED dual-path components engine
  (``functions/graph.connected_components``): driver union-find under
  the edge-count guard, distributed min-label propagation above it —
  a dup-heavy corpus' O(corpus) edge set never has to fit the driver.
- **SimHash**: 64-bit signature per doc; candidates = equal band keys
  (4×16-bit bands → Hamming ≤ 3 guaranteed recall); verified by true
  Hamming distance computed inside ``map_batches`` after joining the
  signatures onto the candidate pairs (nothing corpus-sized on the
  driver).
- **embedding cosine**: random-hyperplane LSH (Charikar 2002) — L
  tables × k sign bits bucket the normalized vectors, within-bucket
  candidate pairs are verified by exact cosine after joining the
  embeddings onto the pair table. All-to-all driver matmuls are gone.
"""

from __future__ import annotations

import hashlib
import re
from typing import TYPE_CHECKING

import numpy as np
import pandas as pd
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
    ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    parts: int = 64,
) -> "ray.data.Dataset":
    """Keep the min-id row per distinct text. Returns (doc_id,) rows.

    Int-key-partition idiom (the engine's measured ~15× pattern vs a
    string-key groupby, see BASELINE.md / ``q_daily_active_users``):
    each batch hashes texts to 32-byte sha256 digests, COMBINES to the
    per-batch min id per digest (shuffle rows shrink to the batch's
    distinct set), and ships only ``(part, digest, id)`` where
    ``part = first-8-digest-bytes % parts`` — so the all-to-all
    exchange keys on a small int64, carries 32-byte binary digests
    instead of 64-char hex strings, and never moves the text. A digest
    lands in exactly one part, so per-part min-per-digest is globally
    exact."""

    def keyed(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        digests = [hashlib.sha256(x.encode("utf-8")).digest() for x in texts]
        if digests:
            hi = np.frombuffer(b"".join(d[:8] for d in digests), dtype=">u8")
            part = (hi % np.uint64(parts)).astype(np.int64)
        else:
            part = np.array([], dtype=np.int64)
        df = pd.DataFrame(
            {
                "part": part,
                "key": digests,
                id_col: t[id_col].to_numpy(zero_copy_only=False),
            }
        )
        # per-batch combiner: min id per digest before the shuffle
        df = df.groupby(["part", "key"], sort=False, as_index=False)[
            [id_col]
        ].min()
        return pa.table(
            {
                "part": pa.array(df["part"].to_numpy(), pa.int64()),
                "key": pa.array(df["key"].tolist(), pa.binary()),
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
            }
        )

    def per_part_min(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby("key", sort=False, as_index=False)[[id_col]].min()[
            [id_col]
        ]

    return (
        ds.map_batches(keyed, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part_min, batch_format="pandas")
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


# --------------------------------------------------- vectorized hashing

# odd multiplier for the polynomial n-gram combine (wrapping uint64)
_GRAM_B = np.uint64(0x9E3779B97F4A7C15)


class _WordHasher:
    """word → uint64 via blake2b, memoized — the per-shingle hashlib
    calls of the first version were the MinHash bench hot spot; vocab
    is tiny relative to total shingle volume so the cache turns hashing
    into dict lookups + numpy arithmetic. Capped so a long-lived worker
    process can't grow it unboundedly."""

    MAX_CACHE = 1_000_000

    def __init__(self):
        self._cache: dict[str, int] = {}

    def doc_word_hashes(self, text: str) -> np.ndarray:
        cache = self._cache
        if len(cache) > self.MAX_CACHE:
            cache.clear()
        out = []
        for w in _WORD_RE.findall(text.lower()):
            h = cache.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "big"
                )
                cache[w] = h
            out.append(h)
        return np.array(out, dtype=np.uint64)


#: process-global cache — stateless map_batches TASKS reuse Ray's
#: long-lived worker processes, so a module singleton gives the same
#: memoization as per-actor state without actor-pool spin-up cost
#: (measured: pool spin-up 1.8 s vs 0.7 s task path on a 5k-doc job)
_SHARED_HASHER = _WordHasher()


def _gram_hashes_from_words(wh: np.ndarray, n: int) -> np.ndarray:
    """uint64 hash per word n-gram: polynomial combine of the word
    hashes (wrapping arithmetic), deduplicated. len < n → one hash of
    what's there (mirrors word_ngrams's short-doc rule)."""
    if wh.size == 0:
        return np.array([0], dtype=np.uint64)
    m = min(n, wh.size)
    with np.errstate(over="ignore"):
        acc = wh[: wh.size - m + 1].copy()
        for j in range(1, m):
            acc = acc * _GRAM_B + wh[j : wh.size - m + 1 + j]
    return np.unique(acc)


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
    return _gram_hashes_from_words(_WordHasher().doc_word_hashes(text), n)


def minhash_signature(text: str, a: np.ndarray, b: np.ndarray, n: int = 3) -> np.ndarray:
    """num_perm minimum hash values (vectorized: one outer product per doc)."""
    hv = _shingle_hashes(text, n)
    # (P, S) matrix of permuted hashes (wrapping uint64); min over shingles
    with np.errstate(over="ignore"):
        ph = a[:, None] * hv[None, :] + b[:, None]
    return ph.min(axis=1).astype(np.uint64)


class MinHashStage:
    """Batch kernel: documents batch → (doc_id, band_id, band_hash)
    rows. Runs as stateless map_batches TASKS (constructor cost is two
    tiny RNG draws; the word-hash cache is the process-global
    ``_SHARED_HASHER``, which long-lived Ray workers keep warm across
    tasks) — an actor pool's spin-up cost bought nothing here. Band
    hashes are one vectorized polynomial reduce over the whole batch's
    signature matrix."""

    def __init__(self, num_perm: int = 64, bands: int = 16, ngram: int = 3, seed: int = 1):
        if num_perm % bands != 0:
            raise ValueError("num_perm must be a multiple of bands")
        self.a, self.b = _minhash_params(num_perm, seed)
        self.bands = bands
        self.rows_per_band = num_perm // bands
        self.ngram = ngram
        self.hasher = _SHARED_HASHER
        with np.errstate(over="ignore"):
            self._band_pows = _GRAM_B ** np.arange(self.rows_per_band, dtype=np.uint64)

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        sig_mat = np.empty((n_docs, self.a.size), dtype=np.uint64)
        for i, text in enumerate(batch["text"].to_pylist()):
            hv = _gram_hashes_from_words(self.hasher.doc_word_hashes(text), self.ngram)
            with np.errstate(over="ignore"):
                sig_mat[i] = (self.a[:, None] * hv[None, :] + self.b[:, None]).min(axis=1)
        with np.errstate(over="ignore"):
            band_hash = (
                sig_mat.reshape(n_docs, self.bands, self.rows_per_band)
                * self._band_pows[None, None, :]
            ).sum(axis=2, dtype=np.uint64)
        doc_ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), self.bands)
        band_ids = np.tile(np.arange(self.bands, dtype=np.int32), n_docs)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_hash": pa.array(band_hash.reshape(-1), pa.uint64()),
            }
        )


def _bucket_pairs_ids(
    raw_ids: np.ndarray, all_pairs_cap: int | None = 32
) -> tuple[np.ndarray, np.ndarray]:
    """Within one LSH bucket: candidate pair id arrays (smaller id
    first).

    Buckets up to ``all_pairs_cap`` members emit ALL within-bucket pairs
    so one spurious band collision can't hide a genuine pair behind a
    failed bucket-min verification (ADVICE.md round 1). Larger buckets
    fall back to star pairing against the bucket minimum plus a
    consecutive chain — linear in bucket size, and the chain keeps the
    bucket one component even if the minimum is the spurious member.
    ``all_pairs_cap=None`` = no cap (SemDeDup blocking, where ALL
    within-cluster pairs are the operator's contract and the caller
    bounds cluster size instead).
    """
    ids = np.unique(np.asarray(raw_ids))
    k = ids.size
    empty = np.array([], dtype=np.int64)
    if k < 2:
        return empty, empty
    if all_pairs_cap is None or k <= all_pairs_cap:
        ii, jj = np.triu_indices(k, 1)
        return ids[ii], ids[jj]
    left = np.concatenate([np.full(k - 1, ids[0]), ids[1:-1]])
    right = np.concatenate([ids[1:], ids[2:]])
    return left, right


def _bucket_pairs(group: "pa.Table", all_pairs_cap: int = 32) -> pa.Table:
    """Arrow-table wrapper of :func:`_bucket_pairs_ids` for
    ``map_groups`` over exact (band_id, key) groups."""
    left, right = _bucket_pairs_ids(
        group["doc_id"].to_numpy(zero_copy_only=False), all_pairs_cap
    )
    return pa.table(
        {"id_a": pa.array(left, pa.int64()), "id_b": pa.array(right, pa.int64())}
    )


def minhash_candidate_pairs(
    ds: "ray.data.Dataset",
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    concurrency: tuple | int | None = None,
    distinct: bool = True,
) -> "ray.data.Dataset":
    """documents → LSH candidate pairs (id_a < id_b). ``distinct=True``
    adds an aggregate round-trip to drop band duplicates; callers that
    feed the pairs into ``join_attr_onto_pairs`` should instead pass
    ``distinct=False`` there with ``dedup_pairs=True`` (the per-part
    merge dedups for free, one less shuffle). ``concurrency=None``
    (default) → stateless tasks; pass a pool size for a long job where
    per-actor state amortizes. The band-duplicate drop runs on a
    bounded ``hash(pair) % P`` part key (per-part vectorized
    drop_duplicates) — a raw pair-keyed ``.aggregate()`` pays Ray
    2.49's ~1–2 ms PER GROUP reduce cost at candidate-pair
    cardinality (BASELINE.md round-5 cliff note)."""
    kwargs = {"num_perm": num_perm, "bands": bands, "ngram": ngram}
    if concurrency is None:
        bands_ds = ds.map_batches(
            lambda t: MinHashStage(**kwargs)(t),
            batch_format="pyarrow",
            batch_size=1024,
        )
    else:
        bands_ds = ds.map_batches(
            MinHashStage,
            fn_constructor_kwargs=kwargs,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    pairs = _grouped_bucket_pairs(bands_ds)
    if not distinct:
        return pairs
    P = 16

    def _pair_part(t: pa.Table) -> pa.Table:
        a = t["id_a"].to_numpy(zero_copy_only=False).astype(np.uint64)
        b = t["id_b"].to_numpy(zero_copy_only=False).astype(np.uint64)
        part = ((a * np.uint64(2654435761) + b) % np.uint64(P)).astype(np.int64)
        return pa.table(
            {"part": pa.array(part, pa.int64()), "id_a": t["id_a"], "id_b": t["id_b"]}
        )

    def _pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["id_a", "id_b"]].drop_duplicates(ignore_index=True)

    return (
        pairs.map_batches(_pair_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_pair_dedup, batch_format="pandas")
    )


def _grouped_bucket_pairs(
    bands_ds: "ray.data.Dataset",
    num_partitions: int = 16,
    key_col: str = "band_hash",
    all_pairs_cap: int | None = 32,
) -> "ray.data.Dataset":
    """(doc_id, band_id, band_hash) rows → candidate pairs.

    Shuffle on ``part = band_hash % P`` (one small int; a band's bucket
    is fully determined by (band_id, band_hash), so every bucket lands
    in one part) instead of grouping on the raw two-column key — the
    measured-15×-cheaper coarse-partition pattern. Inside each part,
    singleton buckets (the overwhelming majority) are dropped with one
    vectorized ``duplicated`` mask before the per-bucket pair emission,
    and the preceding ``map_batches`` coalesces blocks so the sort sees
    a few fat blocks, not one per upstream actor batch."""

    def add_part(t: pa.Table) -> pa.Table:
        h = t[key_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        return t.append_column(
            "part", pa.array((h % np.uint64(num_partitions)).astype(np.int32), pa.int32())
        )

    def part_pairs(df) -> pa.Table:
        dup = df[df.duplicated(["band_id", key_col], keep=False)]
        if not len(dup):
            return pa.table(
                {"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64())}
            )
        outs = [
            _bucket_pairs_ids(g["doc_id"].to_numpy(), all_pairs_cap)
            for _, g in dup.groupby(["band_id", key_col], sort=False)
        ]
        left = np.concatenate([o[0] for o in outs])
        right = np.concatenate([o[1] for o in outs])
        return pa.table(
            {"id_a": pa.array(left, pa.int64()), "id_b": pa.array(right, pa.int64())}
        )

    return (
        bands_ds.map_batches(add_part, batch_format="pyarrow", batch_size=131072)
        .groupby("part")
        .map_groups(part_pairs, batch_format="pandas")
    )


def _attach_attr(
    pairs: "ray.data.Dataset",
    pair_fields: list,
    attrs: "ray.data.Dataset",
    attr_col: str,
    attr_type: "pa.DataType",
    id_col: str,
    side: str,
    num_partitions: int,
    dedup_pairs: bool = False,
) -> "ray.data.Dataset":
    """Hash-partitioned equi-join of one attribute onto the pair table:
    both sides get ``part = id_<side> % P``, are unioned with a tag
    column, and merged per-part with a vectorized pandas join inside
    ``groupby("part").map_groups``.

    This deliberately avoids ``Dataset.join``: Ray 2.49's sort-based
    ``Aggregate``/``map_groups`` emit schema-less (zero-column) empty
    blocks for empty partitions, which crash pyarrow's join kernel
    ("No match ... FieldRef") when they reach a hash-join input —
    map/groupby stages tolerate them, so the union+groupby shape is
    robust AND reuses the measured-15×-faster int-partition pattern
    from ``stages/triples``.

    ``dedup_pairs=True`` also drops duplicate (id_a, id_b) rows inside
    the per-part merge — correct as a GLOBAL distinct because ``part``
    is a function of id_a alone, so every copy of a pair lands in the
    same part. Fold the band-dedup in here instead of a separate
    ``Aggregate`` round-trip.
    """
    key_col = f"id_{side}"
    out_col = f"{attr_col}_{side}"
    pair_names = [f.name for f in pair_fields]
    union_schema = pa.schema(
        [pa.field("part", pa.int64()), pa.field("key", pa.int64()),
         pa.field("is_attr", pa.int8())]
        + list(pair_fields)
        + [pa.field("__attr", attr_type)]
    )
    out_schema = pa.schema(list(pair_fields) + [pa.field(out_col, attr_type)])
    P = num_partitions

    def tag_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or key_col not in t.column_names:
            return union_schema.empty_table()
        keys = t[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "part": pa.array(keys % P, pa.int64()),
            "key": pa.array(keys, pa.int64()),
            "is_attr": pa.array(np.zeros(len(keys), np.int8), pa.int8()),
        }
        for f in pair_fields:
            cols[f.name] = t[f.name].cast(f.type) if f.name in t.column_names else pa.nulls(len(keys), f.type)
        cols["__attr"] = pa.nulls(len(keys), attr_type)
        return pa.table(cols, schema=union_schema)

    def tag_attrs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0 or attr_col not in t.column_names:
            return union_schema.empty_table()
        keys = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        cols = {
            "part": pa.array(keys % P, pa.int64()),
            "key": pa.array(keys, pa.int64()),
            "is_attr": pa.array(np.ones(len(keys), np.int8), pa.int8()),
        }
        for f in pair_fields:
            cols[f.name] = pa.nulls(len(keys), f.type)
        cols["__attr"] = t[attr_col].cast(attr_type)
        return pa.table(cols, schema=union_schema)

    def merge(group: pa.Table) -> pa.Table:
        if group.num_rows == 0 or "is_attr" not in group.column_names:
            return out_schema.empty_table()
        df = group.to_pandas()
        is_attr = df["is_attr"].to_numpy() == 1
        attr_df = df.loc[is_attr, ["key", "__attr"]].rename(columns={"__attr": out_col})
        pair_df = df.loc[~is_attr, ["key"] + pair_names]
        if dedup_pairs:
            pair_df = pair_df.drop_duplicates(subset=["id_a", "id_b"])
        m = pair_df.merge(attr_df, on="key", how="inner")
        cols = {}
        for f in pair_fields:
            arr = m[f.name].to_numpy()
            cols[f.name] = pa.array(arr, f.type) if len(arr) else pa.nulls(0, f.type)
        v = m[out_col].tolist()
        cols[out_col] = pa.array(v, attr_type)
        return pa.table(cols, schema=out_schema)

    # batch_size coalesces the many tiny upstream blocks into a few fat
    # ones BEFORE the sort shuffle — block count, not bytes, drives the
    # groupby cost here (measured round 1)
    unioned = pairs.map_batches(
        tag_pairs, batch_format="pyarrow", batch_size=131072
    ).union(attrs.map_batches(tag_attrs, batch_format="pyarrow", batch_size=131072))
    return unioned.groupby("part").map_groups(merge, batch_format="pyarrow")


def join_attr_onto_pairs(
    pairs: "ray.data.Dataset",
    attrs: "ray.data.Dataset",
    attr_col: str,
    id_col: str = "doc_id",
    num_partitions: int = 8,
    dedup_pairs: bool = False,
) -> "ray.data.Dataset":
    """(id_a, id_b) ⋈ attrs twice → adds ``{attr_col}_a`` and
    ``{attr_col}_b``. The distributed alternative to fetching every
    row's attribute into a driver dict; see ``_attach_attr`` for the
    shuffle shape and why it avoids ``Dataset.join``."""
    attrs_schema = attrs.schema()
    attr_type = dict(zip(attrs_schema.names, attrs_schema.types))[attr_col]
    base = [pa.field("id_a", pa.int64()), pa.field("id_b", pa.int64())]
    out = _attach_attr(
        pairs, base, attrs, attr_col, attr_type, id_col, "a",
        num_partitions, dedup_pairs=dedup_pairs,
    )
    base_a = base + [pa.field(f"{attr_col}_a", attr_type)]
    return _attach_attr(
        out, base_a, attrs, attr_col, attr_type, id_col, "b", num_partitions
    )


def verify_and_cluster(
    pairs: list[tuple[int, int]],
    texts_by_id: dict[int, str],
    threshold: float = 0.8,
    ngram: int = 3,
) -> dict[int, int]:
    """Exact n-gram Jaccard verification + union-find clustering
    (sequential kernel — the distributed path in ``minhash_dedup`` is
    the production shape; this stays as the small-input oracle).

    Returns doc_id → cluster representative (min doc_id)."""
    verified = [
        (a, b)
        for a, b in pairs
        if jaccard(word_ngrams(texts_by_id[a], ngram), word_ngrams(texts_by_id[b], ngram))
        >= threshold
    ]
    return _cluster_edges(verified)


def _cluster_edges(edges: list[tuple[int, int]]) -> dict[int, int]:
    uf = UnionFind()
    for a, b in edges:
        uf.union(str(a), str(b))
    comp_min: dict[str, int] = {}
    for k in uf.parent:
        root = uf.find(k)
        comp_min[root] = min(comp_min.get(root, 1 << 62), int(k))
    return {int(k): comp_min[uf.find(k)] for k in uf.parent}


def _jaccard_verify_batch(batch: pa.Table, threshold: float, ngram: int) -> pa.Table:
    """(id_a, id_b, text_a, text_b) → verified pairs. Per-pair set ops
    ARE the work; everything around them is vectorized."""
    keep_a, keep_b = [], []
    for a, b, ta, tb in zip(
        batch["id_a"].to_pylist(),
        batch["id_b"].to_pylist(),
        batch["text_a"].to_pylist(),
        batch["text_b"].to_pylist(),
    ):
        if jaccard(word_ngrams(ta, ngram), word_ngrams(tb, ngram)) >= threshold:
            keep_a.append(a)
            keep_b.append(b)
    return pa.table(
        {"id_a": pa.array(keep_a, pa.int64()), "id_b": pa.array(keep_b, pa.int64())}
    )


def _collect_pairs_if_small(
    pairs_ds: "ray.data.Dataset", limit: int
) -> tuple[list[tuple[int, int]] | None, "ray.data.Dataset"]:
    """Materialize the candidate pair table and, iff its row count is
    within ``limit``, return the distinct sorted pair list (else None).
    The pair table is OUTPUT-sized — broadcasting it under a count
    guard is the legitimate small-side fast path; above the guard the
    callers fall through to the fully distributed join."""
    mat = pairs_ds.materialize()
    if mat.count() > limit:
        return None, mat
    rows = mat.take_all()
    return sorted({(r["id_a"], r["id_b"]) for r in rows}), mat


def _fetch_rows_for_ids(
    ds: "ray.data.Dataset", id_col: str, cols: list[str], needed: set[int]
) -> list[dict]:
    """One column-pruned streaming pass that keeps only ``needed`` ids —
    result size is bounded by ``len(needed)`` (≤ 2× the guarded pair
    count), never corpus-sized."""
    import pyarrow.compute as pc

    needed_arr = pa.array(sorted(needed), pa.int64())
    return ds.map_batches(
        lambda t: t.filter(pc.is_in(t[id_col], value_set=needed_arr)).select(cols),
        batch_format="pyarrow",
    ).take_all()


def _verify_pairs_adaptive(
    ds: "ray.data.Dataset",
    pairs_ds: "ray.data.Dataset",
    threshold: float,
    ngram: int,
    pair_broadcast_limit: int,
) -> "ray.data.Dataset":
    """Candidate pairs → Jaccard-verified (id_a, id_b) edge Dataset
    (shared by the MinHash and anchor-gram dedup pipelines).

    Adaptive: when the candidate pair table fits the count guard, the
    needed texts (bounded by 2× the pair count) are broadcast via
    ``ray.put`` and Jaccard-verified in one ``map_batches`` over the
    pair table — no extra shuffle. Above the guard, texts are joined
    onto the pairs with the hash-partitioned union merge and verified
    distributed. Either way the verified edges stay a DATASET — cluster
    formation downstream (:func:`_clusters_table`) is itself guarded,
    so a dup-heavy corpus whose edge set is corpus-sized never has to
    fit on the driver.
    """
    import ray
    import ray.data as rd

    small, mat = _collect_pairs_if_small(pairs_ds, pair_broadcast_limit)
    if small is not None:
        if not small:
            return rd.from_arrow(
                pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
            )
        else:
            needed = {i for p in small for i in p}
            texts = _fetch_rows_for_ids(
                ds.select_columns(["doc_id", "text"]), "doc_id",
                ["doc_id", "text"], needed,
            )
            texts_ref = ray.put({r["doc_id"]: r["text"] for r in texts})
            pair_tbl = pa.table(
                {
                    "id_a": pa.array([a for a, _ in small], pa.int64()),
                    "id_b": pa.array([b for _, b in small], pa.int64()),
                }
            )

            def verify_bcast(t: pa.Table) -> pa.Table:
                by_id = ray.get(texts_ref)
                keep_a, keep_b = [], []
                for a, b in zip(t["id_a"].to_pylist(), t["id_b"].to_pylist()):
                    if (
                        jaccard(
                            word_ngrams(by_id[a], ngram),
                            word_ngrams(by_id[b], ngram),
                        )
                        >= threshold
                    ):
                        keep_a.append(a)
                        keep_b.append(b)
                return pa.table(
                    {"id_a": pa.array(keep_a, pa.int64()),
                     "id_b": pa.array(keep_b, pa.int64())}
                )

            verified = rd.from_arrow(pair_tbl).map_batches(
                verify_bcast, batch_format="pyarrow", batch_size=4096
            )
    else:
        with_texts = join_attr_onto_pairs(
            mat, ds.select_columns(["doc_id", "text"]), "text", dedup_pairs=True
        )
        verified = with_texts.map_batches(
            lambda t: _jaccard_verify_batch(t, threshold, ngram),
            batch_format="pyarrow",
        )
    return verified


# Driver-collect guard for the (doc_id, cluster_id) result: on a
# dup-heavy corpus cluster membership is corpus-row-scale, so the
# pa.Table convenience APIs refuse to collect past this many rows
# (round-3 verdict item #2) — ask for the Dataset instead.
CLUSTER_COLLECT_LIMIT = 5_000_000


def _clusters_dataset(
    edges_ds: "ray.data.Dataset",
    cc_broadcast_limit: int | None = None,
    force_distributed: bool = False,
) -> "ray.data.Dataset":
    """Verified edge Dataset → streaming (doc_id, cluster_id) Dataset,
    cluster_id = min member id, one row per doc in a cluster of size
    ≥ 2. Never materializes on the driver — on a dup-heavy 100-TB
    corpus the membership table is corpus-row-scale.

    Routed through the GUARDED dual-path components engine
    (``functions/graph.connected_components``): under the edge-count
    guard the edges union-find on the driver; above it (a dup-heavy
    corpus can have O(corpus) edges) they min-label-propagate fully
    distributed — round-2 verdict item #3."""
    from .graph import CC_BROADCAST_LIMIT, connected_components

    comp = connected_components(
        edges_ds,
        src="id_a",
        dst="id_b",
        broadcast_limit=(
            CC_BROADCAST_LIMIT if cc_broadcast_limit is None else cc_broadcast_limit
        ),
        force_distributed=force_distributed,
    )

    def rename(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t["node"].cast(pa.int64(), safe=False),
                "cluster_id": t["component"].cast(pa.int64(), safe=False),
            }
        )

    return comp.map_batches(rename, batch_format="pyarrow")


def _clusters_table(
    edges_ds: "ray.data.Dataset",
    cc_broadcast_limit: int | None = None,
    force_distributed: bool = False,
    collect_limit: int = CLUSTER_COLLECT_LIMIT,
) -> pa.Table:
    """:func:`_clusters_dataset` collected to a ``pa.Table`` (sorted by
    doc_id) UNDER A ROW-COUNT GUARD — raises past ``collect_limit``
    instead of OOMing the driver; stream the Dataset variant then."""
    comp = _clusters_dataset(
        edges_ds, cc_broadcast_limit, force_distributed
    ).materialize()  # object-store-resident; count() is then metadata
    n = comp.count()
    if n == 0:  # fully-empty datasets can drop column names
        return pa.table(
            {"doc_id": pa.array([], pa.int64()),
             "cluster_id": pa.array([], pa.int64())}
        )
    if n > collect_limit:
        raise ValueError(
            f"near-dup cluster table has {n} rows, past the driver-"
            f"collect guard ({collect_limit}); call with"
            f" as_dataset=True and stream the result instead."
        )
    df = comp.to_pandas().sort_values("doc_id", ignore_index=True)
    return pa.table(
        {
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "cluster_id": pa.array(df["cluster_id"].to_numpy(), pa.int64()),
        }
    )


def minhash_dedup(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    num_perm: int = 64,
    bands: int = 16,
    ngram: int = 3,
    pair_broadcast_limit: int = 50_000,
    cc_broadcast_limit: int | None = None,
    force_distributed_cc: bool = False,
    as_dataset: bool = False,
) -> "pa.Table | ray.data.Dataset":
    """Full near-dup pipeline. Returns (doc_id, cluster_id) for docs in
    a near-dup cluster of size ≥ 2 (cluster_id = min member id).

    Verification is adaptive — see :func:`_verify_pairs_adaptive`;
    cluster formation is the guarded dual-path components engine — see
    :func:`_clusters_dataset`. ``as_dataset=True`` streams the
    membership table (the 100-TB path — on a dup-heavy corpus it is
    corpus-row-scale); the default ``pa.Table`` collect is guarded by
    ``CLUSTER_COLLECT_LIMIT``.
    """
    pairs_ds = minhash_candidate_pairs(ds, num_perm, bands, ngram, distinct=False)
    edges = _verify_pairs_adaptive(ds, pairs_ds, threshold, ngram, pair_broadcast_limit)
    if as_dataset:
        return _clusters_dataset(edges, cc_broadcast_limit, force_distributed_cc)
    return _clusters_table(edges, cc_broadcast_limit, force_distributed_cc)


# --------------------------------------------- n-gram Jaccard (anchor)


class AnchorGramStage:
    """doc → (gram_hash, doc_id) inverted-index rows for ANCHOR grams
    (gram hashes ≡ 0 mod ``sample_mod``), the blocking stage of the
    exact n-gram Jaccard dedup path.

    Unlike MinHash banding, the blocking key here is a real shared
    n-gram: two docs collide iff they share at least one anchor gram,
    so precision of the candidate set tracks actual overlap. Expected
    index size is |grams| / sample_mod rows per doc. Recall caveat
    (documented contract): docs whose overlap contains no anchor gram
    are missed; for threshold ≥ 0.8 and sample_mod = 4 the shared set
    is ≥ 80% of either doc's grams, so P(no anchor among s shared
    grams) = (1 - 1/4)^s — negligible past ~30 shared grams, and the
    planted-cluster test pins it. Word hashes reuse the per-actor
    ``_WordHasher`` cache; the gram combine is the same vectorized
    polynomial as MinHash.
    """

    def __init__(self, ngram: int = 3, sample_mod: int = 4):
        self.ngram = ngram
        self.mod = np.uint64(sample_mod)
        self.hasher = _WordHasher()

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids_out: list[np.ndarray] = []
        grams_out: list[np.ndarray] = []
        for doc_id, text in zip(
            batch["doc_id"].to_pylist(), batch["text"].to_pylist()
        ):
            wh = self.hasher.doc_word_hashes(text)
            grams = np.unique(_gram_hashes_from_words(wh, self.ngram))
            anchors = grams[grams % self.mod == 0]
            if anchors.size:
                grams_out.append(anchors)
                ids_out.append(np.full(anchors.size, doc_id, np.int64))
        if not ids_out:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "band_id": pa.array([], pa.int32()),
                    "band_hash": pa.array([], pa.uint64()),
                }
            )
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate(ids_out), pa.int64()),
                "band_id": pa.array(
                    np.zeros(sum(a.size for a in grams_out), np.int32), pa.int32()
                ),
                "band_hash": pa.array(np.concatenate(grams_out), pa.uint64()),
            }
        )


def ngram_jaccard_dups(
    ds: "ray.data.Dataset",
    threshold: float = 0.8,
    ngram: int = 3,
    sample_mod: int = 4,
    pair_broadcast_limit: int = 50_000,
    cc_broadcast_limit: int | None = None,
    force_distributed_cc: bool = False,
    as_dataset: bool = False,
) -> "pa.Table | ray.data.Dataset":
    """Exact n-gram Jaccard near-dup clustering with anchor-gram
    blocking (no probabilistic sketch in the verify step).

    Shape: vectorized anchor-gram index (``map_batches``) → the same
    coarse int-partition bucket grouping as MinHash (anchor hash ≡ LSH
    bucket key, so ``_grouped_bucket_pairs`` is reused verbatim) →
    adaptive distributed Jaccard verification → guarded dual-path
    cluster formation (:func:`_clusters_dataset`). Returns
    (doc_id, cluster_id) rows for clusters of size ≥ 2;
    ``as_dataset=True`` streams them (guarded collect otherwise, see
    :func:`minhash_dedup`).
    """
    kwargs = {"ngram": ngram, "sample_mod": sample_mod}
    index = ds.map_batches(
        lambda t: AnchorGramStage(**kwargs)(t),
        batch_format="pyarrow",
        batch_size=1024,
    )
    pairs_ds = _grouped_bucket_pairs(index)
    edges = _verify_pairs_adaptive(ds, pairs_ds, threshold, ngram, pair_broadcast_limit)
    if as_dataset:
        return _clusters_dataset(edges, cc_broadcast_limit, force_distributed_cc)
    return _clusters_table(edges, cc_broadcast_limit, force_distributed_cc)


# ------------------------------------------------------------- SimHash


class SimHashStage:
    """Batch kernel (stateless tasks by default, like
    :class:`MinHashStage`): documents batch → (doc_id, simhash) rows.
    Word-hash cache is the process-global ``_SHARED_HASHER``; per-doc
    bit accumulation is one numpy unpack + sum over the doc's
    gram-hash array."""

    _SHIFTS = np.arange(64, dtype=np.uint64)

    def __init__(self, ngram: int = 2):
        self.ngram = ngram
        self.hasher = _SHARED_HASHER

    def signature(self, text: str) -> int:
        grams = _gram_hashes_from_words(self.hasher.doc_word_hashes(text), self.ngram)
        bits = ((grams[:, None] >> self._SHIFTS[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (2 * bits - 1).sum(axis=0)
        weights = np.left_shift(np.uint64(1) * (acc > 0), self._SHIFTS, dtype=np.uint64)
        return int(weights.sum(dtype=np.uint64))

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch["text"].to_pylist()]
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(sigs, pa.uint64())}
        )


def simhash64(text: str, ngram: int = 2) -> int:
    """64-bit SimHash over word n-gram features (Charikar 2002)."""
    return SimHashStage(ngram).signature(text)


def simhash_batch(batch: pa.Table, ngram: int = 2) -> pa.Table:
    return SimHashStage(ngram)(batch)


def hamming64(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _hamming_u64(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized popcount(a ^ b) for uint64 arrays (numpy < 2 has no
    bitwise_count; unpack the XOR bytes instead)."""
    x = (a ^ b).view(np.uint8).reshape(-1, 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int32)


def simhash_near_dups(
    ds: "ray.data.Dataset",
    max_hamming: int = 3,
    ngram: int = 2,
    concurrency: tuple | int | None = None,
    pair_broadcast_limit: int = 200_000,
) -> pa.Table:
    """Banded SimHash near-dup detection: 4 bands × 16 bits — two docs
    within Hamming distance 3 share at least one exact band.

    Adaptive verification like :func:`minhash_dedup`: small (guarded)
    pair tables fetch only the needed signatures (bounded by 2× pairs)
    and verify with one vectorized XOR-popcount on the driver; large
    ones join the signatures onto the pairs distributed. The
    corpus-sized signature table never touches the driver either way.
    Returns verified (id_a, id_b, hamming) pairs."""
    if concurrency is None:
        sigs_ds = ds.map_batches(
            lambda t, n=ngram: SimHashStage(n)(t),
            batch_format="pyarrow",
            batch_size=1024,
        )
    else:
        sigs_ds = ds.map_batches(
            SimHashStage,
            fn_constructor_kwargs={"ngram": ngram},
            batch_format="pyarrow",
            concurrency=concurrency,
        )

    def explode_bands(batch: pa.Table) -> pa.Table:
        sigs = batch["simhash"].to_numpy(zero_copy_only=False).astype(np.uint64)
        n = sigs.size
        doc_ids = np.repeat(batch["doc_id"].to_numpy(zero_copy_only=False), 4)
        band_ids = np.tile(np.arange(4, dtype=np.int32), n)
        keys = (
            (sigs[:, None] >> (np.uint64(16) * np.arange(4, dtype=np.uint64))[None, :])
            & np.uint64(0xFFFF)
        ).astype(np.int32)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "band_id": pa.array(band_ids, pa.int32()),
                "band_key": pa.array(keys.reshape(-1), pa.int32()),
            }
        )

    pairs = _grouped_bucket_pairs(
        sigs_ds.map_batches(explode_bands, batch_format="pyarrow"),
        key_col="band_key",
    )
    small, mat = _collect_pairs_if_small(pairs, pair_broadcast_limit)
    if small is not None:
        if not small:
            out = []
        else:
            needed = {i for p in small for i in p}
            rows = _fetch_rows_for_ids(
                sigs_ds, "doc_id", ["doc_id", "simhash"], needed
            )
            sig_by_id = {r["doc_id"]: r["simhash"] for r in rows}
            a = np.array([sig_by_id[x] for x, _ in small], dtype=np.uint64)
            b = np.array([sig_by_id[y] for _, y in small], dtype=np.uint64)
            ham = _hamming_u64(a, b)
            out = sorted(
                (p[0], p[1], int(h))
                for p, h in zip(small, ham)
                if h <= max_hamming
            )
    else:
        with_sigs = join_attr_onto_pairs(mat, sigs_ds, "simhash", dedup_pairs=True)

        def verify(batch: pa.Table) -> pa.Table:
            ham = _hamming_u64(
                batch["simhash_a"].to_numpy(zero_copy_only=False).astype(np.uint64),
                batch["simhash_b"].to_numpy(zero_copy_only=False).astype(np.uint64),
            )
            keep = ham <= max_hamming
            return pa.table(
                {
                    "id_a": batch["id_a"].filter(pa.array(keep)),
                    "id_b": batch["id_b"].filter(pa.array(keep)),
                    "hamming": pa.array(ham[keep], pa.int32()),
                }
            )

        verified_rows = with_sigs.map_batches(verify, batch_format="pyarrow").take_all()
        out = sorted((r["id_a"], r["id_b"], r["hamming"]) for r in verified_rows)
    return pa.table(
        {
            "id_a": pa.array([a for a, _, _ in out], pa.int64()),
            "id_b": pa.array([b for _, b, _ in out], pa.int64()),
            "hamming": pa.array([h for _, _, h in out], pa.int32()),
        }
    )


# ---------------------------------------------------- embedding cosine


def _emb_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    """Zero-copy-ish (N, dim) float64 from a list<float> column."""
    col = batch[emb_col]
    chunked = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = chunked.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    return flat.reshape(batch.num_rows, -1)


class HyperplaneLSHStage:
    """Actor-pool stage: embeddings batch → (table_id, bucket, vec_id)
    rows. L tables × k random-hyperplane sign bits (Charikar 2002);
    planes are built once per actor from a fixed seed so every actor
    buckets identically."""

    def __init__(
        self, dim: int, n_tables: int = 8, n_bits: int = 16,
        id_col: str = "vec_id", emb_col: str = "embedding", seed: int = 7,
    ):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(n_tables, n_bits, dim)
        self.pow2 = (1 << np.arange(n_bits, dtype=np.int64))
        self.id_col, self.emb_col = id_col, emb_col
        self.n_tables = n_tables

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _emb_matrix(batch, self.emb_col)
        mat = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
        n = mat.shape[0]
        # (T, N, k) sign bits → (T, N) bucket keys
        proj = np.einsum("tkd,nd->tnk", self.planes, mat) > 0
        buckets = proj.astype(np.int64) @ self.pow2
        ids = np.tile(batch[self.id_col].to_numpy(zero_copy_only=False), self.n_tables)
        table_ids = np.repeat(np.arange(self.n_tables, dtype=np.int32), n)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "band_id": pa.array(table_ids, pa.int32()),
                "band_key": pa.array(buckets.reshape(-1), pa.int64()),
            }
        )


def embedding_near_dups(
    ds: "ray.data.Dataset",
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    n_tables: int = 8,
    n_bits: int = 16,
    concurrency: tuple | int | None = None,
    pair_broadcast_limit: int = 200_000,
) -> pa.Table:
    """Embedding-cosine near-dup pairs via random-hyperplane LSH.

    Stage shape mirrors MinHash: bucket → within-bucket candidate pairs
    → exact row-wise cosine verification. P(bit agree) = 1 − θ/π, so at
    cosine ≥ 0.95 a 16-bit table matches with p ≈ 0.31 and 8 tables
    give ≈ 95% recall (raise ``n_tables`` / lower ``n_bits`` for more).

    Adaptive verification like :func:`minhash_dedup`: guarded-small
    pair tables fetch only the needed vectors (bounded by 2× pairs)
    and verify with one vectorized matmul; above the guard the vectors
    are joined onto the pairs distributed. Nothing corpus-sized is
    ever collected on the driver.
    """
    dim = len(ds.take(1)[0][emb_col])

    lsh_kwargs = {
        "dim": dim, "n_tables": n_tables, "n_bits": n_bits,
        "id_col": id_col, "emb_col": emb_col,
    }
    if concurrency is None:
        buckets = ds.map_batches(
            lambda t: HyperplaneLSHStage(**lsh_kwargs)(t),
            batch_format="pyarrow",
            batch_size=1024,
        )
    else:
        buckets = ds.map_batches(
            HyperplaneLSHStage,
            fn_constructor_kwargs=lsh_kwargs,
            batch_format="pyarrow",
            concurrency=concurrency,
        )
    # SemDeDup contract: ALL within-cluster pairs verify (the caller
    # sizes n_clusters so a cluster's pair set fits the verifier);
    # the 32-member star+chain cap is an LSH-bucket guard, not this
    # operator's semantics
    pairs = _grouped_bucket_pairs(buckets, key_col="band_key", all_pairs_cap=None)
    return _verify_cosine_pairs(
        ds, pairs, threshold, id_col, emb_col, dim, pair_broadcast_limit
    )


def _verify_cosine_pairs(
    ds: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    threshold: float,
    id_col: str,
    emb_col: str,
    dim: int,
    pair_broadcast_limit: int,
) -> pa.Table:
    """Exact-cosine verification of candidate id pairs, shared by the
    hyperplane-LSH (`embedding_near_dups`) and kmeans-bucketed
    (`semantic_dedup`) blockers. Adaptive: guarded-small pair tables
    fetch only the needed vectors; larger ones join vectors onto the
    pairs distributed. Nothing corpus-sized reaches the driver."""
    small, mat_pairs = _collect_pairs_if_small(pairs, pair_broadcast_limit)

    if small is not None:
        if not small:
            out = []
        else:
            needed = {i for p in small for i in p}
            rows = _fetch_rows_for_ids(
                ds.select_columns([id_col, emb_col]), id_col,
                [id_col, emb_col], needed,
            )
            emb_by_id = {
                r[id_col]: np.asarray(r[emb_col], dtype=np.float64) for r in rows
            }
            ma = np.stack([emb_by_id[a] for a, _ in small])
            mb = np.stack([emb_by_id[b] for _, b in small])
            na = np.maximum(np.linalg.norm(ma, axis=1), 1e-12)
            nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
            cos = (ma * mb).sum(axis=1) / (na * nb)
            out = sorted(
                (p[0], p[1], float(c))
                for p, c in zip(small, cos)
                if c >= threshold
            )
    else:
        # the per-part pandas merge handles fixed-width payloads best —
        # ship the vectors as binary and np.frombuffer on the far side
        def pack(t: pa.Table) -> pa.Table:
            m = _emb_matrix(t, emb_col)
            return pa.table(
                {
                    id_col: t[id_col],
                    "embbin": pa.array([row.tobytes() for row in m], pa.binary()),
                }
            )

        packed = ds.select_columns([id_col, emb_col]).map_batches(
            pack, batch_format="pyarrow"
        )
        with_embs = join_attr_onto_pairs(
            mat_pairs, packed, "embbin", id_col=id_col, dedup_pairs=True
        )

        def _unpack(col: pa.ChunkedArray) -> np.ndarray:
            vals = col.to_pylist()
            if not vals:
                return np.zeros((0, dim), dtype=np.float64)
            return np.stack([np.frombuffer(v, dtype=np.float64) for v in vals])

        def cosine_verify(batch: pa.Table) -> pa.Table:
            ma = _unpack(batch["embbin_a"])
            mb = _unpack(batch["embbin_b"])
            na = np.maximum(np.linalg.norm(ma, axis=1), 1e-12)
            nb = np.maximum(np.linalg.norm(mb, axis=1), 1e-12)
            cos = (ma * mb).sum(axis=1) / (na * nb)
            keep = cos >= threshold
            return pa.table(
                {
                    "id_a": batch["id_a"].filter(pa.array(keep)),
                    "id_b": batch["id_b"].filter(pa.array(keep)),
                    "cosine": pa.array(cos[keep], pa.float64()),
                }
            )

        rows = with_embs.map_batches(cosine_verify, batch_format="pyarrow").take_all()
        out = sorted((r["id_a"], r["id_b"], r["cosine"]) for r in rows)
    return pa.table(
        {
            "id_a": pa.array([a for a, _, _ in out], pa.int64()),
            "id_b": pa.array([b for _, b, _ in out], pa.int64()),
            "cosine": pa.array([c for _, _, c in out], pa.float64()),
        }
    )


def segment_dedup(
    ds: "ray.data.Dataset",
    n_words: int = 10,
    num_partitions: int = 16,
    owner_broadcast_limit: int = 200_000,
) -> "ray.data.Dataset":
    """Sub-document (segment-level) exact dedup — the
    Dolma/RefinedWeb-style pass that removes boilerplate shared ACROSS
    documents (license headers, templated runs) while keeping each
    document's first occurrence: text splits into fixed ``n_words``
    segments; a segment survives only in its OWNER document, the
    corpus-wide minimum of ``doc_id·2^20 + idx`` (deterministic, any
    layout). Surviving segments reassemble per doc in original order.

    Shuffle shape: the owner election groupby moves ONLY (md5, enc) —
    never segment text; the verification join ships each segment row
    once (hash_join on the md5 key, string-keyed); reassembly
    hash-partitions by ``doc_id % P`` so one part holds a doc's
    segments. md5 is the cross-engine content key (DuckDB ``md5()``
    bit-equal), collision-free at corpus scale; per-segment hashing is
    inherent to exact content identity (cf. ``exact_dedup``'s sha).
    """
    import hashlib

    import pandas as pd
    from ray.data.aggregate import Min

    from .joins import hash_join

    SHIFT = 1 << 20
    P = num_partitions

    def explode(t: pa.Table) -> pa.Table:
        doc_ids: list[int] = []
        idxs: list[int] = []
        paras: list[str] = []
        hs: list[str] = []
        for did, txt in zip(
            t["doc_id"].to_numpy(zero_copy_only=False), t["text"].to_pylist()
        ):
            words = txt.split(" ")
            n_seg = (len(words) + n_words - 1) // n_words
            if n_seg >= SHIFT:  # not assert: survives python -O
                raise ValueError("doc exceeds segment-index encode width")
            for i in range(n_seg):
                seg = " ".join(words[i * n_words:(i + 1) * n_words])
                doc_ids.append(int(did))
                idxs.append(i + 1)  # 1-based, matches SQL range()
                paras.append(seg)
                hs.append(hashlib.md5(seg.encode()).hexdigest())
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "idx": pa.array(idxs, pa.int64()),
                "h": pa.array(hs, pa.string()),
                "para": pa.array(paras, pa.string()),
                "enc": pa.array(
                    np.asarray(doc_ids, np.int64) * SHIFT
                    + np.asarray(idxs, np.int64),
                    pa.int64(),
                ),
            }
        )

    segs = ds.map_batches(explode, batch_format="pyarrow")

    def owner_partial(t: pa.Table) -> pa.Table:
        # in-batch combine: one (h, min enc) row per distinct segment
        df = pd.DataFrame(
            {"h": t["h"].to_pandas(), "owner_enc": t["enc"].to_pandas()}
        )
        return pa.Table.from_pandas(
            df.groupby("h", as_index=False).min(), preserve_index=False
        )

    # adaptive owner election + check (same guard pattern as the
    # near-dup verifiers): the owner partials are in-batch combined to
    # distinct-segment size — under the limit the FINAL min happens in
    # one driver pandas groupby and the check is a broadcast dict (no
    # all-to-all at all); above it the Ray groupby + hash_join run
    partials_mat = segs.map_batches(
        owner_partial, batch_format="pyarrow"
    ).materialize()
    if partials_mat.count() <= owner_broadcast_limit:
        pdf = partials_mat.to_pandas().groupby("h", as_index=False).min()
        owner_by_h = dict(zip(pdf["h"], pdf["owner_enc"]))

        def keep_owned(t: pa.Table) -> pa.Table:
            hs = pd.Series(t["h"].to_pylist())
            enc = t["enc"].to_numpy(zero_copy_only=False)
            keep = hs.map(owner_by_h).to_numpy() == enc
            return t.filter(pa.array(keep))

        kept = segs.map_batches(keep_owned, batch_format="pyarrow")
    else:
        owners = partials_mat.groupby("h").aggregate(
            Min("owner_enc", alias_name="owner_enc")
        )
        kept = hash_join(segs, owners, "h", "h", num_partitions=P).filter(
            expr="enc == owner_enc"
        )

    def add_part(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.append_column("part", pa.array(d % P, pa.int64()))

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["doc_id", "idx"], ignore_index=True)
        out = df.groupby("doc_id", as_index=False).agg(
            n_kept=("para", "size"), clean_text=("para", " ".join)
        )
        return out.astype({"n_kept": "int64"})

    return (
        kept.select_columns(["doc_id", "idx", "para"])
        .map_batches(add_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(reassemble, batch_format="pandas")
    )


def semantic_dedup(
    ds: "ray.data.Dataset",
    n_clusters: int = 16,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    kmeans_iters: int = 4,
    seed: int = 0,
    pair_broadcast_limit: int = 200_000,
    init_centroids: "np.ndarray | None" = None,
) -> pa.Table:
    """SemDeDup-style near-dup detection: k-means cluster assignment is
    the BLOCKING key (streaming Lloyd, metadata-sized partials), then
    within-cluster candidate pairs verify with exact cosine — the same
    adaptive verification as the hyperplane-LSH path
    (:func:`_verify_cosine_pairs`).

    vs hyperplane LSH: clusters follow the data distribution, so
    recall concentrates where the corpus is dense (the SemDeDup
    argument); LSH gives distribution-free guarantees. Both share the
    bucket-pair + verify machinery; cluster sizes bound the per-bucket
    pair blowup at n²/K on uniform data — pick ``n_clusters`` so a
    cluster's pairs fit the per-part verifier (salt oversized clusters
    upstream if the corpus is pathologically peaked).
    """
    from .clustering import assign_clusters, kmeans

    dim = len(ds.take(1)[0][emb_col])
    cents = kmeans(
        ds, emb_col=emb_col, id_col=id_col, n_clusters=n_clusters,
        n_iter=kmeans_iters, seed=seed, init_centroids=init_centroids,
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": t[id_col].cast(pa.int64()),
                "band_id": pa.array(
                    np.zeros(t.num_rows, dtype=np.int32), pa.int32()
                ),
                "band_key": t["cluster"].cast(pa.uint64()),
            }
        )

    buckets = assign_clusters(ds, cents, emb_col=emb_col).map_batches(
        project, batch_format="pyarrow"
    )
    # SemDeDup contract: ALL within-cluster pairs verify (the caller
    # sizes n_clusters so a cluster's pair set fits the verifier);
    # the 32-member star+chain cap is an LSH-bucket guard, not this
    # operator's semantics
    pairs = _grouped_bucket_pairs(buckets, key_col="band_key", all_pairs_cap=None)
    return _verify_cosine_pairs(
        ds, pairs, threshold, id_col, emb_col, dim, pair_broadcast_limit
    )


_SUBSTR_P = 1_000_003  # odd → invertible mod 2^64
_SUBSTR_PINV = pow(_SUBSTR_P, -1, 1 << 64)
_SUBSTR_MIX = np.uint64(0x9E3779B97F4A7C15)


def _window_hashes(b: np.ndarray, L: int, stride: int) -> tuple[np.ndarray, np.ndarray]:
    """CONTENT-DEFINED window sampling: the polynomial hash of EVERY
    length-``L`` window of byte array ``b`` is computed in O(n) (one
    cumsum/cumprod rolling pass — prefix sums of ``b[i]·p^{-i}`` with
    2^64 wraparound, p odd so the modular inverse exists), then a
    window is SELECTED iff ``mix(h) % stride == 0`` (expected density
    1/stride). Selection depends only on window content, so a run
    shared between two docs selects the same run-relative windows at
    ANY alignment — a fixed-phase stride can never align two
    arbitrarily-offset copies. Recall is probabilistic like any CDC
    chunker: a shared run of length ``R ≥ L`` is missed with
    probability ≈ (1−1/stride)^(R−L+1), deterministic per content.
    Returns (selected offsets, their hashes)."""
    n = len(b)
    if n < L:
        return np.zeros(0, np.int64), np.zeros(0, np.uint64)
    pinv_pows = np.empty(n, np.uint64)
    pinv_pows[0] = 1
    p_pows = np.empty(n, np.uint64)
    p_pows[0] = 1
    if n > 1:
        np.cumprod(np.full(n - 1, _SUBSTR_PINV, np.uint64), out=pinv_pows[1:])
        np.cumprod(np.full(n - 1, _SUBSTR_P, np.uint64), out=p_pows[1:])
    c = np.zeros(n + 1, np.uint64)
    np.cumsum(b.astype(np.uint64) * pinv_pows, out=c[1:])
    offs = np.arange(0, n - L + 1, dtype=np.int64)
    h = (c[offs + L] - c[offs]) * p_pows[offs + L - 1]
    sel = (h * _SUBSTR_MIX) % np.uint64(stride) == 0
    return offs[sel], h[sel]


def substring_dups(
    ds: "ray.data.Dataset",
    L: int = 64,
    stride: int = 8,
    doc_col: str = "doc_id",
    text_col: str = "text",
    pair_broadcast_limit: int = 200_000,
) -> pa.Table:
    """Arbitrary-alignment repeated-substring detection — the
    ExactSubstr pass of Lee et al. 2022 ("Deduplicating Training Data
    Makes Language Models Better"), restated for Ray Data without a
    distributed suffix array: every length-``L`` byte window hashes in
    one O(n) rolling pass, and windows are SAMPLED content-defined
    (``mix(h) % stride == 0`` — see :func:`_window_hashes`), so a
    shared run selects the same run-relative windows in both copies at
    ANY alignment; window-hash buckets with ≥ 2 members become
    candidate pairs through the same coarse-partition bucket machinery
    as MinHash; candidates verify by EXACT window-byte equality (hash
    collisions die here). Fixed-segment dedup (``segment_dedup``)
    cannot see cross-alignment repeats; this pass can, with CDC-style
    recall ≈ 1 − (1−1/stride)^(R−L+1) for a shared run of R bytes.

    Scale shape: the hash pass emits (hash, doc·2^24 + offset) — never
    window text; verification is adaptive (guarded driver fetch of
    just the needed windows, else re-window only the candidate docs —
    pair-bounded — and join slices onto pairs distributed). Output:
    verified (doc_a, off_a, doc_b, off_b, window) rows; overlapping
    pairs along a long shared run are all reported (callers merge
    runs). Intra-doc repeats included (doc_a == doc_b, off_a <
    off_b)."""
    OFF_SHIFT = 1 << 24

    def windows(t: pa.Table) -> pa.Table:
        ids: list[np.ndarray] = []
        offs: list[np.ndarray] = []
        hs: list[np.ndarray] = []
        for did, txt in zip(
            t[doc_col].to_numpy(zero_copy_only=False), t[text_col].to_pylist()
        ):
            b = np.frombuffer(txt.encode("utf-8"), np.uint8)
            if len(b) >= OFF_SHIFT:  # not assert: survives python -O
                raise ValueError(
                    "doc exceeds 2^24-byte offset encode width; raise "
                    "OFF_SHIFT or pre-split >16MB docs"
                )
            o, h = _window_hashes(b, L, stride)
            ids.append(np.full(len(o), int(did), np.int64))
            offs.append(o)
            hs.append(h)
        did = np.concatenate(ids) if ids else np.zeros(0, np.int64)
        off = np.concatenate(offs) if offs else np.zeros(0, np.int64)
        h = np.concatenate(hs) if hs else np.zeros(0, np.uint64)
        return pa.table(
            {
                "doc_id": pa.array(did * OFF_SHIFT + off, pa.int64()),
                "band_id": pa.array(np.zeros(len(h), np.int32), pa.int32()),
                "band_key": pa.array(h, pa.uint64()),
            }
        )

    win_ds = ds.map_batches(windows, batch_format="pyarrow")
    pairs = _grouped_bucket_pairs(win_ds, key_col="band_key")
    small, mat_pairs = _collect_pairs_if_small(pairs, pair_broadcast_limit)

    def _fetch_windows(needed_encs: set[int]) -> dict[int, str]:
        by_doc: dict[int, list[int]] = {}
        for e in needed_encs:
            by_doc.setdefault(e // OFF_SHIFT, []).append(e % OFF_SHIFT)
        rows = _fetch_rows_for_ids(
            ds.select_columns([doc_col, text_col]), doc_col,
            [doc_col, text_col], set(by_doc),
        )
        out: dict[int, bytes] = {}
        for r in rows:
            did = int(r[doc_col])
            bs = r[text_col].encode("utf-8")
            for off in by_doc.get(did, ()):
                # raw bytes: a window may split a multi-byte code point,
                # so it is NOT valid UTF-8 — never store it as pa.string()
                out[did * OFF_SHIFT + off] = bs[off:off + L]
        return out

    if small is not None:
        win = _fetch_windows({i for p in small for i in p})
        verified = [
            (a, b, win[a]) for a, b in small if win.get(a) == win.get(b)
        ]
    else:
        # distributed: re-window ONLY the candidate docs (pair-bounded)
        from .joins import hash_join

        def pair_docs(t: pa.Table) -> pa.Table:
            e = np.concatenate([
                t["id_a"].to_numpy(zero_copy_only=False),
                t["id_b"].to_numpy(zero_copy_only=False),
            ])
            return pa.table(
                {doc_col: pa.array(np.unique(e // OFF_SHIFT), pa.int64())}
            )

        from ray.data.aggregate import Count

        needed_docs = (
            mat_pairs.map_batches(pair_docs, batch_format="pyarrow")
            .groupby(doc_col)
            .aggregate(Count(alias_name="__n"))
            .select_columns([doc_col])
        )
        cand_docs = hash_join(
            ds.select_columns([doc_col, text_col]), needed_docs,
            doc_col, doc_col,
        )

        def slices(t: pa.Table) -> pa.Table:
            encs: list[int] = []
            wins: list[bytes] = []
            for did, txt in zip(
                t[doc_col].to_numpy(zero_copy_only=False),
                t[text_col].to_pylist(),
            ):
                bs = txt.encode("utf-8")
                o, _ = _window_hashes(
                    np.frombuffer(bs, np.uint8), L, stride
                )
                for off in o:
                    encs.append(int(did) * OFF_SHIFT + int(off))
                    # raw bytes: windows can split code points
                    wins.append(bs[off:off + L])
            return pa.table(
                {"doc_id": pa.array(encs, pa.int64()),
                 "win": pa.array(wins, pa.binary())}
            )

        win_slices = cand_docs.map_batches(slices, batch_format="pyarrow")
        joined = join_attr_onto_pairs(
            mat_pairs, win_slices, "win", id_col="doc_id", dedup_pairs=True
        )

        def verify(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            keep = pc.equal(t["win_a"], t["win_b"])
            t = t.filter(keep)
            return pa.table(
                {"id_a": t["id_a"], "id_b": t["id_b"], "win": t["win_a"]}
            )

        verified = sorted(
            (r["id_a"], r["id_b"], r["win"])
            for r in joined.map_batches(verify, batch_format="pyarrow").take_all()
        )

    verified = sorted(verified)
    return pa.table(
        {
            "doc_a": pa.array([a // OFF_SHIFT for a, _, _ in verified], pa.int64()),
            "off_a": pa.array([a % OFF_SHIFT for a, _, _ in verified], pa.int64()),
            "doc_b": pa.array([b // OFF_SHIFT for _, b, _ in verified], pa.int64()),
            "off_b": pa.array([b % OFF_SHIFT for _, b, _ in verified], pa.int64()),
            "window": pa.array([w for _, _, w in verified], pa.binary()),
        }
    )


def merge_window_runs(
    pairs: pa.Table, L: int, gap: int | None = None, stride: int = 8
) -> pa.Table:
    """Collapse :func:`substring_dups` window hits into MAXIMAL shared
    runs (the ExactSubstr deliverable): hits on the same diagonal
    (same doc pair, same ``off_a − off_b``) whose windows overlap or
    sit within ``gap`` bytes (default ``stride·4`` — content-defined
    sampling leaves gaps up to a few strides inside one run) merge
    into one (doc_a, doc_b, start_a, start_b, length) interval.
    Output-sized input → output-sized output; pure vectorized pandas,
    usable driver-side or inside a per-doc-pair ``map_groups``."""
    import pandas as pd

    if gap is None:
        gap = stride * 4
    if pairs.num_rows == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "start_a": pa.array([], pa.int64()),
                "start_b": pa.array([], pa.int64()),
                "length": pa.array([], pa.int64()),
            }
        )
    df = pd.DataFrame(
        {
            "doc_a": pairs["doc_a"].to_numpy(zero_copy_only=False),
            "doc_b": pairs["doc_b"].to_numpy(zero_copy_only=False),
            "off_a": pairs["off_a"].to_numpy(zero_copy_only=False),
            "off_b": pairs["off_b"].to_numpy(zero_copy_only=False),
        }
    )
    df["diag"] = df["off_a"] - df["off_b"]
    df = df.sort_values(["doc_a", "doc_b", "diag", "off_a"], ignore_index=True)
    same_key = (
        df[["doc_a", "doc_b", "diag"]] == df[["doc_a", "doc_b", "diag"]].shift()
    ).all(axis=1)
    new_run = ~(same_key & (df["off_a"] <= df["off_a"].shift() + L + gap))
    df["run"] = new_run.cumsum()
    out = df.groupby("run", as_index=False).agg(
        doc_a=("doc_a", "first"),
        doc_b=("doc_b", "first"),
        start_a=("off_a", "first"),
        start_b=("off_b", "first"),
        end_a=("off_a", "last"),
    )
    out["length"] = out["end_a"] + L - out["start_a"]
    return pa.Table.from_pandas(
        out[["doc_a", "doc_b", "start_a", "start_b", "length"]].astype("int64"),
        preserve_index=False,
    )


def substring_dedup_rewrite(
    ds: "ray.data.Dataset",
    L: int = 64,
    stride: int = 8,
    doc_col: str = "doc_id",
    text_col: str = "text",
    pair_broadcast_limit: int = 200_000,
) -> "ray.data.Dataset":
    """The REMOVAL half of ExactSubstr dedup (Lee et al. 2022 cut the
    later copy of every repeated run): detect repeated windows
    (:func:`substring_dups`), merge them to maximal runs
    (:func:`merge_window_runs`), keep each run only in its OWNER — the
    lexicographically smallest (doc, offset) — and cut it from every
    other doc. Returns (doc_id, clean_text, n_cut_bytes) for ALL docs.

    Cut intervals are output-sized (they exist only where dup runs
    exist), so they broadcast as a per-doc interval dict; the rewrite
    itself is one streaming pass. Overlapping cut intervals in one doc
    merge before cutting, so rewrites never double-cut."""
    import pandas as pd

    pairs = substring_dups(
        ds, L=L, stride=stride, doc_col=doc_col, text_col=text_col,
        pair_broadcast_limit=pair_broadcast_limit,
    )
    runs = merge_window_runs(pairs, L=L, stride=stride).to_pylist()
    # owner = min (doc, start); cut the other side of each run.
    cuts: dict[int, list[tuple[int, int]]] = {}
    for r in runs:
        a = (r["doc_a"], r["start_a"])
        b = (r["doc_b"], r["start_b"])
        loser_doc, loser_start = max(a, b)
        cuts.setdefault(loser_doc, []).append(
            (loser_start, loser_start + r["length"])
        )
    merged_cuts: dict[int, list[tuple[int, int]]] = {}
    for d, iv in cuts.items():
        iv.sort()
        acc = [list(iv[0])]
        for s0, e0 in iv[1:]:
            if s0 <= acc[-1][1]:
                acc[-1][1] = max(acc[-1][1], e0)
            else:
                acc.append([s0, e0])
        merged_cuts[d] = [(s0, e0) for s0, e0 in acc]

    def _snap(bs: bytes, i: int) -> int:
        # advance i to the next UTF-8 code-point boundary (continuation
        # bytes are 0b10xxxxxx) so cut texts stay valid UTF-8 — Arrow
        # string columns reject surrogates from a mid-code-point cut.
        n = len(bs)
        i = min(i, n)
        while i < n and (bs[i] & 0xC0) == 0x80:
            i += 1
        return i

    def rewrite(t: pa.Table) -> pa.Table:
        ids = t[doc_col].to_numpy(zero_copy_only=False)
        texts = t[text_col].to_pylist()
        out_txt: list[str] = []
        out_cut: list[int] = []
        for did, txt in zip(ids, texts):
            iv = merged_cuts.get(int(did))
            if not iv:
                out_txt.append(txt)
                out_cut.append(0)
                continue
            bs = txt.encode("utf-8")
            kept, pos = [], 0
            for s0, e0 in iv:
                s0, e0 = _snap(bs, s0), _snap(bs, e0)
                kept.append(bs[pos:s0])
                pos = max(pos, e0)
            kept.append(bs[pos:])
            clean = b"".join(kept)
            out_txt.append(clean.decode("utf-8"))
            out_cut.append(len(bs) - len(clean))
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "clean_text": pa.array(out_txt, pa.string()),
                "n_cut_bytes": pa.array(out_cut, pa.int64()),
            }
        )

    return ds.map_batches(rewrite, batch_format="pyarrow")


# --------------------------------------- FastSS edit-distance-1 pairs


def _within_edit1(a: str, b: str) -> bool:
    """Exact edit-distance ≤ 1 check in O(len) (no DP table needed at
    distance 1): equal length → at most one substitution; length gap
    of one → two-pointer single-skip; anything else → False."""
    la, lb = len(a), len(b)
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if abs(la - lb) != 1:
        return False
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = j = 0
    skipped = False
    while i < la and j < lb:
        if a[i] == b[j]:
            i += 1
            j += 1
        elif skipped:
            return False
        else:
            skipped = True
            j += 1
    return True


def editdist1_pairs(ds, col: str, n_parts: int = 64):
    """All UNORDERED pairs of DISTINCT values of ``col`` within exact
    Levenshtein distance 1 — the FastSS deletion-neighborhood
    algorithm, fully distributed:

    two strings are within one edit iff their deletion neighborhoods
    intersect, where ``D(s) = {s} ∪ {s minus one char}``; so each
    distinct value fans out to ``len+1`` variants, candidate pairs
    are enumerated inside each variant bucket, and every candidate is
    VERIFIED with the exact O(len) distance-1 check (hash collisions
    between different variants therefore cannot create false pairs —
    only extra candidates).

    Shuffle shape: values dedup cross-batch on a ``hash % P`` part
    key (per-part vectorized drop_duplicates — a raw value-keyed
    ``.aggregate()`` pays Ray 2.49's ~1–2 ms PER GROUP reduce cost at
    corpus-distinct cardinality, BASELINE.md round-5 cliff note);
    variants ship as int64 siphashes (never the variant strings);
    buckets shuffle ONCE on ``hash % n_parts`` and each part
    processes its buckets with a vectorized size filter (only
    multi-value buckets enumerate pairs); verified pairs dedup the
    same part-keyed way."""
    import pandas as pd
    import pyarrow.compute as pc

    def _val_part(t: pa.Table) -> pa.Table:
        u = pc.unique(t[col])
        part = pd.util.hash_array(u.to_numpy(zero_copy_only=False)) % n_parts
        return pa.table(
            {"part": pa.array(part.astype(np.int64), pa.int64()), col: u}
        )

    def _val_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[[col]].drop_duplicates(ignore_index=True)

    distinct = (
        ds.map_batches(_val_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_val_dedup, batch_format="pandas")
    )

    def variants(t: pa.Table) -> pa.Table:
        keys, hs = [], []
        for k in t[col].to_pylist():
            if k is None:
                continue
            vs = [k] + [k[:i] + k[i + 1:] for i in range(len(k))]
            keys.extend([k] * len(vs))
            hs.extend(vs)
        vh = pd.util.hash_array(np.asarray(hs, dtype=object))
        return pa.table(
            {
                "part": pa.array(vh.astype(np.int64) % n_parts, pa.int64()),
                "vh": pa.array(vh.astype(np.int64), pa.int64()),
                "key": pa.array(keys, pa.string()),
            }
        )

    def per_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(["vh", "key"])
        sizes = df.groupby("vh")["key"].transform("size")
        multi = df[sizes > 1]
        ka, kb = [], []
        for _, g in multi.groupby("vh"):
            ks = sorted(g["key"].unique())
            for i in range(len(ks)):
                for j in range(i + 1, len(ks)):
                    if _within_edit1(ks[i], ks[j]):
                        ka.append(ks[i])
                        kb.append(ks[j])
        return pd.DataFrame({"ka": ka, "kb": kb})

    def pair_part(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop_duplicates(ignore_index=True)
        ha = pd.util.hash_array(df["ka"].to_numpy(dtype=object))
        hb = pd.util.hash_array(df["kb"].to_numpy(dtype=object))
        df["pp"] = ((ha * 3 + hb) % n_parts).astype(np.int64)
        return df

    def pair_dedup(g: pd.DataFrame) -> pd.DataFrame:
        return g[["ka", "kb"]].drop_duplicates(ignore_index=True)

    return (
        distinct.map_batches(variants, batch_format="pyarrow")
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
        .map_batches(pair_part, batch_format="pandas")
        .groupby("pp")
        .map_groups(pair_dedup, batch_format="pandas")
    )


# -------------------------------------------------- incremental dedup


def incremental_dedup(
    new_ds: "ray.data.Dataset",
    snapshot_ds: "ray.data.Dataset",
    id_col: str = "doc_id",
    text_col: str = "text",
    parts: int = 64,
    nbits: int = 1 << 23,
) -> "ray.data.Dataset":
    """Dedup an INCOMING shard against an already-ingested corpus
    snapshot: keep the min-id row per distinct text among ``new_ds``
    rows whose text does NOT appear in ``snapshot_ds``. Returns
    (doc_id,) rows. The daily-ingest shape of :func:`exact_dedup` —
    at 100 TB the snapshot is the huge side and must never shuffle
    wholesale, so the asymmetry is the design:

    1. new side (small): per-batch sha256 digests + min-id combiner →
       ``(part, key, id)`` rows, the exact_dedup int-key idiom.
    2. a Bloom filter over the NEW side's digest prefixes (~1 MiB,
       built in one streaming pass over the small side) broadcasts to
       the snapshot scan: snapshot digests that can't match any
       incoming digest are dropped IN-STREAM — only possible overlaps
       (false-positive-bounded, output-sized in practice) reach the
       exchange, carrying ``(part, key)`` with per-batch dedup.
    3. ONE shuffle co-locates both sides by digest-prefix int part;
       each part drops new keys present on the snapshot side and emits
       the min id per surviving key — exact, Bloom false positives
       are resolved by the full 32-byte digest comparison here.
    """
    from .joins import BloomFilter, build_bloom

    def new_keyed(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        digests = [hashlib.sha256(x.encode("utf-8")).digest() for x in texts]
        if digests:
            hi = np.frombuffer(b"".join(d[:8] for d in digests), dtype=">u8")
            part = (hi % np.uint64(parts)).astype(np.int64)
        else:
            part = np.array([], dtype=np.int64)
        df = pd.DataFrame(
            {
                "part": part,
                "key": digests,
                id_col: t[id_col].to_numpy(zero_copy_only=False),
            }
        )
        df = df.groupby(["part", "key"], sort=False, as_index=False)[
            [id_col]
        ].min()
        return pa.table(
            {
                "part": pa.array(df["part"].to_numpy(), pa.int64()),
                "key": pa.array(df["key"].tolist(), pa.binary()),
                id_col: pa.array(df[id_col].to_numpy(), pa.int64()),
                "side": pa.array(
                    np.zeros(len(df), dtype=np.int8), pa.int8()
                ),
            }
        )

    new_keys = new_ds.map_batches(
        new_keyed, batch_format="pyarrow"
    ).materialize()  # shard-sized (post-combine); reused for the bloom

    def hi_int(t: pa.Table) -> pa.Table:
        ks = t["key"].to_pylist()
        hi = (
            np.frombuffer(b"".join(k[:8] for k in ks), dtype=">u8")
            if ks
            else np.array([], dtype=">u8")
        )
        return pa.table(
            {"hi": pa.array(hi.astype(np.uint64).astype(np.int64), pa.int64())}
        )

    bloom: BloomFilter = build_bloom(
        new_keys.map_batches(hi_int, batch_format="pyarrow"), "hi", nbits=nbits
    )

    def snap_keyed(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        digests = [hashlib.sha256(x.encode("utf-8")).digest() for x in texts]
        if digests:
            hi = np.frombuffer(b"".join(d[:8] for d in digests), dtype=">u8")
            keep = bloom.contains(hi.astype(np.uint64).astype(np.int64))
        else:
            hi = np.array([], dtype=">u8")
            keep = np.array([], dtype=bool)
        kept = [d for d, k in zip(digests, keep) if k]
        part = (hi[keep] % np.uint64(parts)).astype(np.int64)
        df = pd.DataFrame({"part": part, "key": kept}).drop_duplicates()
        n = len(df)
        return pa.table(
            {
                "part": pa.array(df["part"].to_numpy() if n else [], pa.int64()),
                "key": pa.array(df["key"].tolist(), pa.binary()),
                id_col: pa.array(np.zeros(n, dtype=np.int64), pa.int64()),
                "side": pa.array(np.ones(n, dtype=np.int8), pa.int8()),
            }
        )

    snap_keys = snapshot_ds.map_batches(snap_keyed, batch_format="pyarrow")

    def per_part(g: pd.DataFrame) -> pd.DataFrame:
        seen = set(g.loc[g["side"] == 1, "key"])
        fresh = g[(g["side"] == 0) & ~g["key"].isin(seen)]
        return fresh.groupby("key", sort=False, as_index=False)[[id_col]].min()[
            [id_col]
        ]

    return (
        new_keys.union(snap_keys)
        .groupby("part")
        .map_groups(per_part, batch_format="pandas")
    )
