"""Similarity search over an embedding column (``list<float>``).

- :func:`brute_force_topk` — exact cosine top-k: each ``map_batches``
  task does one numpy matmul of its batch against the broadcast query
  matrix and emits only its local top-k (partial top-k), so the final
  merge on the driver sees ``k × n_batches`` rows, not the corpus.
- :class:`IVFIndex` / :func:`ivf_topk` — the scale path: k-means-lite
  centroids (deterministic seeded Lloyd iterations on a sample),
  assignment via ``map_batches``, then search probes only the
  ``nprobe`` nearest centroid partitions.
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def _normalize(mat: np.ndarray) -> np.ndarray:
    return mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)


def _batch_matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    # zero-copy-ish: fixed-size lists → reshape of flat values
    if pa.types.is_fixed_size_list(col.type):
        arr = col.combine_chunks()
        return arr.values.to_numpy(zero_copy_only=False).reshape(len(arr), col.type.list_size)
    return np.asarray(col.to_pylist(), dtype=np.float64)


class PartialTopK:
    """Stateless map_batches: batch → its local top-k vs the query."""

    def __init__(self, query: np.ndarray, k: int, id_col: str, emb_col: str):
        q = np.asarray(query, dtype=np.float64)
        self.query = q / np.maximum(np.linalg.norm(q), 1e-12)
        self.k = k
        self.id_col = id_col
        self.emb_col = emb_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = _normalize(_batch_matrix(batch, self.emb_col).astype(np.float64))
        sims = mat @ self.query
        k = min(self.k, len(sims))
        idx = np.argpartition(-sims, k - 1)[:k] if k else np.array([], dtype=int)
        ids = batch[self.id_col].to_numpy()[idx]
        return pa.table(
            {
                self.id_col: pa.array(ids, pa.int64()),
                "cosine": pa.array(sims[idx], pa.float64()),
            }
        )


def brute_force_topk(
    ds: "ray.data.Dataset",
    query: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> pa.Table:
    """Exact cosine top-k; returns (id, cosine) sorted desc, id asc ties."""
    partials = ds.map_batches(
        PartialTopK(query, k, id_col, emb_col), batch_format="pyarrow"
    ).take_all()
    rows = sorted(partials, key=lambda r: (-r["cosine"], r[id_col]))[:k]
    return pa.table(
        {
            id_col: pa.array([r[id_col] for r in rows], pa.int64()),
            "cosine": pa.array([r["cosine"] for r in rows], pa.float64()),
        }
    )


# ----------------------------------------------------------------- IVF


def kmeans_lite(
    sample: np.ndarray,
    n_clusters: int,
    n_iter: int = 10,
    seed: int = 0,
    init_centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Deterministic seeded Lloyd iterations (cosine/normalized space).
    ``init_centroids`` bypasses the seeded draw — used by the
    data-deterministic IVF build so the whole index is a pure function
    of the rows (SQL-oracle-able)."""
    x = _normalize(sample.astype(np.float64))
    if init_centroids is not None:
        centroids = _normalize(init_centroids.astype(np.float64))
    else:
        rng = np.random.RandomState(seed)
        centroids = x[rng.choice(len(x), size=min(n_clusters, len(x)), replace=False)]
    for _ in range(n_iter):
        assign = np.argmax(x @ centroids.T, axis=1)
        for c in range(len(centroids)):
            members = x[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IVFIndex:
    """Inverted-file index over an embedding Dataset.

    ``build`` samples the dataset for centroids (driver-side kmeans on
    a bounded sample), then assigns every vector to its nearest
    centroid via a streaming ``map_batches`` whose output is the
    centroid-partitioned index. Search touches only ``nprobe``
    partitions — on a cluster each partition is a separate parquet
    dir and only those blocks are read.
    """

    def __init__(
        self,
        centroids: np.ndarray,
        assignments: "ray.data.Dataset | None",
        index_dir: str | None = None,
    ):
        self.centroids = centroids
        self.assignments = assignments  # (id, cluster, embedding), in-memory mode
        self.index_dir = index_dir  # cluster=K-partitioned parquet, pruned mode

    @classmethod
    def build(
        cls,
        ds: "ray.data.Dataset",
        n_clusters: int = 16,
        sample_limit: int = 4096,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        seed: int = 0,
        index_dir: str | None = None,
        deterministic_init: bool = False,
    ) -> "IVFIndex":
        """``index_dir`` set → persist assignments as
        ``cluster=K``-partitioned parquet (one dir per inverted list);
        ``search`` then READS only the ``nprobe`` probed dirs instead of
        filtering every block — the actual IVF I/O win at scale.

        ``deterministic_init=True`` trains the centroids on the rows
        with ``id < sample_limit`` (id-sorted; init = the
        ``n_clusters`` smallest ids) instead of a block-order
        ``limit()`` sample — the index becomes a pure function of the
        DATA, which is what lets ``emb_ivf_topk`` carry an exact SQL
        oracle. Assumes dense-ish integer ids; the filter streams, so
        at 100 TB this is a pushdown scan, not a sort."""
        import os
        import shutil

        if deterministic_init:
            import pyarrow.compute as pc

            def pick(t: pa.Table) -> pa.Table:
                return t.select([id_col, emb_col]).filter(
                    pc.less(t[id_col], pa.scalar(sample_limit))
                )

            rows = ds.map_batches(pick, batch_format="pyarrow").take_all()
            rows.sort(key=lambda r: r[id_col])
            sample = np.asarray([r[emb_col] for r in rows], dtype=np.float64)
            centroids = kmeans_lite(
                sample, n_clusters, init_centroids=sample[:n_clusters]
            )
        else:
            sample_rows = ds.limit(sample_limit).select_columns([emb_col]).take_all()
            sample = np.asarray([r[emb_col] for r in sample_rows], dtype=np.float64)
            centroids = kmeans_lite(sample, n_clusters, seed=seed)

        def assign(batch: pa.Table) -> pa.Table:
            mat = _normalize(_batch_matrix(batch, emb_col).astype(np.float64))
            cl = np.argmax(mat @ centroids.T, axis=1)
            return pa.table(
                {
                    id_col: batch[id_col],
                    "cluster": pa.array(cl, pa.int32()),
                    emb_col: batch[emb_col],
                }
            )

        assigned = ds.map_batches(assign, batch_format="pyarrow")
        if index_dir is not None:
            shutil.rmtree(index_dir, ignore_errors=True)
            os.makedirs(index_dir, exist_ok=True)
            # coalesce blocks first: a partitioned write emits one file
            # per (block × partition value) — without this, file count
            # explodes and read-back metadata cost dominates
            assigned.repartition(min(8, n_clusters)).write_parquet(
                index_dir, partition_cols=["cluster"]
            )
            np.save(os.path.join(index_dir, "_centroids.npy"), centroids)
            return cls(centroids, None, index_dir=index_dir)
        return cls(centroids, assigned.materialize())

    @classmethod
    def load(cls, index_dir: str) -> "IVFIndex":
        import os

        centroids = np.load(os.path.join(index_dir, "_centroids.npy"))
        return cls(centroids, None, index_dir=index_dir)

    def _probe_clusters(self, q: np.ndarray, nprobe: int) -> np.ndarray:
        return np.argsort(-(self.centroids @ q))[:nprobe].astype(np.int32)

    def _probe_dirs(self, probe: np.ndarray) -> list[str]:
        """Only the probed inverted lists' directories — what search
        opens; everything else is never read."""
        import os

        import glob

        out = []
        for c in probe.tolist():
            d = os.path.join(self.index_dir, f"cluster={c}")
            if os.path.isdir(d):
                # explicit file list: read_parquet with a path LIST does
                # not expand directories
                out.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
        return out

    def search(
        self,
        query: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
    ) -> pa.Table:
        import pyarrow.compute as pc

        q = np.asarray(query, dtype=np.float64)
        q = q / np.maximum(np.linalg.norm(q), 1e-12)
        probe = self._probe_clusters(q, nprobe)
        if self.index_dir is not None:
            import ray.data as rd

            dirs = self._probe_dirs(probe)
            if not dirs:
                return pa.table(
                    {id_col: pa.array([], pa.int64()),
                     "cosine": pa.array([], pa.float64())}
                )
            subset = rd.read_parquet(dirs, columns=[id_col, emb_col])
        else:
            probe_arr = pa.array(probe.tolist(), pa.int32())
            subset = self.assignments.map_batches(
                lambda t: t.filter(pc.is_in(t["cluster"], value_set=probe_arr)),
                batch_format="pyarrow",
            )
        return brute_force_topk(subset, q, k, id_col, emb_col)


# ------------------------------------------- exact similarity self-join


def exact_cosine_pairs(
    ds: "ray.data.Dataset",
    threshold: float,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    rows_per_block: int = 65536,
    broadcast_limit: int = 100_000,
    force_distributed: bool = False,
) -> pa.Table:
    """EXACT cosine similarity self-join: every ``(id_a < id_b)`` pair
    with ``cosine >= threshold``. The deterministic complement of the
    LSH path (``dedup.embedding_near_dups``): LSH trades a recall
    epsilon for near-linear cost; this op pays the inherent all-pairs
    cost and misses nothing — it is the "verify" building block and
    the right tool whenever n is bucket-sized.

    Two guarded paths (repo idiom — broadcast when small, shuffle when
    not):

    - **broadcast** (``count <= broadcast_limit``): the normalized
      matrix is ``ray.put`` ONCE and every ``map_batches`` task
      matmuls its batch against it — the left side streams, nothing
      corpus-sized crosses per batch.
    - **block-pair** (the scale path): rows are hashed into ``B``
      blocks of ~``rows_per_block``; a vectorized ``map_batches``
      replicates each row once per pair-group it belongs to (keys
      ``(min(b,j), max(b,j))`` for all ``j``), then ONE groupby brings
      the two blocks of every pair together and a per-group matmul
      emits qualifying pairs. Replication traffic is ``B x N`` rows —
      the inherent lower bound for an exact all-pairs join — and each
      group is 2 blocks, so worker memory is bounded by
      ``2 * rows_per_block * dim * 8`` bytes regardless of N.

    Output: ``pa.Table(id_a, id_b)`` int64, ``id_a < id_b``, sorted —
    output-sized (the pair set), never corpus x corpus.
    """
    import ray

    n = ds.count()
    if n <= broadcast_limit and not force_distributed:
        rows = ds.select_columns([id_col, emb_col]).take_all()  # guarded: n <= broadcast_limit
        ids = np.asarray([r[id_col] for r in rows], dtype=np.int64)
        mat = _normalize(
            np.asarray([r[emb_col] for r in rows], dtype=np.float64)
        )
        ref = ray.put((ids, mat))

        def scan(batch: pa.Table) -> pa.Table:
            all_ids, all_mat = ray.get(ref)  # zero-copy from object store
            mb = _normalize(_batch_matrix(batch, emb_col).astype(np.float64))
            bids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            cos = mb @ all_mat.T
            li, ri = np.nonzero(cos >= threshold)
            a, b = bids[li], all_ids[ri]
            keep = a < b  # each unordered pair exactly once
            return pa.table(
                {
                    "id_a": pa.array(a[keep], pa.int64()),
                    "id_b": pa.array(b[keep], pa.int64()),
                }
            )

        parts = ds.map_batches(scan, batch_format="pyarrow").take_all()
        out = sorted((r["id_a"], r["id_b"]) for r in parts)
    else:
        n_blocks = max(2, -(-n // rows_per_block))

        def replicate(t: pa.Table) -> pa.Table:
            m = _normalize(_batch_matrix(t, emb_col).astype(np.float64))
            ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            blk = (ids % np.int64(n_blocks)).astype(np.int64)
            k = len(ids)
            # row r joins pair-groups (min(blk,j), max(blk,j)) for all j
            j = np.tile(np.arange(n_blocks, dtype=np.int64), k)
            b = np.repeat(blk, n_blocks)
            lo, hi = np.minimum(b, j), np.maximum(b, j)
            return pa.table(
                {
                    "pair": lo * np.int64(n_blocks) + hi,
                    "blk": b,
                    "rid": np.repeat(ids, n_blocks),
                    "embbin": pa.array(
                        [row.tobytes() for row in np.repeat(m, n_blocks, axis=0)],
                        pa.binary(),
                    ),
                }
            )

        def pair_matmul(g: pa.Table) -> pa.Table:
            pair = g["pair"][0].as_py()
            lo, hi = divmod(pair, n_blocks)
            ids = g["rid"].to_numpy(zero_copy_only=False)
            blk = g["blk"].to_numpy(zero_copy_only=False)
            mat = np.stack(
                [np.frombuffer(v, dtype=np.float64) for v in g["embbin"].to_pylist()]
            )
            if lo == hi:
                cos = mat @ mat.T
                li, ri = np.nonzero(cos >= threshold)
                a, b = ids[li], ids[ri]
                keep = a < b
                a, b = a[keep], b[keep]
            else:
                # each row arrives once, on its own block's side
                left = blk == lo
                la, lm = ids[left], mat[left]
                ra, rm = ids[~left], mat[~left]
                cos = lm @ rm.T
                li, ri = np.nonzero(cos >= threshold)
                a, b = la[li], ra[ri]
                a, b = np.minimum(a, b), np.maximum(a, b)
            return pa.table(
                {"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())}
            )

        parts = (
            ds.select_columns([id_col, emb_col])
            .map_batches(replicate, batch_format="pyarrow")
            .groupby("pair")
            .map_groups(pair_matmul, batch_format="pyarrow")
            .take_all()  # output-sized: the qualifying pair set
        )
        out = sorted((r["id_a"], r["id_b"]) for r in parts)
    return pa.table(
        {
            "id_a": pa.array([a for a, _ in out], pa.int64()),
            "id_b": pa.array([b for _, b in out], pa.int64()),
        }
    )
