"""Distributed k-means (Lloyd) over an embedding column.

The scale path for cluster-based training-data curation (balanced
sampling, topic bucketing, cluster-dedup): each iteration is ONE
streaming pass — every batch folds its rows into a (K x D) partial
sum + per-cluster counts, so what leaves a worker is one
metadata-sized row per block regardless of row count. The driver sums
the partials in a deterministic order (sorted by each block's min id)
and updates the K centroids; centroids ship back into the next pass by
closure capture (K x D floats — broadcast-sized, `ray.put` once on a
real cluster).

Contrast with :func:`gliner_ray.functions.similarity.kmeans_lite`,
which runs on a bounded driver-side SAMPLE and is only used to seed
IVF centroids; this operator sees every row.

Reference anchor: embedding-space clustering is the engine-side analog
of the reference's entity-embedding grouping (no direct counterpart in
whoisjones/GLiNER — this is one of the beyond-the-reference
training-data operators the brief requires).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _normalize(mat: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.where(n == 0, 1.0, n)


def _matrix(batch: pa.Table, emb_col: str) -> np.ndarray:
    col = batch[emb_col]
    flat = col.combine_chunks().flatten().to_numpy(zero_copy_only=False)
    return flat.reshape(batch.num_rows, -1).astype(np.float64)


def _init_sample(ds, emb_col: str, want: int) -> np.ndarray:
    """Deterministic spread sample for centroid init: up to 8
    evenly-spaced rows from each block, capped at ``want`` — spans the
    data's block range instead of its head (a head sample collapses
    when the input is sorted by the very structure being clustered).
    At extreme block counts the cap keeps this bounded; a production
    refinement would be distributed reservoir sampling."""

    def spaced(batch: pa.Table) -> pa.Table:
        k = min(batch.num_rows, 8)
        idx = np.unique(np.linspace(0, batch.num_rows - 1, num=k).astype(np.int64))
        return batch.select([emb_col]).take(pa.array(idx))

    df = ds.map_batches(spaced, batch_format="pyarrow").limit(want).to_pandas()
    return np.stack(df[emb_col].to_numpy())


def kmeans(
    ds: "ray.data.Dataset",  # noqa: F821
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    n_iter: int = 10,
    seed: int = 0,
    init_centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Full-data Lloyd iterations in cosine space → (K, D) centroids.

    Init: seeded choice from a deterministic spread sample (or the
    caller's ``init_centroids``). Every iteration streams the whole
    dataset once; nothing row-sized ever reaches the driver.
    """
    if init_centroids is not None:
        centroids = _normalize(init_centroids.astype(np.float64))
    else:
        sample = _init_sample(ds, emb_col, max(n_clusters * 8, 64))
        rng = np.random.RandomState(seed)
        x0 = _normalize(sample.astype(np.float64))
        centroids = x0[
            rng.choice(len(x0), size=min(n_clusters, len(x0)), replace=False)
        ]
    K = len(centroids)

    for _ in range(n_iter):
        cur = centroids  # closure-captured; ray.put for a real cluster

        def partial(batch: pa.Table) -> pa.Table:
            x = _normalize(_matrix(batch, emb_col))
            assign = np.argmax(x @ cur.T, axis=1)
            sums = np.zeros((K, x.shape[1]), dtype=np.float64)
            np.add.at(sums, assign, x)
            counts = np.bincount(assign, minlength=K).astype(np.int64)
            first_id = batch[id_col][0].as_py() if batch.num_rows else -1
            return pa.table(
                {
                    "first_id": pa.array([first_id], pa.int64()),
                    "sums": pa.array([sums.ravel().tolist()],
                                     pa.list_(pa.float64())),
                    "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
                }
            )

        # one row per block — metadata-sized; sort by first_id so the
        # float reduction order (and thus the centroids) is
        # deterministic across runs and schedulers
        parts = sorted(
            ds.map_batches(partial, batch_format="pyarrow").take_all(),
            key=lambda r: r["first_id"],
        )
        sums = np.zeros_like(centroids)
        counts = np.zeros(K, dtype=np.int64)
        for r in parts:
            sums += np.asarray(r["sums"], dtype=np.float64).reshape(K, -1)
            counts += np.asarray(r["counts"], dtype=np.int64)
        nonzero = counts > 0
        centroids = centroids.copy()
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        centroids = _normalize(centroids)
    return centroids


def assign_clusters(
    ds: "ray.data.Dataset",  # noqa: F821
    centroids: np.ndarray,
    emb_col: str = "embedding",
) -> "ray.data.Dataset":  # noqa: F821
    """Streaming nearest-centroid assignment: adds a ``cluster``
    column (int32). Centroids are closure-captured (K x D — the
    broadcast small side)."""

    def assign(batch: pa.Table) -> pa.Table:
        x = _normalize(_matrix(batch, emb_col))
        return batch.append_column(
            "cluster", pa.array(np.argmax(x @ centroids.T, axis=1), pa.int32())
        )

    return ds.map_batches(assign, batch_format="pyarrow")


def kmeans_sequential(
    x: np.ndarray,
    n_clusters: int,
    n_iter: int = 10,
    init_centroids: np.ndarray | None = None,
) -> np.ndarray:
    """Single-process oracle with IDENTICAL update math — pytest runs
    both paths from the same ``init_centroids`` and requires near-bit
    parity of the resulting centroids."""
    xn = _normalize(x.astype(np.float64))
    if init_centroids is None:
        init_centroids = xn[:n_clusters]
    centroids = _normalize(init_centroids.astype(np.float64))
    K = len(centroids)
    for _ in range(n_iter):
        assign = np.argmax(xn @ centroids.T, axis=1)
        sums = np.zeros((K, xn.shape[1]), dtype=np.float64)
        np.add.at(sums, assign, xn)
        counts = np.bincount(assign, minlength=K).astype(np.int64)
        nonzero = counts > 0
        centroids = centroids.copy()
        centroids[nonzero] = sums[nonzero] / counts[nonzero, None]
        centroids = _normalize(centroids)
    return centroids
