"""Stage [D] — entity linking & canonicalization.

Mentions sharing any normalization variant (``kernels/normalize.py``)
merge into one canonical entity (connected component over the variant
graph; canonical id = min variant). Two execution paths, identical
results:

- **driver union-find** (default when the distinct-variant edge set is
  small): the variant graph is vocabulary-sized — orders of magnitude
  smaller than the mentions table — so after a distributed
  edge-dedup ``groupby``, the edges are collected and the same
  ``kernels/linking.link_variant_edges`` kernel the oracle uses runs
  once on the driver. This is the "broadcast small side" pattern: the
  resulting variant→entity map is ``ray.put`` once and read per actor.
- **distributed min-label propagation** (scale path, forced via
  ``force_distributed`` or when the edge set exceeds
  ``cfg.link_broadcast_limit``): iterate ``label(dst) =
  min(label(src))`` over symmetric edges with ``Dataset.join`` +
  ``groupby(variant).min`` until fixpoint — the groupby-aggregate
  union-find merge of the north rule. Converges in O(component
  diameter) rounds; each round touches only the (small) variant graph,
  never the mentions table.

The reference has no linking stage; nearest analogs are its lowercase
normalization (``evaluation/evaluate.py:76``) and case-insensitive
surface matching (``data/process_nuner.py:22-30``).
"""

from __future__ import annotations

from typing import TYPE_CHECKING

import pyarrow as pa

from ..config import PipelineConfig
from ..kernels.linking import link_variant_edges
from ..kernels.normalize import variants

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def edges_from_mentions_batch(batch: pa.Table) -> pa.Table:
    """mentions batch → deduped symmetric variant edges (va, vb).

    A mention's variant list [v0, v1, ...] contributes chain edges
    (v0,v1), (v1,v2)...; single-variant mentions contribute a self-edge
    so the variant appears as a graph node. Batch-local dedup is the
    partial-aggregation step before the global edge groupby.
    """
    seen: set[tuple[str, str]] = set()
    for text in batch["text"].to_pylist():
        vs = variants(text)
        if not vs:
            continue
        if len(vs) == 1:
            seen.add((vs[0], vs[0]))
        else:
            for a, b in zip(vs, vs[1:]):
                seen.add((a, b))
                seen.add((b, a))
    if seen:
        va, vb = zip(*sorted(seen))
    else:
        va, vb = (), ()
    return pa.table({"va": pa.array(list(va), pa.string()),
                     "vb": pa.array(list(vb), pa.string())})


def unique_edges(mentions_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    """Distributed edge extraction + global dedup (small shuffle)."""
    from ray.data.aggregate import Count

    edges = mentions_ds.map_batches(edges_from_mentions_batch, batch_format="pyarrow")
    return edges.groupby(["va", "vb"], num_partitions=8).aggregate(Count(alias_name="n")).drop_columns(["n"])


def entity_map_driver(edge_pairs) -> dict[str, str]:
    """Driver-side union-find over the (small) deduped edge set."""
    return link_variant_edges(edge_pairs)


def entity_map_distributed(
    edges_ds: "ray.data.Dataset",
    num_partitions: int = 8,
    max_rounds: int = 32,
) -> "ray.data.Dataset":
    """Min-label propagation → Dataset(variant, entity_id).

    ``edges_ds`` must be symmetric (both directions present; self-edges
    for singletons). Each round: proposal(dst) = label(src) over every
    edge, new label = min(proposals ∪ current); stop when no label
    changed (an aggregate over the small label table).
    """
    from ray.data.aggregate import Min, Sum

    edges = edges_ds.materialize()
    # init: label(v) = v
    labels = (
        edges.select_columns(["va"])
        .groupby("va")
        .aggregate(Min("va", alias_name="label"))
        .rename_columns({"va": "variant"})
        .materialize()
    )
    for _ in range(max_rounds):
        proposals = (
            edges.join(
                labels,
                join_type="inner",
                num_partitions=num_partitions,
                on=("va",),
                right_on=("variant",),
            )
            .select_columns(["vb", "label"])
            .rename_columns({"vb": "variant"})
        )
        new_labels = (
            proposals.union(labels.select_columns(["variant", "label"]))
            .groupby("variant")
            .aggregate(Min("label", alias_name="label"))
            .materialize()
        )
        changed = (
            new_labels.join(
                labels.rename_columns({"label": "old_label"}),
                join_type="inner",
                num_partitions=num_partitions,
                on=("variant",),
            )
            .map_batches(
                lambda t: pa.table(
                    {"c": pa.array(
                        [sum(1 for a, b in zip(t["label"].to_pylist(),
                                               t["old_label"].to_pylist()) if a != b)],
                        pa.int64())}
                ),
                batch_format="pyarrow",
            )
            .aggregate(Sum("c", alias_name="changed"))
        )
        labels = new_labels
        if not changed or changed.get("changed", 0) == 0:
            break
    return labels.map_batches(
        lambda t: pa.table(
            {
                "variant": t["variant"],
                "entity_id": pa.array(
                    ["ent:" + v for v in t["label"].to_pylist()], pa.string()
                ),
            }
        ),
        batch_format="pyarrow",
    )


class AttachEntities:
    """Broadcast-lookup stage: mentions batch + (ray.put) variant→entity
    map → ``entity_id`` column. Actor pool so ``ray.get`` of the
    broadcast map happens once per actor, not per batch."""

    def __init__(self, entity_map_ref):
        import ray

        self.entity_map: dict[str, str] = (
            ray.get(entity_map_ref) if not isinstance(entity_map_ref, dict) else entity_map_ref
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = []
        for text in batch["text"].to_pylist():
            vs = variants(text)
            ids.append(self.entity_map.get(vs[0]) if vs else None)
        return batch.append_column("entity_id", pa.array(ids, pa.string()))


def add_primary_variant(batch: pa.Table) -> pa.Table:
    v0 = [vs[0] if (vs := variants(t)) else None for t in batch["text"].to_pylist()]
    return batch.append_column("variant0", pa.array(v0, pa.string()))


def attach_entities(
    mentions_ds: "ray.data.Dataset",
    cfg: PipelineConfig,
    force_distributed: bool = False,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Full [D] stage: returns mentions with an ``entity_id`` column."""
    import ray

    edges_ds = unique_edges(mentions_ds)
    if not force_distributed:
        edges_df = _collect_small(edges_ds, cfg.link_broadcast_limit)
        if edges_df is not None:
            if len(edges_df) == 0 or "va" not in edges_df.columns:
                emap: dict[str, str] = {}  # zero mentions → empty map
            else:
                emap = entity_map_driver(zip(edges_df["va"], edges_df["vb"]))
            ref = ray.put(emap)
            return mentions_ds.map_batches(
                AttachEntities,
                fn_constructor_kwargs={"entity_map_ref": ref},
                batch_format="pyarrow",
                concurrency=(1, 8),
            )
        force_distributed = True
    # scale path: shuffle join on the primary variant
    emap_ds = entity_map_distributed(edges_ds, num_partitions=num_partitions)
    with_v0 = mentions_ds.map_batches(add_primary_variant, batch_format="pyarrow")
    return with_v0.join(
        emap_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("variant0",),
        right_on=("variant",),
    ).drop_columns(["variant0"])


def _collect_small(ds: "ray.data.Dataset", limit: int):
    """Materialize a dataset to one pandas frame iff it is small."""
    mat = ds.materialize()
    if mat.count() > limit:
        return None
    return mat.to_pandas()
