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

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..config import PipelineConfig
from ..kernels.linking import link_variant_edges

if TYPE_CHECKING:  # pragma: no cover
    import ray.data


def edges_from_mentions_batch(batch: pa.Table) -> pa.Table:
    """mentions batch → deduped symmetric variant edges (va, vb).

    Consumes the precomputed ``variant0``/``variant1`` columns (decode
    stage): a mention with two variants contributes the edge both ways;
    single-variant mentions contribute a self-edge so the variant
    appears as a graph node. Batch-local dedup is the
    partial-aggregation step before any global combine.
    """
    v0 = batch["variant0"].to_pylist()
    v1 = batch["variant1"].to_pylist()
    seen: set[tuple[str, str]] = set()
    for a, b in zip(v0, v1):
        if a is None:
            continue
        if b is None:
            seen.add((a, a))
        else:
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


def link_partials_batch(batch: pa.Table) -> pa.Table:
    """One pruned pass over the mentions checkpoint that feeds BOTH
    linking and the entities table: per-batch distinct
    (variant0, variant1, surface, label) with mention counts.

    The driver merges these partials (vocabulary-sized), derives the
    variant edge set for union-find, and builds the entities table —
    one distributed execution instead of two."""
    import pandas as pd

    df = pd.DataFrame(
        {
            "variant0": batch["variant0"].to_pandas(),
            "variant1": batch["variant1"].to_pandas(),
            "surface": batch["text"].to_pandas(),
            "label": batch["label"].to_pandas(),
        }
    )
    agg = (
        df.groupby(["variant0", "variant1", "surface", "label"],
                   as_index=False, dropna=False)
        .size()
        .rename(columns={"size": "n_mentions"})
    )
    return pa.Table.from_pandas(agg, preserve_index=False)


def link_summary_driver(partials: "pd.DataFrame"):  # noqa: F821
    """Merge batch partials on the driver → (entity map, entities table).

    Returns ``(emap, entities_df)`` where emap maps variant → canonical
    entity id and entities_df has columns (entity_id, surface, label,
    n_mentions). Everything here is bounded by the distinct-surface
    vocabulary, not the corpus."""
    import pandas as pd

    merged = (
        partials.groupby(["variant0", "variant1", "surface", "label"],
                         as_index=False, dropna=False)
        .agg(n_mentions=("n_mentions", "sum"))
    )
    edges = []
    for v0, v1 in merged[["variant0", "variant1"]].drop_duplicates().itertuples(index=False):
        if v0 is None or (isinstance(v0, float) and pd.isna(v0)):
            continue
        if v1 is None or (isinstance(v1, float) and pd.isna(v1)):
            edges.append((v0, v0))
        else:
            edges.append((v0, v1))
    emap = entity_map_driver(edges)
    ent = merged[merged["variant0"].notna()].copy()
    ent["entity_id"] = ent["variant0"].map(emap)
    entities_df = (
        ent.groupby(["entity_id", "surface", "label"], as_index=False)
        .agg(n_mentions=("n_mentions", "sum"))
    )
    return emap, entities_df


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

    The per-round label min runs on the bounded
    ``hash(variant) % P`` part key with an in-batch partial-min
    combiner and a per-part vectorized groupby — a raw
    variant-cardinality ``.aggregate(Min)`` pays Ray 2.49's ~1–2 ms
    PER GROUP reduce cost each round (BASELINE.md round-5 cliff
    note), which at web-scale variant counts turns every propagation
    round into minutes.
    """
    from ray.data.aggregate import Sum

    P = max(int(num_partitions), 8)

    def _partial_min(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("variant", sort=False, as_index=False)["label"].min()
        out["part"] = (
            pd.util.hash_array(out["variant"].to_numpy(dtype=object)) % P
        ).astype(np.int64)
        return out

    def _merge_min(g: pd.DataFrame) -> pa.Table:
        # arrow out: labels blocks union with the (arrow) join output,
        # and Ray's batcher cannot mix pandas + arrow block types
        out = g.groupby("variant", sort=False, as_index=False)["label"].min()
        return pa.Table.from_pandas(out, preserve_index=False)

    def _init_part(t: pa.Table) -> pa.Table:
        u = pc.unique(t["va"])
        part = pd.util.hash_array(u.to_numpy(zero_copy_only=False)) % P
        return pa.table(
            {"part": pa.array(part.astype(np.int64), pa.int64()),
             "variant": u, "label": u}
        )

    def _init_dedup(g: pd.DataFrame) -> pa.Table:
        out = g[["variant", "label"]].drop_duplicates("variant", ignore_index=True)
        return pa.Table.from_pandas(out, preserve_index=False)

    edges = edges_ds.materialize()
    # init: label(v) = v (cross-batch distinct via the part idiom)
    labels = (
        edges.select_columns(["va"])
        .map_batches(_init_part, batch_format="pyarrow")
        .groupby("part")
        .map_groups(_init_dedup, batch_format="pandas")
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
            .map_batches(_partial_min, batch_format="pandas", batch_size=65536)
            .groupby("part")
            .map_groups(_merge_min, batch_format="pandas")
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
                        [pc.sum(
                            pc.cast(
                                pc.not_equal(t["label"], t["old_label"]),
                                pa.int64(),
                            )
                        ).as_py() or 0],
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
        ids = batch["variant0"].to_pandas().map(self.entity_map)
        return batch.append_column(
            "entity_id", pa.array(ids.where(ids.notna(), None), pa.string())
        )


def attach_entities(
    mentions_ds: "ray.data.Dataset",
    cfg: PipelineConfig,
    force_distributed: bool = False,
    num_partitions: int = 8,
) -> "ray.data.Dataset":
    """Full [D] stage: returns mentions with an ``entity_id`` column."""
    import ray

    if not force_distributed:
        # driver path: batch-local-deduped edge partials stream straight
        # to the driver (bounded by distinct variants per batch — no
        # groupby shuffle needed before the final pandas dedup)
        edges_raw = mentions_ds.map_batches(
            edges_from_mentions_batch, batch_format="pyarrow"
        )
        edges_df = _collect_small(edges_raw, cfg.link_broadcast_limit)
        if edges_df is not None and len(edges_df):
            edges_df = edges_df.drop_duplicates()
        if edges_df is not None:
            if len(edges_df) == 0 or "va" not in edges_df.columns:
                emap: dict[str, str] = {}  # zero mentions → empty map
            else:
                emap = entity_map_driver(zip(edges_df["va"], edges_df["vb"]))
            ref = ray.put(emap)

            def attach(batch: pa.Table) -> pa.Table:
                # stateless task: ray.get of the broadcast map is a
                # zero-copy-ish plasma read per task (actor-pool variant
                # AttachEntities exists for heavy per-worker state; for
                # a dict lookup, task elasticity beats pool spin-up).
                # vectorized: pandas .map over the precomputed variant0
                emap_local = ray.get(ref)
                ids = batch["variant0"].to_pandas().map(emap_local)
                return batch.append_column(
                    "entity_id", pa.array(ids.where(ids.notna(), None), pa.string())
                )

            return mentions_ds.map_batches(attach, batch_format="pyarrow")
        force_distributed = True
    # scale path: shuffle join on the (precomputed) primary variant
    edges_ds = unique_edges(mentions_ds)
    emap_ds = entity_map_distributed(edges_ds, num_partitions=num_partitions)
    return mentions_ds.join(
        emap_ds,
        join_type="left_outer",
        num_partitions=num_partitions,
        on=("variant0",),
        right_on=("variant",),
    )


def _collect_small(ds: "ray.data.Dataset", limit: int):
    """Materialize a dataset to one pandas frame iff it is small."""
    mat = ds.materialize()
    if mat.count() > limit:
        return None
    return mat.to_pandas()
