"""The flagship KG-construction pipeline (SURVEY.md §7.0).

::

    files (parquet: repo,path,commit,lang,content)
      → add bucket = sha1(repo) % n_buckets        [skew-bounding partition key]
      → [A] chunk+sha256+tokenize                  map_batches, stateless
      → [B] span scoring                           map_batches actor pool
      → [C] decode+NMS → mentions                  map_batches, stateless
      checkpoint: mentions/ (parquet, partition_cols=[bucket], per-bucket manifest)
      → [D] entity linking                         groupby + union-find / label prop
      → [E] triples + exact dedup                  union + groupby max
      checkpoint: entities/, triples/ (parquet, partitioned by bucket)

Stage 1 (extraction) is resumable per bucket: a bucket whose manifest
records the same input fingerprint is skipped on rerun. Stage 2
(linking+triples) is global — canonical entity ids depend on the full
mention set — so it always recomputes from the stage-1 checkpoint
(cheap relative to scoring; deterministic, hence idempotent).

Everything streams: no ``take_all``/``to_pandas`` on large tables; the
only driver-side materializations are the variant edge set (vocabulary-
sized) and per-bucket fingerprint partials.
"""

from __future__ import annotations

import hashlib
import json
import os
from collections import defaultdict
from typing import TYPE_CHECKING

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.dataset as pads

from .. import __version__
from ..config import DEFAULT_CONFIG, PipelineConfig
from ..stages.decode_stage import make_decoder
from ..stages.linker import attach_entities
from ..stages.normalize import add_bucket_column, make_chunker
from ..stages.scorer import DeterministicScorer
from ..stages.triples import dedup_triples, files_to_triples, mentions_to_triples
from ..state.manifest import BucketManifest, read_manifests, write_manifest

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

FILES_COLUMNS = ["repo", "path", "commit", "lang", "content"]


def _config_hash(cfg: PipelineConfig) -> str:
    return hashlib.sha256(repr(cfg).encode()).hexdigest()[:16]


def read_files(input_path: str, cfg: PipelineConfig) -> "ray.data.Dataset":
    import ray.data as rd

    ds = rd.read_parquet(input_path, columns=FILES_COLUMNS)
    return ds.map_batches(
        lambda t: add_bucket_column(t, cfg.n_buckets), batch_format="pyarrow"
    )


def extract_mentions(
    files_ds: "ray.data.Dataset",
    cfg: PipelineConfig = DEFAULT_CONFIG,
    scorer_cls=DeterministicScorer,
) -> "ray.data.Dataset":
    """Stages [A]→[C]: files → mentions (lazy Dataset)."""
    chunks = files_ds.map_batches(make_chunker(cfg), batch_format="pyarrow")
    concurrency = cfg.scorer_concurrency
    if concurrency is None:
        # autoscaling actor pool sized to the cluster: leave headroom for
        # the read/chunk/decode task stages so no stage starves
        import ray

        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        # fixed pool (not autoscaling): the pool spins up immediately
        # instead of ramping actor-by-actor; 2 CPUs of headroom keep
        # the read/chunk/decode task stages fed
        concurrency = max(2, total_cpus - 2)
    scored = chunks.map_batches(
        scorer_cls,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return scored.map_batches(make_decoder(cfg), batch_format="pyarrow")


def _bucket_fingerprints(files_ds: "ray.data.Dataset") -> dict[int, str]:
    """Per-bucket input fingerprint from (repo, path, commit) only —
    order-independent xor of row-identity hashes + row count.

    Batch-local partials (one row per bucket per batch) keep the
    driver-side reduce tiny regardless of corpus size.
    """

    def partial(batch: pa.Table) -> pa.Table:
        acc: dict[int, list] = defaultdict(lambda: [0, 0])
        for b, repo, path, commit in zip(
            batch["bucket"].to_pylist(),
            batch["repo"].to_pylist(),
            batch["path"].to_pylist(),
            batch["commit"].to_pylist(),
        ):
            h = hashlib.sha256(f"{repo}\x00{path}\x00{commit}".encode()).digest()
            acc[b][0] ^= int.from_bytes(h[:8], "big")
            acc[b][1] += 1
        return pa.table(
            {
                "bucket": pa.array(list(acc), pa.int32()),
                "xh": pa.array([str(v[0]) for v in acc.values()], pa.string()),
                "n": pa.array([v[1] for v in acc.values()], pa.int64()),
            }
        )

    partials = files_ds.map_batches(partial, batch_format="pyarrow").to_pandas()
    out: dict[int, list] = defaultdict(lambda: [0, 0])
    if len(partials) == 0:
        return {}
    for b, xh, n in zip(partials["bucket"], partials["xh"], partials["n"]):
        out[int(b)][0] ^= int(xh)
        out[int(b)][1] += int(n)
    return {b: f"{v[1]}:{v[0]:016x}" for b, v in out.items()}


def _count_dir(dir_path: str) -> int:
    if not os.path.isdir(dir_path):
        return 0
    try:
        return pads.dataset(
            dir_path, format="parquet", partitioning="hive"
        ).count_rows()
    except Exception:
        return 0


def _count_partition_rows(dir_path: str, bucket: int) -> int:
    part_dir = os.path.join(dir_path, f"bucket={bucket}")
    if not os.path.isdir(part_dir):
        return 0
    dataset = pads.dataset(part_dir, format="parquet")
    return dataset.count_rows()


def build_kg(
    input_path: str,
    out_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    resume: bool = True,
    scorer_cls=DeterministicScorer,
    force_distributed_linking: bool = False,
) -> dict:
    """Run the full pipeline; returns a summary metrics dict."""
    import ray.data as rd

    mentions_dir = os.path.join(out_dir, "mentions")
    entities_dir = os.path.join(out_dir, "entities")
    triples_dir = os.path.join(out_dir, "triples")
    cfg_hash = _config_hash(cfg)

    import time as _time

    timings: dict[str, float] = {}
    t0 = _time.perf_counter()
    files_ds = read_files(input_path, cfg)
    fingerprints = _bucket_fingerprints(files_ds)
    timings["fingerprint_sec"] = round(_time.perf_counter() - t0, 3)

    manifests = read_manifests(mentions_dir) if resume else {}
    done = {
        b
        for b, m in manifests.items()
        if m.input_fingerprint == fingerprints.get(b)
        and m.config_hash == cfg_hash
        and m.stage == "mentions"
    }
    todo = sorted(set(fingerprints) - done)

    summary: dict = {
        "buckets_total": len(fingerprints),
        "buckets_skipped": len(done),
        "buckets_processed": len(todo),
    }

    t0 = _time.perf_counter()
    if todo:
        # clear any partial output from an interrupted run of a todo
        # bucket so the partitioned write is effectively atomic per bucket
        for b in todo:
            _clear_dir(os.path.join(mentions_dir, f"bucket={b}"))
        todo_arr = pa.array(todo, pa.int32())
        todo_files = files_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["bucket"], value_set=todo_arr)),
            batch_format="pyarrow",
        )
        mentions = extract_mentions(todo_files, cfg, scorer_cls)
        # partitioned write → resumable layout; one dir per bucket.
        # Coalesce blocks first: a partitioned write emits one file per
        # (block × bucket), and thousands of tiny files make the
        # read-back pay ~10 ms of metadata fetch each.
        mentions.repartition(len(todo)).write_parquet(
            mentions_dir, partition_cols=["bucket"], min_rows_per_file=500_000
        )
        for b in todo:
            write_manifest(
                mentions_dir,
                BucketManifest(
                    bucket=b,
                    input_fingerprint=fingerprints[b],
                    n_input_rows=int(fingerprints[b].split(":")[0]),
                    n_output_rows=_count_partition_rows(mentions_dir, b),
                    stage="mentions",
                    config_hash=cfg_hash,
                    engine_version=__version__,
                ),
            )

    timings["extract_sec"] = round(_time.perf_counter() - t0, 3)

    # ---- stage 2: global linking + triples (always recomputed) ----
    t0 = _time.perf_counter()
    mentions_ds = read_mentions(mentions_dir)
    if mentions_ds is None:  # zero mentions extracted (or empty corpus)
        from ..stages.decode_stage import MENTION_SCHEMA

        mentions_ds = rd.from_arrow(MENTION_SCHEMA.empty_table())
    # pin the linked mentions: they feed BOTH the triples and the
    # entities sinks — without materialize the lazy lineage (scan +
    # linking shuffle) would re-execute once per consumer
    linked = attach_entities(
        mentions_ds, cfg, force_distributed=force_distributed_linking
    ).materialize()
    # file triples need only (repo, path): column-pruned re-read, never
    # the content column
    light_files = rd.read_parquet(input_path, columns=["repo", "path"]).map_batches(
        lambda t: add_bucket_column(t, cfg.n_buckets), batch_format="pyarrow"
    )
    file_triples = light_files.map_batches(files_to_triples, batch_format="pyarrow")
    mention_triples = linked.map_batches(mentions_to_triples, batch_format="pyarrow")
    triples = dedup_triples(file_triples.union(mention_triples))

    # entities table: distinct (entity_id, variant0 surface, label) rows
    entities = _entities_table(linked)

    for d in (entities_dir, triples_dir):
        if os.path.isdir(d):
            _clear_dir(d)
    entities.repartition(4).write_parquet(entities_dir, min_rows_per_file=1_000_000)
    triples.repartition(cfg.n_buckets).write_parquet(
        triples_dir, partition_cols=["bucket"], min_rows_per_file=1_000_000
    )

    n_triples = _count_dir(triples_dir)
    n_mentions = _count_dir(mentions_dir)
    timings["link_triples_sec"] = round(_time.perf_counter() - t0, 3)
    summary.update({"n_mentions": n_mentions, "n_triples": n_triples})
    summary["timings"] = timings
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def read_mentions(mentions_dir: str) -> "ray.data.Dataset | None":
    """Read the stage-1 checkpoint; normalize the hive partition column
    (``bucket``) back to int32 and skip manifest sidecars. Returns None
    when the checkpoint holds no parquet files (zero mentions)."""
    import ray.data as rd

    has_parquet = any(
        f.endswith(".parquet")
        for root, _, fs in os.walk(mentions_dir)
        for f in fs
    ) if os.path.isdir(mentions_dir) else False
    if not has_parquet:
        return None
    ds = rd.read_parquet(mentions_dir, file_extensions=["parquet"])

    def fix(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("bucket")
        return batch.set_column(
            idx, "bucket", pc.cast(batch["bucket"], pa.int32())
        )

    return ds.map_batches(fix, batch_format="pyarrow")


def _entities_table(linked_ds: "ray.data.Dataset") -> "ray.data.Dataset":
    from ray.data.aggregate import Count, Max

    def project(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "entity_id": batch["entity_id"],
                "surface": batch["text"],
                "label": batch["label"],
            }
        )

    return (
        linked_ds.map_batches(project, batch_format="pyarrow")
        .groupby(["entity_id", "surface", "label"], num_partitions=8)
        .aggregate(Count(alias_name="n_mentions"))
    )


def _clear_dir(d: str) -> None:
    import shutil

    shutil.rmtree(d, ignore_errors=True)
