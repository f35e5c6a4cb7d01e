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
from ..stages.triples import (
    dedup_and_write_triples,
    files_to_triples,
    mentions_to_triples,
)
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
    fused: bool = True,
) -> "ray.data.Dataset":
    """Stages [A]→[C]: files → mentions (lazy Dataset).

    ``fused=True`` (default) runs chunk+score+decode inside one actor
    pool — no intermediate chunk table in the object store (see
    ``stages/fused.py``). ``fused=False`` keeps the three separate ops
    (checkpointable/branchable; the shape a GPU scorer pool would use).
    """
    concurrency = cfg.scorer_concurrency
    if concurrency is None:
        import ray

        total_cpus = int(ray.cluster_resources().get("CPU", 4))
        if fused:
            # the fused pool does all the compute; only read+write run
            # outside it — leave them two CPUs
            concurrency = max(2, total_cpus - 2)
        else:
            # separate stages: a pool reserving nearly every CPU
            # starves the stateless chunk/decode ops (measured 2.5×
            # slower with pool = cpus-2 at 32 CPUs)
            concurrency = max(2, (total_cpus * 2) // 3)
    if fused:
        from ..stages.fused import FusedExtractor

        return files_ds.map_batches(
            FusedExtractor,
            fn_constructor_kwargs={"cfg": cfg, "scorer_cls": scorer_cls},
            batch_format="pyarrow",
            batch_size=64,  # files per batch; content rows are wide
            concurrency=concurrency,
            num_cpus=1,
        )
    chunks = files_ds.map_batches(make_chunker(cfg), batch_format="pyarrow")
    scored = chunks.map_batches(
        scorer_cls,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.scorer_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
    return scored.map_batches(make_decoder(cfg), batch_format="pyarrow")


def _input_metadata_fingerprint(input_path: str) -> str:
    """Whole-input fingerprint from parquet FOOTER metadata only
    (file name, size, row count) — no data scan.

    Invalidation granularity trades off against resume cost: a
    row-level per-bucket hash would cost a full column scan on every
    resume attempt (prohibitive at 10^12 files), so manifests bind a
    bucket's completion to this cheap global fingerprint instead.
    Input changed at all → every bucket recomputes; input unchanged →
    completed buckets skip. Completion granularity stays per-bucket.
    """
    parts = []
    if os.path.isdir(input_path):
        names = sorted(
            f for f in os.listdir(input_path) if f.endswith(".parquet")
        )
        paths = [os.path.join(input_path, f) for f in names]
    else:
        paths = [input_path]
    import pyarrow.parquet as pq

    for p in paths:
        md = pq.ParquetFile(p).metadata
        parts.append(f"{os.path.basename(p)}:{os.path.getsize(p)}:{md.num_rows}")
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:24]


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
    input_fp = _input_metadata_fingerprint(input_path)
    all_buckets = set(range(cfg.n_buckets))
    timings["fingerprint_sec"] = round(_time.perf_counter() - t0, 3)

    manifests = read_manifests(mentions_dir) if resume else {}
    done = {
        b
        for b, m in manifests.items()
        if m.input_fingerprint == input_fp
        and m.config_hash == cfg_hash
        and m.stage == "mentions"
    }
    todo = sorted(all_buckets - done)

    summary: dict = {
        "buckets_total": len(all_buckets),
        "buckets_skipped": len(done),
        "buckets_processed": len(todo),
    }

    t0 = _time.perf_counter()
    if todo:
        # clear any partial output from an interrupted run of a todo
        # bucket so the partitioned write is effectively atomic per bucket
        for b in todo:
            _clear_dir(os.path.join(mentions_dir, f"bucket={b}"))
        if set(todo) == all_buckets:
            todo_files = files_ds  # fresh run: no filter stage needed
        else:
            todo_arr = pa.array(todo, pa.int32())
            todo_files = files_ds.map_batches(
                lambda t: t.filter(pc.is_in(t["bucket"], value_set=todo_arr)),
                batch_format="pyarrow",
            )
        mentions = extract_mentions(todo_files, cfg, scorer_cls)
        # resumable layout: hive-partitioned by bucket. repartition
        # first — a partitioned write emits one file per (block ×
        # bucket) otherwise (~1000 tiny files whose read-back pays
        # ~10 ms of metadata each). A/B vs a groupby(bucket) direct
        # write: coalesce+hive is ~15 s cheaper at 8 CPUs (the
        # sort-shuffle of the full mention set loses to the
        # shuffle-less coalesce).
        mentions.repartition(len(todo)).write_parquet(
            mentions_dir, partition_cols=["bucket"], min_rows_per_file=500_000
        )
        for b in todo:
            write_manifest(
                mentions_dir,
                BucketManifest(
                    bucket=b,
                    input_fingerprint=input_fp,
                    n_input_rows=-1,  # row-level counts would need a scan
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

    for d in (entities_dir, triples_dir):
        if os.path.isdir(d):
            _clear_dir(d)

    if force_distributed_linking:
        # scale path: distributed label propagation + shuffle join;
        # pinned once because it feeds two consumers
        linked = attach_entities(
            mentions_ds, cfg, force_distributed=True
        ).materialize()
        entities = _entities_table(linked)
        entities.write_parquet(entities_dir, min_rows_per_file=1_000_000)
    else:
        # broadcast path: ONE column-pruned pass over the checkpoint
        # yields both the variant edge set (→ driver union-find →
        # broadcast map) and the entities table (vocabulary-sized,
        # merged and written driver-side)
        import ray

        from ..stages.linker import link_partials_batch, link_summary_driver

        partial_cols = ["variant0", "variant1", "text", "label"]
        partials_ds = (
            rd.read_parquet(
                mentions_dir, columns=partial_cols, file_extensions=["parquet"]
            )
            if _has_parquet(mentions_dir)
            else mentions_ds.select_columns(partial_cols)
        )
        partials = partials_ds.map_batches(
            link_partials_batch, batch_format="pyarrow"
        ).to_pandas()
        # quarantined rows (label tag, see stages/decode_stage.py) are
        # counted but never linked — their variant columns are null
        from ..stages.decode_stage import QUARANTINE_LABEL

        if len(partials):
            qmask = partials["label"] == QUARANTINE_LABEL
            summary["n_quarantined"] = int(partials.loc[qmask, "n_mentions"].sum())
            partials = partials[~qmask]
        else:
            summary["n_quarantined"] = 0
        emap, entities_df = link_summary_driver(partials)
        os.makedirs(entities_dir, exist_ok=True)
        _write_entities_df(entities_df, entities_dir)
        ref = ray.put(emap)

        def attach_fn(batch: pa.Table) -> pa.Table:
            emap_local = ray.get(ref)  # plasma read per task, no copy
            ids = batch["variant0"].to_pandas().map(emap_local)
            return batch.append_column(
                "entity_id", pa.array(ids.where(ids.notna(), None), pa.string())
            )

        linked = mentions_ds.map_batches(attach_fn, batch_format="pyarrow")

    # file triples need only (repo, path): column-pruned re-read, never
    # the content column
    light_files = rd.read_parquet(input_path, columns=["repo", "path"]).map_batches(
        lambda t: add_bucket_column(t, cfg.n_buckets), batch_format="pyarrow"
    )
    file_triples = light_files.map_batches(files_to_triples, batch_format="pyarrow")
    mention_triples = linked.map_batches(mentions_to_triples, batch_format="pyarrow")
    # dedup + partitioned write fused into ONE bucket shuffle
    # (duplicates share repo hence bucket — see dedup_and_write_triples)
    triple_counts = dedup_and_write_triples(
        file_triples.union(mention_triples), triples_dir
    )

    n_triples = sum(triple_counts.values())
    n_mentions = _count_dir(mentions_dir)
    timings["link_triples_sec"] = round(_time.perf_counter() - t0, 3)
    summary.update({"n_mentions": n_mentions, "n_triples": n_triples})
    summary["timings"] = timings
    with open(os.path.join(out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return summary


def _write_mentions_partitioned(
    mentions_ds: "ray.data.Dataset",
    mentions_dir: str,
    n_buckets: int,
    write_tasks: int = 64,
) -> dict[int, int]:
    """Bucket-isolated mention checkpoint via sub-partitioned direct
    writes: shuffle key = ``bucket * S + hash(doc) % S`` (one small
    int), each group task writes ``bucket=K/part-J.parquet`` atomically.
    Write parallelism = ``write_tasks`` (not n_buckets), file count =
    ``write_tasks``, per-bucket dirs stay independently deletable for
    resume, and the per-bucket row counts come back for the manifests —
    all in ONE int-keyed shuffle (no repartition barrier + hive write,
    which costs ~20 s at 4.5M mentions)."""
    import pandas as pd
    import pyarrow.parquet as pq

    sub = max(1, write_tasks // max(1, n_buckets))

    def add_wpart(batch: pa.Table) -> pa.Table:
        h = pd.util.hash_pandas_object(
            batch["doc_sha256"].to_pandas(), index=False
        ).to_numpy()
        wpart = batch["bucket"].to_numpy() * sub + (h % sub)
        return batch.append_column("wpart", pa.array(wpart.astype("int32"), pa.int32()))

    def write_group(g: pa.Table) -> pa.Table:
        w = g["wpart"][0].as_py()
        b, j = w // sub, w % sub
        d = os.path.join(mentions_dir, f"bucket={b}")
        os.makedirs(d, exist_ok=True)
        tmp = os.path.join(d, f".part-{j}.parquet.tmp")
        pq.write_table(g.drop_columns(["bucket", "wpart"]), tmp)
        os.replace(tmp, os.path.join(d, f"part-{j}.parquet"))
        return pa.table(
            {"bucket": pa.array([b], pa.int32()),
             "rows": pa.array([g.num_rows], pa.int64())}
        )

    stats = (
        mentions_ds.map_batches(add_wpart, batch_format="pyarrow", batch_size=131072)
        .groupby("wpart")
        .map_groups(write_group, batch_format="pyarrow")
        .to_pandas()
    )
    out: dict[int, int] = {}
    for _, r in stats.iterrows():
        out[int(r["bucket"])] = out.get(int(r["bucket"]), 0) + int(r["rows"])
    return out


def _has_parquet(dir_path: str) -> bool:
    if not os.path.isdir(dir_path):
        return False
    return any(
        f.endswith(".parquet") for _, _, fs in os.walk(dir_path) for f in fs
    )


def _write_entities_df(entities_df, entities_dir: str) -> None:
    import pyarrow.parquet as pq

    schema = pa.schema(
        [
            ("entity_id", pa.string()),
            ("surface", pa.string()),
            ("label", pa.string()),
            ("n_mentions", pa.int64()),
        ]
    )
    if len(entities_df) == 0:
        table = schema.empty_table()
    else:
        table = pa.Table.from_pandas(
            entities_df[["entity_id", "surface", "label", "n_mentions"]],
            preserve_index=False,
        ).cast(schema)
    pq.write_table(table, os.path.join(entities_dir, "part-00000.parquet"))


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
    """Distinct (entity_id, surface, label) + mention counts — same
    hash-partition + pandas-combine pattern as dedup_triples, with a
    batch-local partial count first so the shuffle carries one row per
    distinct key per batch."""
    import pandas as pd

    def partial(batch: pa.Table) -> pa.Table:
        df = pd.DataFrame(
            {
                "entity_id": batch["entity_id"].to_pandas(),
                "surface": batch["text"].to_pandas(),
                "label": batch["label"].to_pandas(),
            }
        )
        agg = df.groupby(["entity_id", "surface", "label"], as_index=False).size()
        agg = agg.rename(columns={"size": "n_mentions"})
        h = pd.util.hash_pandas_object(agg["entity_id"], index=False).to_numpy()
        agg["part"] = (h % 8).astype("int32")
        return pa.Table.from_pandas(agg, preserve_index=False)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        return g.groupby(["entity_id", "surface", "label"], as_index=False).agg(
            n_mentions=("n_mentions", "sum")
        )

    return (
        linked_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("part")
        .map_groups(combine, batch_format="pandas")
    )


def _clear_dir(d: str) -> None:
    import shutil

    shutil.rmtree(d, ignore_errors=True)
