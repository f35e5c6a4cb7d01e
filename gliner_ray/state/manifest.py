"""Per-partition lineage manifests — the resume/checkpoint contract.

Each pipeline stage writes its output Parquet partitioned by
``bucket = sha1(repo) % n_buckets``; after a bucket's rows are fully
written, a ``_manifest_bucket=K.json`` records the input fingerprint
(row count + order-independent sha256-xor of the bucket's doc hashes),
row counts, config hash and engine version. A rerun recomputes the
input fingerprint per bucket and skips buckets whose manifest matches
— that is "checkpoint-resumable stages with per-partition lineage +
metrics" (north rule; SURVEY.md §4 checkpoint/resume row).

The reference has no inference-side checkpointing (training
``save_steps`` only, ``train.py:111``); this is new-engine
functionality required at 10^12-file scale.
"""

from __future__ import annotations

import json
import os
from dataclasses import asdict, dataclass


@dataclass
class BucketManifest:
    bucket: int
    input_fingerprint: str   # xor-combined sha256 of input docs + count
    n_input_rows: int
    n_output_rows: int
    stage: str               # "mentions" | "triples" | ...
    config_hash: str
    engine_version: str

    def path(self, out_dir: str) -> str:
        return manifest_path(out_dir, self.bucket)


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, f"_manifest_bucket={bucket}.json")


def write_manifest(out_dir: str, m: BucketManifest) -> None:
    os.makedirs(out_dir, exist_ok=True)
    tmp = m.path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(asdict(m), f, indent=1, sort_keys=True)
    os.replace(tmp, m.path(out_dir))  # atomic publish


def read_manifests(out_dir: str) -> dict[int, BucketManifest]:
    out: dict[int, BucketManifest] = {}
    if not os.path.isdir(out_dir):
        return out
    for name in os.listdir(out_dir):
        if name.startswith("_manifest_bucket=") and name.endswith(".json"):
            with open(os.path.join(out_dir, name)) as f:
                data = json.load(f)
            m = BucketManifest(**data)
            out[m.bucket] = m
    return out


def xor_fingerprint(hex_hashes: list[str], n_rows: int) -> str:
    """Order-independent fingerprint: xor of sha256 ints, plus count."""
    acc = 0
    for h in hex_hashes:
        acc ^= int(h[:16], 16)
    return f"{n_rows}:{acc:016x}"
