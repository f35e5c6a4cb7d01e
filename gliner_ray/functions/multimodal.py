"""Multimodal-column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a metadata struct; the
decode / feature-extract / resize / frame-sample operators are
actor-pool ``map_batches`` stages. The actual codec work is STUBBED
(no image/audio libraries in this container): ``DecodeStub`` raises
``NotImplementedError`` unless constructed with ``fake=True``, in
which case it emits a deterministic hash-derived feature so the
Ray-side plumbing — schema, batch sizing, actor signature, output
layout — is real and tested.

Large binary payloads need small ``batch_size`` so
batch × concurrency fits worker heaps (see ray_guide "Memory-aware");
the defaults here assume ≤ ~8 MiB payloads at batch_size 32.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

if TYPE_CHECKING:  # pragma: no cover
    import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("mime", pa.string()),
        ("payload", pa.binary()),
        ("meta_width", pa.int32()),     # -1 when unknown / n.a.
        ("meta_height", pa.int32()),
        ("meta_duration_ms", pa.int32()),
    ]
)


def synth_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic fake media corpus for plumbing tests."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.bytes(256 + int(rng.randint(0, 2048)))
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["payload"].append(payload)
        rows["meta_width"].append(int(rng.randint(16, 4096)) if kind != "audio" else -1)
        rows["meta_height"].append(int(rng.randint(16, 4096)) if kind != "audio" else -1)
        rows["meta_duration_ms"].append(int(rng.randint(100, 60000)) if kind != "image" else -1)
    return pa.table(
        {n_: pa.array(rows[n_], MEDIA_SCHEMA.field(n_).type) for n_ in MEDIA_SCHEMA.names}
    )


class DecodeStub:
    """Actor-pool decode/feature stage.

    Real implementation would hold the codec context (PIL / libav /
    soundfile) opened once per actor in ``__init__``. The fake path
    derives a 16-dim feature vector + content digest from the payload
    bytes — deterministic, so downstream stages (similarity, dedup)
    are testable end-to-end.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 16):
        if not fake:
            raise NotImplementedError(
                "media codecs are not available in this environment; "
                "construct with fake=True for the deterministic stub"
            )
        self.dim = feature_dim

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats, digests = [], []
        for payload in batch["payload"].to_pylist():
            d = hashlib.sha256(payload).digest()
            feats.append(
                (np.frombuffer((d * ((self.dim * 4) // 32 + 1))[: self.dim * 4],
                               dtype=np.uint32).astype(np.float32)
                 / np.float32(1 << 32)).tolist()
            )
            digests.append(d.hex())
        out = batch.drop_columns(["payload"])  # decoded → payload no longer needed
        out = out.append_column("payload_sha256", pa.array(digests, pa.string()))
        return out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32(), self.dim))
        )


class ResizeStub:
    """Image resize stage (stub): computes the target dims the real
    kernel would produce; passes payload through untouched."""

    def __init__(self, max_side: int = 512, fake: bool = True):
        if not fake:
            raise NotImplementedError("no image libs in this environment")
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        w = batch["meta_width"].to_numpy()
        h = batch["meta_height"].to_numpy()
        scale = np.where(
            (w > 0) & (h > 0),
            np.minimum(1.0, self.max_side / np.maximum(w, h)),
            1.0,
        )
        return batch.append_column(
            "resized_width", pa.array((w * scale).astype(np.int32))
        ).append_column("resized_height", pa.array((h * scale).astype(np.int32)))


def frame_sample_plan_batch(batch: pa.Table, fps: float = 1.0) -> pa.Table:
    """Video frame-sampling plan: one row per video with the list of
    timestamps (ms) the real decoder would extract at ``fps``."""
    plans = []
    for kind, dur in zip(batch["kind"].to_pylist(), batch["meta_duration_ms"].to_pylist()):
        if kind != "video" or dur <= 0:
            plans.append([])
        else:
            step = int(1000 / fps)
            plans.append(list(range(0, dur, step)))
    return batch.append_column("frame_ts_ms", pa.array(plans, pa.list_(pa.int32())))


def decode_features(
    ds: "ray.data.Dataset", fake: bool = True, concurrency=(1, 4), batch_size: int = 32
) -> "ray.data.Dataset":
    return ds.map_batches(
        DecodeStub,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,       # small: payloads are wide rows
        concurrency=concurrency,
    )
