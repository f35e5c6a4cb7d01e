"""Multimodal columns: opaque binary payloads + typed metadata, with
REAL decode for library-free container formats.

Images/audio/video are ``binary`` columns with a metadata struct; the
decode / feature-extract / resize / frame-sample operators are
actor-pool ``map_batches`` stages. Decode is GENUINE for the formats a
pure-numpy codec can handle — BMP (24-bit), WAV (PCM16), Y4M (mono) —
via ``functions/codecs.py``; compressed formats (PNG/JPEG/MP3/MP4)
remain import-gated stubs (``DecodeStub``) because their codecs are
not in this container.

Large binary payloads need small ``batch_size`` so
batch × concurrency fits worker heaps (see ray_guide "Memory-aware");
the defaults here assume ≤ ~8 MiB payloads at batch_size 32.
"""

from __future__ import annotations

import hashlib
from typing import TYPE_CHECKING

import numpy as np
import pyarrow as pa

from . import codecs

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

FEATURE_DIM = 16


def synth_media_table(n: int = 32, seed: int = 42) -> pa.Table:
    """Deterministic media corpus of REAL payloads: BMP images, PCM16
    WAV clips, and mono Y4M videos (encoded by ``functions/codecs``,
    so the decode stages below exercise genuine byte-level parsing)."""
    rng = np.random.RandomState(seed)
    kinds = ["image", "audio", "video"]
    rows = {name: [] for name in MEDIA_SCHEMA.names}
    for i in range(n):
        kind = kinds[i % 3]
        if kind == "image":
            w, h = int(rng.randint(8, 64)), int(rng.randint(8, 64))
            payload = codecs.encode_bmp(
                rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
            )
            width, height, dur = w, h, -1
            mime = "image/bmp"
        elif kind == "audio":
            rate = 8000
            n_samp = int(rng.randint(400, 4000))
            payload = codecs.encode_wav(
                (rng.randn(n_samp) * 3000).astype(np.int16), rate
            )
            width = height = -1
            dur = int(n_samp * 1000 / rate)
            mime = "audio/wav"
        else:
            w, h = int(rng.randint(8, 32)), int(rng.randint(8, 32))
            t = int(rng.randint(2, 12))
            fps = 5
            payload = codecs.encode_y4m(
                rng.randint(0, 256, size=(t, h, w)).astype(np.uint8), fps=fps
            )
            width, height = w, h
            dur = int(t * 1000 / fps)
            mime = "video/x-yuv4mpeg"
        rows["media_id"].append(i)
        rows["kind"].append(kind)
        rows["mime"].append(mime)
        rows["payload"].append(payload)
        rows["meta_width"].append(width)
        rows["meta_height"].append(height)
        rows["meta_duration_ms"].append(dur)
    return pa.table(
        {n_: pa.array(rows[n_], MEDIA_SCHEMA.field(n_).type) for n_ in MEDIA_SCHEMA.names}
    )


def _pad_feature(vals: list[float]) -> list[float]:
    out = [float(v) for v in vals[:FEATURE_DIM]]
    return out + [0.0] * (FEATURE_DIM - len(out))


class Decoder:
    """REAL decode + feature extraction per modality (actor-pool stage;
    state such as codec dispatch tables is built once per actor).

    - image/bmp  → width, height, per-channel mean + std, 8-bin
      luminance histogram (normalized)
    - audio/wav  → rate-derived duration, RMS, zero-crossing rate,
      8-bin level histogram
    - video/y4m  → n_frames, fps, temporal mean-brightness profile
      (first 13 frames)

    Unknown/compressed mimes raise per-row into a ``decode_error``
    column (quarantine semantics — never drop, never crash the batch).
    """

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats: list[list[float]] = []
        digests: list[str] = []
        widths, heights, durs, errs = [], [], [], []
        for mime, payload in zip(batch["mime"].to_pylist(), batch["payload"].to_pylist()):
            digests.append(hashlib.sha256(payload).hexdigest())
            try:
                if mime == "image/bmp":
                    rgb = codecs.decode_bmp(payload)
                    h, w = rgb.shape[:2]
                    lum = rgb.astype(np.float32).mean(axis=2)
                    hist = np.histogram(lum, bins=8, range=(0, 256))[0]
                    hist = hist / max(1, lum.size)
                    feats.append(_pad_feature(
                        [w, h, *rgb.reshape(-1, 3).mean(axis=0),
                         *rgb.reshape(-1, 3).std(axis=0), *hist]))
                    widths.append(w); heights.append(h); durs.append(-1)
                elif mime == "audio/wav":
                    rate, samples = codecs.decode_wav(payload)
                    x = samples[:, 0].astype(np.float32) / 32768.0
                    rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
                    zcr = float(np.mean(np.abs(np.diff(np.signbit(x))))) if len(x) > 1 else 0.0
                    hist = np.histogram(x, bins=8, range=(-1, 1))[0] / max(1, len(x))
                    dur = int(len(x) * 1000 / rate)
                    feats.append(_pad_feature([rate, len(x), dur, rms, zcr, *hist]))
                    widths.append(-1); heights.append(-1); durs.append(dur)
                elif mime == "video/x-yuv4mpeg":
                    fps, frames = codecs.decode_y4m(payload)
                    t, h, w = frames.shape
                    profile = frames.reshape(t, -1).mean(axis=1) / 255.0
                    feats.append(_pad_feature([t, fps, w, *profile[:13]]))
                    widths.append(w); heights.append(h)
                    durs.append(int(t * 1000 / fps))
                else:
                    raise NotImplementedError(f"no codec for {mime}")
                errs.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine contract
                feats.append([0.0] * FEATURE_DIM)
                widths.append(-1); heights.append(-1); durs.append(-1)
                errs.append(f"{type(e).__name__}: {e}"[:200])
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload_sha256", pa.array(digests, pa.string()))
        out = out.append_column("decoded_width", pa.array(widths, pa.int32()))
        out = out.append_column("decoded_height", pa.array(heights, pa.int32()))
        out = out.append_column("decoded_duration_ms", pa.array(durs, pa.int32()))
        out = out.append_column("decode_error", pa.array(errs, pa.string()))
        return out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32(), FEATURE_DIM))
        )


class DecodeStub:
    """Import-gated stub for compressed formats (PNG/JPEG/MP3/MP4):
    the real implementation would hold the codec context (PIL / libav /
    soundfile) opened once per actor in ``__init__``. The fake path
    derives a deterministic hash feature so plumbing stays testable."""

    def __init__(self, fake: bool = False, feature_dim: int = FEATURE_DIM):
        if not fake:
            raise NotImplementedError(
                "compressed-format codecs are not available in this "
                "environment; construct with fake=True for the stub, or "
                "use Decoder for BMP/WAV/Y4M payloads"
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
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload_sha256", pa.array(digests, pa.string()))
        return out.append_column(
            "feature", pa.array(feats, pa.list_(pa.float32(), self.dim))
        )


class Resize:
    """REAL image resize: decode BMP → nearest-neighbour downscale to
    ``max_side`` → re-encode BMP. Non-image payloads pass through."""

    def __init__(self, max_side: int = 512):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads, ws, hs = [], [], []
        for mime, payload in zip(batch["mime"].to_pylist(), batch["payload"].to_pylist()):
            if mime != "image/bmp":
                payloads.append(payload); ws.append(-1); hs.append(-1)
                continue
            rgb = codecs.decode_bmp(payload)
            h, w = rgb.shape[:2]
            scale = min(1.0, self.max_side / max(w, h))
            ow, oh = max(1, int(w * scale)), max(1, int(h * scale))
            if (ow, oh) != (w, h):
                rgb = codecs.resize_nearest(rgb, ow, oh)
                payload = codecs.encode_bmp(np.ascontiguousarray(rgb))
            payloads.append(payload); ws.append(ow); hs.append(oh)
        out = batch.set_column(
            batch.schema.get_field_index("payload"), "payload",
            pa.array(payloads, pa.binary()),
        )
        return out.append_column(
            "resized_width", pa.array(ws, pa.int32())
        ).append_column("resized_height", pa.array(hs, pa.int32()))


class ResizeStub:
    """Dims-only resize plan for payloads we can't decode (kept for
    the stub pipeline; pass ``fake=False`` to assert gating)."""

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


def frame_sample_batch(batch: pa.Table, fps: float = 1.0) -> pa.Table:
    """REAL video frame sampling: decode Y4M, keep frames at ``fps``,
    emit sampled timestamps + per-sampled-frame mean brightness."""
    ts_col, mean_col = [], []
    for mime, payload in zip(batch["mime"].to_pylist(), batch["payload"].to_pylist()):
        if mime != "video/x-yuv4mpeg":
            ts_col.append([]); mean_col.append([])
            continue
        src_fps, frames = codecs.decode_y4m(payload)
        step = max(1, int(round(src_fps / fps)))
        idx = np.arange(0, len(frames), step)
        ts_col.append([int(i * 1000 / src_fps) for i in idx])
        mean_col.append(
            [float(frames[i].mean() / 255.0) for i in idx]
        )
    return batch.append_column(
        "frame_ts_ms", pa.array(ts_col, pa.list_(pa.int32()))
    ).append_column("frame_mean", pa.array(mean_col, pa.list_(pa.float32())))


def frame_sample_plan_batch(batch: pa.Table, fps: float = 1.0) -> pa.Table:
    """Metadata-only sampling plan (for payloads without a decoder)."""
    plans = []
    for kind, dur in zip(batch["kind"].to_pylist(), batch["meta_duration_ms"].to_pylist()):
        if kind != "video" or dur <= 0:
            plans.append([])
        else:
            step = int(1000 / fps)
            plans.append(list(range(0, dur, step)))
    return batch.append_column("frame_ts_ms", pa.array(plans, pa.list_(pa.int32())))


def decode_features(
    ds: "ray.data.Dataset", fake: bool = False, concurrency=(1, 4), batch_size: int = 32
) -> "ray.data.Dataset":
    """Actor-pool decode stage: real ``Decoder`` by default; the
    hash-feature ``DecodeStub`` when ``fake=True`` (compressed-format
    pipelines)."""
    if fake:
        return ds.map_batches(
            DecodeStub,
            fn_constructor_kwargs={"fake": True},
            batch_format="pyarrow",
            batch_size=batch_size,   # small: payloads are wide rows
            concurrency=concurrency,
        )
    return ds.map_batches(
        Decoder,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
