"""Pure-numpy media codecs — REAL decode for the container formats
that need no external library:

- **BMP** (Windows bitmap, uncompressed 24-bit BI_RGB) — the public
  spec is a fixed 54-byte header + bottom-up rows padded to 4 bytes.
- **WAV** (RIFF, 16-bit PCM) — RIFF chunk walk + ``np.frombuffer``.
- **Y4M** (YUV4MPEG2, mono plane) — plain-text stream header +
  ``FRAME`` markers + raw planes; the standard uncompressed video
  interchange format.

These give the multimodal pipeline stages genuine decode / resize /
frame-sample semantics end-to-end; compressed formats (PNG/JPEG/MP3/
MP4) stay import-gated stubs because their codecs aren't in this
environment (see ``multimodal.DecodeStub``).

Every encoder/decoder pair round-trips exactly (pytest-pinned), so
synthetic corpora built with the encoders exercise the real decode
path byte-for-byte.
"""

from __future__ import annotations

import struct

import numpy as np

# --------------------------------------------------------------- BMP


def encode_bmp(rgb: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB → uncompressed 24-bit BI_RGB bytes."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.dtype != np.uint8:
        raise ValueError("expected (H, W, 3) uint8")
    h, w = rgb.shape[:2]
    row_raw = w * 3
    pad = (-row_raw) % 4
    stride = row_raw + pad
    img_size = stride * h
    header = struct.pack(
        "<2sIHHI", b"BM", 54 + img_size, 0, 0, 54
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0
    )
    # bottom-up rows, BGR order, padded
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_raw] = rgb[::-1, :, ::-1].reshape(h, row_raw)
    return header + rows.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB bytes → (H, W, 3) uint8 RGB."""
    if data[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = struct.unpack_from("<I", data, 10)[0]
    hdr_size, w, h = struct.unpack_from("<Iii", data, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", data, 26)
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP: bpp={bpp} compression={compression}")
    flip = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(data, dtype=np.uint8, count=stride * h, offset=off)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]
    return rgb[::-1] if flip else rgb


# --------------------------------------------------------------- WAV


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples ((n,) mono or (n, ch)) → RIFF/WAVE PCM16 bytes."""
    if samples.dtype != np.int16:
        raise ValueError("expected int16 samples")
    if samples.ndim == 1:
        samples = samples[:, None]
    n, ch = samples.shape
    payload = samples.astype("<i2").tobytes()  # interleaved
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    data = (
        b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(payload)) + payload
    )
    return data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 bytes → (rate, (n, ch) int16 samples)."""
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos, rate, ch, payload = 12, None, None, None
    while pos + 8 <= len(data):
        cid = data[pos:pos + 4]
        size = struct.unpack_from("<I", data, pos + 4)[0]
        body = data[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            audio_fmt, ch, rate = struct.unpack_from("<HHI", body, 0)
            bits = struct.unpack_from("<H", body, 14)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV: fmt={audio_fmt} bits={bits}")
        elif cid == b"data":
            payload = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or payload is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(payload, dtype="<i2")
    return rate, samples.reshape(-1, ch)


# --------------------------------------------------------------- Y4M


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """(T, H, W) uint8 mono frames → YUV4MPEG2 (Cmono) bytes."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("expected (T, H, W) uint8")
    t, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode("ascii")
    parts = [head]
    for i in range(t):
        parts.append(b"FRAME\n")
        parts.append(frames[i].tobytes())
    return b"".join(parts)


def decode_y4m(data: bytes) -> tuple[int, np.ndarray]:
    """YUV4MPEG2 (Cmono) bytes → (fps, (T, H, W) uint8 frames)."""
    nl = data.index(b"\n")
    head = data[:nl].decode("ascii", "replace").split()
    if not head or head[0] != "YUV4MPEG2":
        raise ValueError("not a Y4M payload")
    w = h = fps = None
    for tok in head[1:]:
        if tok.startswith("W"):
            w = int(tok[1:])
        elif tok.startswith("H"):
            h = int(tok[1:])
        elif tok.startswith("F"):
            fps = int(tok[1:].split(":")[0])
        elif tok.startswith("C") and tok != "Cmono":
            raise ValueError(f"unsupported Y4M colourspace {tok}")
    if not (w and h and fps):
        raise ValueError("missing W/H/F in Y4M header")
    frame_size = w * h
    frames = []
    pos = nl + 1
    marker = b"FRAME"
    while pos < len(data):
        if data[pos:pos + 5] != marker:
            raise ValueError(f"bad FRAME marker at {pos}")
        pos = data.index(b"\n", pos) + 1
        frames.append(
            np.frombuffer(data, dtype=np.uint8, count=frame_size, offset=pos)
            .reshape(h, w)
        )
        pos += frame_size
    return fps, np.stack(frames) if frames else np.zeros((0, h, w), np.uint8)


# ---------------------------------------------------- numpy kernels


def resize_nearest(rgb: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbour resize via integer index gather (no libs)."""
    h, w = rgb.shape[:2]
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return rgb[yi][:, xi]
