"""Worker-side media 'codec' — import-light on purpose.

This module is what Spark Python workers unpickle for the multimodal
decode/feature/resize/frame-sample stages; it must not import anything
from the operator registry (that would re-enter package __init__ on the
worker and hit a circular import). Only stdlib + pandas/numpy here.

Every transform is a deterministic stand-in (the container ships no
image/audio libraries); the Spark-side plumbing — schemas, Arrow batch
iteration, per-stage column pruning — is the real article. Swapping a
fake for PIL/ffmpeg changes only the body of the per-blob function.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, sha8 string, fake_width int, fake_height int, "
    "fake_channels int"
)

FEATURES_SCHEMA = (
    "doc_id long, mean_byte double, std_byte double, entropy double, "
    "n_distinct_bytes int"
)

RESIZED_SCHEMA = (
    "doc_id long, src_width int, src_height int, dst_width int, dst_height int, "
    "scale double"
)

FRAMES_SCHEMA = "doc_id long, frame_no int, frame_offset long, frame_sha8 string"


REAL_DECODED_SCHEMA = (
    "doc_id long, n_bytes long, sha8 string, width int, height int, "
    "channels int, codec string"
)

try:  # capability gate: PIL is optional; header parsing is the fallback
    from PIL import Image as _PILImage  # type: ignore
except Exception:  # pragma: no cover - container ships no PIL
    _PILImage = None


def _parse_image_header(b: bytes) -> tuple[int, int, int] | None:
    """Stdlib-only image header parse: (width, height, channels) for
    PNG / GIF / BMP / JPEG, else None. This is a REAL decode of real
    image bytes (the dimensions come from the file, not a hash) — the
    no-dependency fallback when PIL isn't importable."""
    import struct

    # Malformed/truncated headers must degrade to None (caller falls
    # back to the stub codec), never crash the decode task: one bad
    # blob in a corpus would otherwise fail the whole mapInPandas job.
    try:
        return _parse_image_header_unsafe(b, struct)
    except (IndexError, struct.error):
        return None


def _parse_image_header_unsafe(b: bytes, struct):
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 26 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        color_type = b[25]
        ch = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return (int(w), int(h), ch)
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return (int(w), int(h), 3)
    if b[:2] == b"BM" and len(b) >= 26:
        w, h = struct.unpack("<ii", b[18:26])
        return (int(w), abs(int(h)), 3)
    if b[:2] == b"\xff\xd8":  # JPEG: scan markers for a SOF segment
        i = 2
        while i + 9 < len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            # 0xFF fill bytes may pad between segments (ISO/IEC 10918-1
            # B.1.1.2): skip them, or the next marker byte would be
            # misread as a segment length.
            while i + 1 < len(b) and b[i + 1] == 0xFF:
                i += 1
            marker = b[i + 1]
            if marker == 0xD9:  # EOI: no SOF found
                break
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                i += 2  # standalone markers carry no length
                continue
            seglen = struct.unpack(">H", b[i + 2 : i + 4])[0]
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                h, w = struct.unpack(">HH", b[i + 5 : i + 9])
                return (int(w), int(h), int(b[i + 9]) if i + 9 < len(b) else 3)
            i += 2 + seglen
    return None


def real_decode(blob: bytes) -> tuple[int, int, int, str] | None:
    """Decode an actual image: PIL when importable (full decode), else
    the stdlib header parser. Returns (w, h, channels, codec_name) or
    None when the bytes aren't a recognized image format."""
    if _PILImage is not None:
        import io

        try:
            with _PILImage.open(io.BytesIO(blob)) as im:
                return (im.width, im.height, len(im.getbands()), "pil")
        except Exception:
            return None
    parsed = _parse_image_header(blob)
    if parsed is not None:
        return (*parsed, "header")
    return None


def decode_media_batches_real(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """Capability-gated decode: real codec for recognizable image bytes,
    deterministic stub otherwise. The ``codec`` column records which
    path produced each row ('pil' / 'header' / 'stub'), so a mixed
    corpus is auditable."""
    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            b = bytes(blob)
            dec = real_decode(b)
            if dec is None:
                w, h, c = fake_decode(b)
                codec = "stub"
            else:
                w, h, c, codec = dec
            rows.append(
                (doc_id, len(b), hashlib.sha256(b).hexdigest()[:8], w, h, c, codec)
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_bytes", "sha8", "width", "height", "channels",
                "codec",
            ],
        )


def fake_decode(blob: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for an image decoder.

    Production: replace with PIL.Image.open(io.BytesIO(blob)).size etc.
    The fake derives stable dimensions from the content hash so tests
    can assert exact values.
    """
    h = hashlib.sha256(blob).digest()
    return (64 + h[0] % 192, 64 + h[1] % 192, 3)


def decode_media_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched 'decode': binary in, typed metadata out."""
    for pdf in it:
        blobs = pdf["media"]
        meta = [fake_decode(b) for b in blobs]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(b) for b in blobs],
                "sha8": [hashlib.sha256(b).hexdigest()[:8] for b in blobs],
                "fake_width": [m[0] for m in meta],
                "fake_height": [m[1] for m in meta],
                "fake_channels": [m[2] for m in meta],
            }
        )


def feature_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Byte-level feature extraction (the embed-ready feature vector
    stage): mean/std/entropy/distinct over the raw bytes, vectorized
    with numpy per Arrow batch — the shape a real CNN/CLIP feature
    extractor would have (blob → fixed-width numeric features)."""
    # half-up rounding (not Python's banker's round): engine-portable,
    # so the SQL oracle's floor(x*1e6+0.5)/1e6 computes identical values
    r6 = lambda x: float(np.floor(x * 1e6 + 0.5) / 1e6)  # noqa: E731
    for pdf in it:
        rows = []
        for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
            a = np.frombuffer(bytes(blob), dtype=np.uint8)
            if len(a) == 0:
                rows.append((doc_id, 0.0, 0.0, 0.0, 0))
                continue
            counts = np.bincount(a, minlength=256)
            p = counts[counts > 0] / len(a)
            rows.append(
                (
                    doc_id,
                    r6(float(a.mean())),
                    r6(float(a.std())),
                    r6(float(-(p * np.log2(p)).sum())),
                    int((counts > 0).sum()),
                )
            )
        yield pd.DataFrame(
            rows, columns=["doc_id", "mean_byte", "std_byte", "entropy", "n_distinct_bytes"]
        )


def resize_batches(target: int):
    """'Resize' stage factory: longest side → ``target`` px, aspect kept.
    Production: PIL thumbnail; the geometry math is the real part."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                w, h, _c = fake_decode(bytes(blob))
                scale = target / max(w, h)
                # half-up rounding (not Python's banker's): engine-portable,
                # so the SQL oracle's round() computes identical geometry
                dst_w = int(w * scale + 0.5) or 1
                dst_h = int(h * scale + 0.5) or 1
                rows.append(
                    (doc_id, w, h, dst_w, dst_h, int(scale * 1e6 + 0.5) / 1e6)
                )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "src_width", "src_height", "dst_width",
                         "dst_height", "scale"],
            )

    return run


def frame_sample_batches(n_frames: int, frame_size: int):
    """'Video' frame sampling: treat the blob as a frame container and
    take n evenly-spaced fixed-size frames (ffmpeg -vf fps=... in
    production). Emits one row per sampled frame — a 1→N mapInPandas,
    the fan-out shape that matters for partition sizing downstream."""

    def run(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                b = bytes(blob)
                n_avail = max(len(b) // frame_size, 1)
                take = min(n_frames, n_avail)
                for k in range(take):
                    off = (k * n_avail // take) * frame_size
                    # frame fingerprint over the hex encoding of the byte
                    # range: identical bytes <=> identical hex, and an
                    # ASCII representation lets the SQL oracle re-derive
                    # the hash (blob slicing isn't SQL-portable)
                    frame_hex = b.hex()[off * 2 : (off + frame_size) * 2]
                    rows.append(
                        (
                            doc_id,
                            k,
                            off,
                            hashlib.sha256(frame_hex.encode()).hexdigest()[:8],
                        )
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_no", "frame_offset", "frame_sha8"]
            )

    return run
