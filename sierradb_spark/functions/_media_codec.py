"""Worker-side media 'codec' — import-light on purpose.

This module is what Spark Python workers unpickle for the multimodal
decode stage; it must not import anything from the operator registry
(that would re-enter package __init__ on the worker and hit a circular
import). Only stdlib + pandas here.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

DECODED_SCHEMA = (
    "doc_id long, n_bytes long, sha8 string, fake_width int, fake_height int, "
    "fake_channels int"
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
