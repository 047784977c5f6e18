"""Multimodal column operators (task brief): image/audio/video ride as
opaque ``binary`` columns with typed metadata; decode / feature-extract
run as Arrow-batched pandas UDFs over mapInPandas.

The decode step is STUBBED (no image/audio libs in this container):
``decode_image_stub`` produces a deterministic fake decode (byte
histogram as the "pixel" feature) so the Spark-side plumbing — schema,
batch shape, partitioning, UDF signature — is real and tested. Swap
``_fake_decode`` for a PIL/libav call in production.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

FEATURE_DIM = 16

_SCHEMA = (
    "url string, n_bytes long, magic string, features array<float>"
)


def _fake_decode(buf: bytes) -> np.ndarray:
    """Deterministic stand-in for image decode: normalized 16-bin byte
    histogram. Raises on empty payloads like a real decoder would."""
    if not buf:
        raise ValueError("empty payload")
    arr = np.frombuffer(buf, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=FEATURE_DIM).astype(np.float32)
    return hist / len(arr)


FRAME_SIZE = 256
FRAME_EVERY = 7


def sample_frames(pages: DataFrame, binary_col: str = "html",
                  url_col: str = "url", frame_size: int = FRAME_SIZE,
                  every_k: int = FRAME_EVERY) -> DataFrame:
    """Video frame-sampling plumbing (task brief): the binary payload
    is treated as a fake fixed-size-frame video (a real decoder swaps
    in at `_fake_decode`'s seam); every k-th frame is sampled and
    emitted as its own row with a content digest. The explode happens
    INSIDE the Arrow batch (mapInPandas) — no shuffle, partitioning
    inherited, output rows ≈ payload_bytes / (frame_size·k)."""
    import hashlib

    bcol, ucol = binary_col, url_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, fis, nb, digs = [], [], [], []
            for url, buf in zip(pdf[ucol], pdf[bcol]):
                b = bytes(buf) if buf is not None else b""
                nframes = (len(b) + frame_size - 1) // frame_size
                for fi in range(0, nframes, every_k):
                    chunk = b[fi * frame_size : (fi + 1) * frame_size]
                    urls.append(url)
                    fis.append(fi)
                    nb.append(len(chunk))
                    digs.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "url": urls,
                    "frame_i": pd.Series(fis, dtype="int32"),
                    "frame_bytes": pd.Series(nb, dtype="int64"),
                    "digest": digs,
                }
            )

    return pages.select(ucol, bcol).mapInPandas(
        op, schema="url string, frame_i int, frame_bytes long, digest string"
    )


def extract_features(pages: DataFrame, binary_col: str = "html",
                     url_col: str = "url") -> DataFrame:
    """(url, n_bytes, magic, features[16]) per page. mapInPandas keeps
    batches Arrow-sized; partitioning is inherited (no shuffle)."""
    bcol, ucol = binary_col, url_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            bufs = pdf[bcol]
            feats, nb, magic = [], [], []
            for buf in bufs:
                b = bytes(buf) if buf is not None else b""
                nb.append(len(b))
                magic.append(b[:4].hex())
                feats.append(_fake_decode(b) if b else None)
            yield pd.DataFrame(
                {
                    "url": pdf[ucol],
                    "n_bytes": pd.Series(nb, dtype="int64"),
                    "magic": magic,
                    "features": feats,
                }
            )

    return pages.select(ucol, bcol).mapInPandas(op, schema=_SCHEMA)
