"""Multimodal column operators (task brief): image/audio/video ride as
opaque ``binary`` columns with typed metadata; decode / feature-extract
run as Arrow-batched pandas UDFs over mapInPandas.

Decode is REAL for uncompressed BMP (``decode_bmp`` — a from-scratch
pure-numpy reader of the public BMP/DIB spec, same discipline as the
shapefile/GeoPackage parsers: 24/32-bpp BI_RGB, 4-byte row padding,
bottom-up AND top-down orientations) feeding ``image_features``
(width/height/per-channel means + an order-sensitive pixel-weighted
sum, so a row-order or padding bug cannot hide in an order-invariant
mean). Other formats (JPEG/PNG/audio/video need codec libs this
container lacks) fall back to the deterministic byte-histogram stub —
``_fake_decode`` documents the swap-in seam for PIL/libav.
"""

from __future__ import annotations

import struct
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


def decode_bmp(buf: bytes) -> np.ndarray:
    """Decode an uncompressed BMP (BITMAPINFOHEADER, 24/32 bpp,
    BI_RGB) → (height, width, 3) uint8 RGB in TOP-DOWN row order.

    Spec facts this implements (the classic traps):
    - pixel rows are padded to 4-byte multiples (24 bpp ⇒ w*3 rounded
      up); the pad bytes are not pixel data
    - positive biHeight ⇒ rows are stored BOTTOM-UP (file row 0 is the
      image's last row); negative ⇒ top-down
    - channels are stored B,G,R(,A) — returned as R,G,B
    """
    if len(buf) < 54 or buf[:2] != b"BM":
        raise ValueError("not a BMP: missing 'BM' magic")
    data_off = struct.unpack_from("<I", buf, 10)[0]
    hdr_size, w, h = struct.unpack_from("<IiI", buf, 14)[0], *struct.unpack_from("<ii", buf, 18)
    planes, bpp = struct.unpack_from("<HH", buf, 26)
    compression = struct.unpack_from("<I", buf, 30)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported DIB header size {hdr_size}")
    if compression != 0:
        raise ValueError(f"unsupported BMP compression {compression}")
    if bpp not in (24, 32):
        raise ValueError(f"unsupported bit depth {bpp}")
    topdown = h < 0
    h = abs(h)
    if w <= 0 or h == 0:
        raise ValueError(f"bad dimensions {w}x{h}")
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    need = data_off + stride * h
    if len(buf) < need:
        raise ValueError(f"truncated BMP: need {need} bytes, have {len(buf)}")
    rows = np.frombuffer(buf, dtype=np.uint8, count=stride * h, offset=data_off)
    rows = rows.reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not topdown:
        rows = rows[::-1]
    # BGR(A) → RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


def encode_bmp(pixels: np.ndarray, topdown: bool = False) -> bytes:
    """Encode (h, w, 3) uint8 RGB as a 24-bpp BI_RGB BMP — the fixture
    twin of decode_bmp (round-trip tested; decode correctness itself is
    pinned by byte-literal spec vectors and the closed-form pixel
    oracle, not by this encoder)."""
    h, w, _ = pixels.shape
    stride = (w * 3 + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    rows = pixels[:, :, ::-1]  # RGB → BGR
    body[:, : w * 3] = rows.reshape(h, w * 3)
    if not topdown:
        body = body[::-1]
    data = body.tobytes()
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if topdown else h, 1, 24, 0, len(data),
        2835, 2835, 0, 0,
    )
    return file_hdr + info_hdr + data


IMG_SCHEMA = (
    "url string, width int, height int, "
    "mean_r double, mean_g double, mean_b double, wsum long"
)


def image_features(pages: DataFrame, binary_col: str = "html",
                   url_col: str = "url") -> DataFrame:
    """REAL image feature extraction over a binary column (BMP decode):
    (url, width, height, per-channel means, wsum) where
    ``wsum = Σ_i i·(r_i + 2·g_i + 3·b_i)`` over top-down row-major
    pixel index i — ORDER-SENSITIVE, so a decoder that misreads
    bottom-up rows or eats padding cannot still match. mapInPandas
    keeps batches Arrow-sized; partitioning inherited (no shuffle);
    non-BMP payloads raise (route them to extract_features' stub)."""
    bcol, ucol = binary_col, url_col

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, ws, hs, mr, mg, mb, wsum = [], [], [], [], [], [], []
            for url, buf in zip(pdf[ucol], pdf[bcol]):
                px = decode_bmp(bytes(buf)).astype(np.int64)
                h, w, _ = px.shape
                flat = px.reshape(-1, 3)
                idx = np.arange(flat.shape[0], dtype=np.int64)
                urls.append(url)
                ws.append(w)
                hs.append(h)
                mr.append(flat[:, 0].sum() / flat.shape[0])
                mg.append(flat[:, 1].sum() / flat.shape[0])
                mb.append(flat[:, 2].sum() / flat.shape[0])
                wsum.append(int((idx * (flat[:, 0] + 2 * flat[:, 1] + 3 * flat[:, 2])).sum()))
            yield pd.DataFrame(
                {
                    "url": urls,
                    "width": pd.Series(ws, dtype="int32"),
                    "height": pd.Series(hs, dtype="int32"),
                    "mean_r": pd.Series(mr, dtype="float64"),
                    "mean_g": pd.Series(mg, dtype="float64"),
                    "mean_b": pd.Series(mb, dtype="float64"),
                    "wsum": pd.Series(wsum, dtype="int64"),
                }
            )

    return pages.select(ucol, bcol).mapInPandas(op, schema=IMG_SCHEMA)


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
