"""BMP decode spec vectors — hand-written byte literals (NOT built by
our own encoder, so an encoder/decoder shared bug cannot self-certify):
padding bytes set to sentinels, bottom-up and top-down row orders,
BGR channel order, 32-bpp variant, and the error taxonomy."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hope_graph_builder_spark.operators.multimodal import (
    decode_bmp,
    encode_bmp,
    image_features,
)


def _bmp(w, h, rows_file_order, bpp=24, topdown=False, pad=b"\xaa"):
    """Hand-assemble a BMP: rows_file_order = list of rows, each a list
    of (b, g, r[, a]) tuples IN FILE ORDER (caller handles flipping)."""
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    body = b""
    for row in rows_file_order:
        raw = b"".join(bytes(p) for p in row)
        body += raw + pad * (stride - len(raw))
    file_hdr = struct.pack("<2sIHHI", b"BM", 54 + len(body), 0, 0, 54)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, -h if topdown else h, 1, bpp, 0, len(body),
        0, 0, 0, 0,
    )
    return file_hdr + info_hdr + body


def test_decode_bottom_up_padding_and_bgr():
    # image (top-down): row0 = [R(255,0,0), G(0,255,0)], row1 = [B, W]
    # file (bottom-up) stores row1 first; channels are B,G,R
    img = _bmp(2, 2, [
        [(255, 0, 0), (255, 255, 255)],   # file row 0 = image row 1: B, W
        [(0, 0, 255), (0, 255, 0)],       # file row 1 = image row 0: R, G
    ])
    px = decode_bmp(img)
    assert px.shape == (2, 2, 3)
    assert px[0, 0].tolist() == [255, 0, 0]      # R at image (0,0)
    assert px[0, 1].tolist() == [0, 255, 0]      # G
    assert px[1, 0].tolist() == [0, 0, 255]      # B
    assert px[1, 1].tolist() == [255, 255, 255]  # W
    # stride is 8 for w=2 → 2 sentinel pad bytes per row must be ignored
    assert b"\xaa\xaa" in img


def test_decode_topdown_negative_height():
    img = _bmp(2, 2, [
        [(0, 0, 255), (0, 255, 0)],       # file row 0 = image row 0: R, G
        [(255, 0, 0), (255, 255, 255)],   # file row 1 = image row 1: B, W
    ], topdown=True)
    px = decode_bmp(img)
    assert px[0, 0].tolist() == [255, 0, 0]
    assert px[1, 1].tolist() == [255, 255, 255]


def test_decode_32bpp_alpha_dropped():
    img = _bmp(1, 1, [[(10, 20, 30, 40)]], bpp=32)
    px = decode_bmp(img)
    assert px.shape == (1, 1, 3)
    assert px[0, 0].tolist() == [30, 20, 10]  # BGRA → RGB, alpha dropped


def test_decode_errors():
    with pytest.raises(ValueError, match="magic"):
        decode_bmp(b"PNG" + b"\x00" * 60)
    ok = _bmp(2, 2, [[(0, 0, 0), (0, 0, 0)], [(0, 0, 0), (0, 0, 0)]])
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(ok[:-3])
    rle = bytearray(ok)
    struct.pack_into("<I", rle, 30, 1)  # BI_RLE8
    with pytest.raises(ValueError, match="compression"):
        decode_bmp(bytes(rle))


@pytest.mark.parametrize("topdown", [False, True])
def test_encode_decode_roundtrip(topdown):
    rng = np.random.default_rng(7)
    for w, h in [(1, 1), (2, 3), (5, 4), (7, 2)]:  # odd strides incl.
        px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        assert np.array_equal(decode_bmp(encode_bmp(px, topdown)), px)


def test_image_features_spark_path(spark):
    """The distributed decode path: known 2x2 image through
    mapInPandas — means AND the order-sensitive wsum."""
    img = _bmp(2, 2, [
        [(255, 0, 0), (255, 255, 255)],
        [(0, 0, 255), (0, 255, 0)],
    ])
    df = spark.createDataFrame([("u1", bytearray(img))], "url string, img binary")
    r = image_features(df, binary_col="img").first()
    assert (r.width, r.height) == (2, 2)
    # pixels top-down row-major: R(255,0,0) G(0,255,0) B(0,0,255) W(255,255,255)
    assert r.mean_r == (255 + 0 + 0 + 255) / 4
    assert r.mean_g == (0 + 255 + 0 + 255) / 4
    assert r.mean_b == (0 + 0 + 255 + 255) / 4
    # wsum = Σ i·(r + 2g + 3b): i=0→0, i=1→2·255, i=2→2·3·255, i=3→3·6·255
    assert r.wsum == 0 + 1 * (2 * 255) + 2 * (3 * 255) + 3 * (6 * 255)
