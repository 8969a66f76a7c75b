"""Pure-numpy baseline JPEG codec: encode→decode round trips (grayscale,
color 4:4:4, odd sizes), the exactness property for block-constant images,
and honest rejection of unsupported frame types. The decoder reads its
tables from the bitstream, so these self-generated vectors exercise the full
DQT/DHT/SOF/SOS parse + Huffman + dequantize + IDCT path with no external
ground truth needed."""

import numpy as np
import pytest

from minhash_spark.operators.jpeg import (
    ZIGZAG,
    decode_baseline,
    encode_gray_baseline,
    encode_rgb_baseline,
)
from minhash_spark.operators.multimodal import decode_media

ONES = np.ones((8, 8), dtype=np.int64)


def test_zigzag_is_the_standard_order():
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert sorted(ZIGZAG) == list(range(64))
    assert ZIGZAG[-1] == 63


def test_block_constant_roundtrip_is_exact():
    """Flat 8×8 blocks with an all-ones quant table: zero AC energy,
    integral DC → bit-exact reconstruction (the property the oracle-checked
    driver query relies on)."""
    rng = np.random.default_rng(0)
    vals = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_baseline(encode_gray_baseline(img, quant=ONES))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_gradient_and_noise_bounded_error_q1():
    x = np.linspace(0, 255, 40)
    grad = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    out = decode_baseline(encode_gray_baseline(grad, quant=ONES))
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 2

    noise = np.random.default_rng(1).integers(0, 256, size=(24, 24), dtype=np.uint8)
    out = decode_baseline(encode_gray_baseline(noise, quant=ONES))
    assert np.abs(out.astype(int) - noise.astype(int)).max() <= 2


def test_standard_tables_odd_dimensions():
    """Non-multiple-of-8 sizes: the padded MCU grid must be cropped back,
    and standard Annex-K quantization stays within lossy-but-sane error."""
    x = np.linspace(0, 255, 40)
    grad = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)[:37, :29]
    out = decode_baseline(encode_gray_baseline(grad))
    assert out.shape == (37, 29)
    assert np.abs(out.astype(int) - grad.astype(int)).max() <= 32


def test_color_444_roundtrip():
    """3-component interleaved scan + YCbCr→RGB conversion path."""
    x = np.linspace(0, 255, 40)
    g = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    rgb = np.stack([g, g.T.copy(), np.flipud(g)], axis=-1)
    out = decode_baseline(encode_rgb_baseline(rgb, quant=ONES))
    assert out.shape == rgb.shape
    assert np.abs(out.astype(int) - rgb.astype(int)).max() <= 3


def test_rejects_progressive_and_garbage():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_gray_baseline(img))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2  # rewrite SOF0 → SOF2 (progressive)
    with pytest.raises(NotImplementedError):
        decode_baseline(bytes(data))
    with pytest.raises(ValueError):
        decode_baseline(b"\x00\x01\x02\x03")


def test_decode_media_routes_jpeg():
    vals = np.full((2, 2), 77, dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_media(encode_gray_baseline(img, quant=ONES), "jpeg")
    assert np.array_equal(out, img)
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "mp3")
