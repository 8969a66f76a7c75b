"""Pure-numpy JPEG codec: encode→decode round trips (grayscale, color
4:4:4, odd sizes, progressive), the exactness property for block-constant
images, and honest rejection of unsupported frame types. The decoder reads
its tables from the bitstream, so these self-generated vectors exercise the
full DQT/DHT/SOF/SOS parse + Huffman + dequantize + IDCT path with no
external ground truth needed; progressive files are additionally pinned to
decode pixel-identically to the baseline encoding of the same image (the
coefficients are transported losslessly across scans)."""

import numpy as np
import pytest

from minhash_spark.operators.jpeg import (
    ZIGZAG,
    decode_baseline,
    decode_jpeg,
    encode_gray_baseline,
    encode_gray_progressive,
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


def test_rejects_lossless_and_garbage():
    img = np.zeros((8, 8), dtype=np.uint8)
    data = bytearray(encode_gray_baseline(img))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC3  # rewrite SOF0 → SOF3 (lossless)
    with pytest.raises(NotImplementedError):
        decode_baseline(bytes(data))
    with pytest.raises(ValueError):
        decode_baseline(b"\x00\x01\x02\x03")


def test_sof2_marker_on_sequential_scan_decodes_identically():
    """A sequential full-band scan under an SOF2 header is progressive with
    Ss=0/Se=63/Ah=0 — same coefficients, same pixels."""
    vals = np.arange(16, dtype=np.uint8).reshape(4, 4) * 16
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    data = bytearray(encode_gray_baseline(img, quant=ONES))
    base = decode_baseline(bytes(data))
    sof = data.index(b"\xff\xc0")
    data[sof + 1] = 0xC2
    assert np.array_equal(decode_jpeg(bytes(data)), base)


def _test_images():
    rng = np.random.default_rng(7)
    x = np.linspace(0, 255, 40)
    grad = np.clip(np.add.outer(x, x) / 2, 0, 255).astype(np.uint8)
    noise = rng.integers(0, 256, size=(24, 24), dtype=np.uint8)
    # mixed: flat blocks (long EOB runs across blocks) next to noisy blocks
    # (dense symbols + ZRLs) — the AC first/refine state machines must
    # carry eobrun and buffered correction bits across the boundary
    mixed = np.kron(
        rng.integers(0, 256, size=(3, 4), dtype=np.uint8),
        np.ones((8, 8), dtype=np.uint8),
    )
    mixed[8:16, 8:24] = rng.integers(0, 256, size=(8, 16), dtype=np.uint8)
    return [grad, noise, mixed, grad[:37, :29]]


@pytest.mark.parametrize("al", [0, 1])
def test_progressive_decodes_identical_to_baseline(al):
    """The load-bearing progressive pin: identical quantized coefficients →
    identical pixels, for spectral-selection-only (al=0) and full
    successive-approximation (al=1) scan scripts, over flat / noisy /
    mixed / odd-size images and both quant tables."""
    for img in _test_images():
        for quant in (ONES, None):
            base = decode_jpeg(
                encode_gray_baseline(img, quant=quant)
                if quant is not None
                else encode_gray_baseline(img)
            )
            prog = encode_gray_progressive(img, quant=quant, al=al)
            assert b"\xff\xc2" in prog
            assert np.array_equal(decode_jpeg(prog), base)


def test_progressive_block_constant_exact():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 256, size=(4, 5), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_jpeg(encode_gray_progressive(img, quant=ONES))
    assert out.dtype == np.uint8 and np.array_equal(out, img)


def test_progressive_scan_count():
    img = np.zeros((16, 16), dtype=np.uint8)
    six = encode_gray_progressive(img, quant=ONES, al=1)
    three = encode_gray_progressive(img, quant=ONES, al=0)
    assert six.count(b"\xff\xda") == 6  # DC first/refine + 2×AC first + 2×AC refine
    assert three.count(b"\xff\xda") == 3  # DC + two spectral bands


def test_decode_media_routes_jpeg():
    vals = np.full((2, 2), 77, dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_media(encode_gray_baseline(img, quant=ONES), "jpeg")
    assert np.array_equal(out, img)
    with pytest.raises(NotImplementedError):
        decode_media(b"\x00", "mp3")
