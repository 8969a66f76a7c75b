"""Property-based differential tests (hypothesis): for arbitrary uint64
element sets and configs, the vectorized kernels must equal the serial
oracle cell-for-cell, merges must commute with unions, and chunking must be
invisible — the reference's validation invariants generalized beyond fixed
fixtures (/root/reference/test/test_parallel_lock.c:47-57)."""

import numpy as np
from hypothesis import given, settings, strategies as st

from minhash_spark.config import MinHashConfig, HASH_KWISE
from minhash_spark import oracle
from minhash_spark.functions.kernels import min_sketch_batch
from minhash_spark.functions.shingles import char_shingles, normalize_text

_cfg = st.builds(
    MinHashConfig,
    sketch_size=st.sampled_from([8, 32]),
    hash_type=st.sampled_from([0, HASH_KWISE]),
    k=st.integers(min_value=1, max_value=3),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
_elems = st.lists(
    st.integers(min_value=0, max_value=2**64 - 1), min_size=0, max_size=60
)


@settings(max_examples=25, deadline=None)
@given(cfg=_cfg, elems=_elems)
def test_kernel_equals_serial_oracle(cfg, elems):
    arr = np.array(elems, dtype=np.uint64)
    got = min_sketch_batch([arr], cfg)[0]
    want = oracle.sketch_of_set(arr, cfg)
    assert np.array_equal(got, want)


@settings(max_examples=25, deadline=None)
@given(cfg=_cfg, a=_elems, b=_elems)
def test_merge_commutes_with_union(cfg, a, b):
    sa = oracle.sketch_of_set(np.array(a, dtype=np.uint64), cfg)
    sb = oracle.sketch_of_set(np.array(b, dtype=np.uint64), cfg)
    union = np.union1d(
        np.array(a, dtype=np.uint64), np.array(b, dtype=np.uint64)
    )
    assert np.array_equal(oracle.merge(sa, sb), oracle.sketch_of_set(union, cfg))


@settings(max_examples=20, deadline=None)
@given(
    sets=st.lists(_elems, min_size=1, max_size=6),
    chunk=st.integers(min_value=1, max_value=64),
)
def test_chunking_is_invisible(sets, chunk):
    cfg = MinHashConfig(sketch_size=16, seed=7)
    arrs = [np.array(s, dtype=np.uint64) for s in sets]
    assert np.array_equal(
        min_sketch_batch(arrs, cfg, chunk_elems=chunk),
        min_sketch_batch(arrs, cfg, chunk_elems=1 << 20),
    )


@settings(max_examples=30, deadline=None)
@given(text=st.text(max_size=300))
def test_shingles_total_and_normalized(text):
    s = char_shingles(text, 5)
    assert s.dtype == np.uint64
    assert len(np.unique(s)) == len(s)
    # normalization idempotence → shingle stability
    assert np.array_equal(s, char_shingles(normalize_text(text), 5))


# ---------- round-3 operators: JPEG codec, WARC framing ----------------------


@settings(max_examples=15, deadline=None)
@given(
    hb=st.integers(min_value=1, max_value=4),
    wb=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_block_constant_roundtrip_property(hb, wb, seed):
    """For ANY block-constant image and unit quantization, the baseline
    JPEG encode→decode round trip is bit-exact (zero AC energy, integral
    DC) — the invariant the oracle-checked codec query relies on."""
    from minhash_spark.operators.jpeg import decode_baseline, encode_gray_baseline

    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 256, size=(hb, wb), dtype=np.uint8)
    img = np.kron(vals, np.ones((8, 8), dtype=np.uint8))
    out = decode_baseline(encode_gray_baseline(img, quant=np.ones((8, 8), dtype=np.int64)))
    assert np.array_equal(out, img)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    h=st.integers(min_value=1, max_value=30),
    w=st.integers(min_value=1, max_value=30),
)
def test_jpeg_arbitrary_image_bounded_error(seed, h, w):
    """Arbitrary images (any size, including non-multiple-of-8) with unit
    quantization decode within ±2 of the original — coefficient rounding is
    the only loss source."""
    from minhash_spark.operators.jpeg import decode_baseline, encode_gray_baseline

    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    out = decode_baseline(encode_gray_baseline(img, quant=np.ones((8, 8), dtype=np.int64)))
    assert out.shape == img.shape
    assert np.abs(out.astype(int) - img.astype(int)).max() <= 2


@settings(max_examples=15, deadline=None)
@given(
    payloads=st.lists(st.binary(min_size=0, max_size=300), min_size=1, max_size=5),
    compress=st.booleans(),
)
def test_warc_framing_roundtrip_property(payloads, compress):
    """Arbitrary binary payloads survive WARC framing byte-identically,
    plain or gzip-membered — Content-Length framing means payloads
    containing CRLFs, WARC/ strings, or gzip magic cannot confuse the
    parser."""
    import datetime as dt

    from minhash_spark.sources.warc import build_warc, parse_warc

    ts = dt.datetime(2026, 1, 2, 3, 4, 5)
    recs = [(f"https://e.com/{i}", ts, p) for i, p in enumerate(payloads)]
    parsed = parse_warc(build_warc(recs, compress=compress))
    assert [r["url"] for r in parsed] == [u for u, _, _ in recs]
    assert [r["payload"] for r in parsed] == list(payloads)
