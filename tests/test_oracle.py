"""Oracle invariants — mirrors the reference's own test strategy:
integer-range inputs, order/partition invariance, self-similarity 1.0,
overlap-pair similarity within estimator variance
(/root/reference/test/test_serial.c, test/test_serial_similarity.c:55-71,
test/test_parallel_lock.c:47-57)."""

import numpy as np
import pytest

from minhash_spark.config import MinHashConfig, INFTY, HASH_KWISE
from minhash_spark import oracle


CONFIGS = [
    MinHashConfig(sketch_size=100, hash_type=0, seed=7),
    MinHashConfig(sketch_size=128, hash_type=0, seed=42),
    MinHashConfig(sketch_size=100, hash_type=HASH_KWISE, k=2, seed=7),
    MinHashConfig(sketch_size=128, hash_type=HASH_KWISE, k=5, seed=42),
]


@pytest.mark.parametrize("cfg", CONFIGS)
def test_sketch_order_invariance(cfg):
    """sketch(set) independent of insertion order — the invariant that lets
    Spark compute signatures with arbitrary parallelism."""
    elems = np.arange(500, dtype=np.uint64)
    rng = np.random.default_rng(0)
    shuffled = rng.permutation(elems)
    s1 = oracle.sketch_of_set(elems, cfg)
    s2 = oracle.sketch_of_set(shuffled, cfg)
    assert np.array_equal(s1, s2)


@pytest.mark.parametrize("cfg", CONFIGS)
def test_merge_is_union(cfg):
    """merge(sketch(A), sketch(B)) == sketch(A ∪ B) — src/utils/utils.c:36-46;
    the algebra behind Spark partial aggregation."""
    a = np.arange(0, 300, dtype=np.uint64)
    b = np.arange(200, 600, dtype=np.uint64)
    union = np.arange(0, 600, dtype=np.uint64)
    merged = oracle.merge(oracle.sketch_of_set(a, cfg), oracle.sketch_of_set(b, cfg))
    assert np.array_equal(merged, oracle.sketch_of_set(union, cfg))


def test_empty_sketch_is_all_infty():
    s = oracle.empty_sketch(128)
    assert s.dtype == np.uint64
    assert np.all(s == INFTY)


def test_self_query_is_one():
    """query(sketch, sketch) == 1.0 (test/test_serial.c:70)."""
    cfg = CONFIGS[1]
    s = oracle.sketch_of_set(np.arange(100, dtype=np.uint64), cfg)
    assert oracle.query(s, s) == 1.0


def test_overlap_similarity_within_variance():
    """Two sets sharing frac·n elements: E[query] = J = frac/(2-frac),
    tolerance 4·sqrt(J(1-J)/size) (test/test_serial_similarity.c:55-71)."""
    cfg = MinHashConfig(sketch_size=512, seed=3)  # bands check not used here
    n, frac = 2000, 0.5
    shared = int(n * frac)
    a = np.arange(0, n, dtype=np.uint64)
    b = np.arange(n - shared, 2 * n - shared, dtype=np.uint64)
    j_true = shared / (2 * n - shared)
    est = oracle.query(oracle.sketch_of_set(a, cfg), oracle.sketch_of_set(b, cfg))
    tol = 4 * np.sqrt(j_true * (1 - j_true) / cfg.sketch_size)
    assert abs(est - j_true) <= tol


def test_pairwise_uint64_wraparound():
    """The C computes a*x in uint64 (wraps mod 2^64) BEFORE % M — for large x
    this differs from mathematical a·x mod M. Pin the wrapping behavior."""
    a, b, M = np.uint64(3), np.uint64(0), np.uint64((1 << 31) - 1)
    x = np.uint64(2**63)  # 3 * 2^63 wraps to 2^63 mod 2^64
    got = oracle.pairwise_func(a, b, M, x)
    expected = (3 * 2**63 % 2**64) % ((1 << 31) - 1)
    assert int(got) == expected
    assert int(got) != (3 * 2**63) % ((1 << 31) - 1)  # wrapping is observable


def test_kwise_matches_manual_polynomial():
    cfg = MinHashConfig(sketch_size=4, hash_type=HASH_KWISE, k=3, seed=11)
    (C,) = cfg.coefficients()
    M = cfg.prime_modulus
    x = 123456789
    for i in range(4):
        got = int(oracle.kwise_func(C[i], M, np.uint64(x)))
        # small x: no wrap, matches the mathematical polynomial
        want = sum(int(C[i][j]) * pow(x, j, M) % M for j in range(4)) % M
        assert got == want


def test_basic_insert_reports_change():
    cfg = CONFIGS[0]
    sketch = oracle.empty_sketch(cfg.sketch_size)
    coeffs = cfg.coefficients()
    assert oracle.basic_insert(sketch, coeffs, cfg.hash_type, cfg.prime_modulus, 5)
    # re-inserting the same element changes nothing (utils.c:3-33 return flag)
    assert not oracle.basic_insert(sketch, coeffs, cfg.hash_type, cfg.prime_modulus, 5)
