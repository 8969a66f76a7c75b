"""Pure-numpy serial oracle — a faithful, element-at-a-time clone of the
reference MinHash semantics. No Spark dependency. This is the correctness
ground truth every distributed stage is differentially tested against,
mirroring the reference's own validation pattern (build the same set serially
and in parallel with the same hash functions, require cell-for-cell equality —
/root/reference/test/test_parallel_lock.c:47-57,
/root/reference/test/parallel/test_conc_minhash.c:68-103).

Cloned functions (file:line into /root/reference/):
- pairwise_func         src/utils/hash.c:6-9
- kwise_func            src/utils/hash.c:13-25
- basic_insert          src/utils/utils.c:3-33
- merge                 src/utils/utils.c:36-46
- query                 src/serial/minhash-serial.c:16-26
- init_empty_values     src/configuration/configuration.c:143-148

All arithmetic is uint64 with C wraparound: ``a * x`` wraps mod 2^64 *before*
the ``% M`` — numpy uint64 wraps identically, so results are byte-exact.
"""

from __future__ import annotations

import numpy as np

from .config import INFTY, HASH_KWISE, MinHashConfig

_U64 = np.uint64


def pairwise_func(a: np.uint64, b: np.uint64, M: np.uint64, x: np.uint64) -> np.uint64:
    """h(x) = ((a * x % M) + b) % M with uint64 wrap (src/utils/hash.c:6-9)."""
    with np.errstate(over="ignore"):
        return (_U64(a) * _U64(x) % _U64(M) + _U64(b)) % _U64(M)


def kwise_func(coefficients: np.ndarray, M: np.uint64, x: np.uint64) -> np.uint64:
    """Degree-k polynomial with k+1 coefficients, accumulating mod M each step
    (src/utils/hash.c:13-25). ``pow_x * x`` and ``pow_x * c_i`` wrap mod 2^64
    before their ``% M`` exactly like the C code."""
    M = _U64(M)
    x = _U64(x)
    pow_x = _U64(1)
    total = _U64(0)
    with np.errstate(over="ignore"):
        for c in coefficients:
            total = (total + (pow_x * _U64(c) % M)) % M
            pow_x = (pow_x * x) % M
    return total


def empty_sketch(size: int) -> np.ndarray:
    """All-INFTY sketch (src/configuration/configuration.c:143-148)."""
    return np.full(size, INFTY, dtype=np.uint64)


def basic_insert(
    sketch: np.ndarray, coeffs: tuple[np.ndarray, ...], hash_type: int,
    M: int, elem: int,
) -> bool:
    """sketch[i] = min(sketch[i], h_i(elem)); returns True iff any cell changed
    (src/utils/utils.c:3-33). Element-at-a-time on purpose — this is the
    serial reference path, not the vectorized pipeline kernel."""
    changed = False
    elem = _U64(elem)
    if hash_type == HASH_KWISE:
        (coeff_matrix,) = coeffs
        for i in range(sketch.shape[0]):
            val = kwise_func(coeff_matrix[i], M, elem)
            if val < sketch[i]:
                sketch[i] = val
                changed = True
    else:
        a, b = coeffs
        for i in range(sketch.shape[0]):
            val = pairwise_func(a[i], b[i], M, elem)
            if val < sketch[i]:
                sketch[i] = val
                changed = True
    return changed


def sketch_of_set(elems, cfg: MinHashConfig) -> np.ndarray:
    """Serial sketch of a set of uint64 elements — the oracle for the
    pipeline's signature stage."""
    sketch = empty_sketch(cfg.sketch_size)
    coeffs = cfg.coefficients()
    for e in np.asarray(elems, dtype=np.uint64):
        basic_insert(sketch, coeffs, cfg.hash_type, cfg.prime_modulus, e)
    return sketch


def query(s1: np.ndarray, s2: np.ndarray) -> float:
    """Similarity estimate: fraction of positionally-equal cells, float32
    division like the C code (src/serial/minhash-serial.c:16-26)."""
    count = int(np.count_nonzero(s1 == s2))
    return float(np.float32(count) / np.float32(s1.shape[0]))


def merge(sketch: np.ndarray, other: np.ndarray) -> np.ndarray:
    """Elementwise min into a fresh array (src/utils/utils.c:36-46 merges in
    place; immutable here since numpy copies are cheap and DataFrames are
    immutable anyway)."""
    return np.minimum(sketch, other)
