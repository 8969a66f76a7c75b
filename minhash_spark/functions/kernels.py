"""Vectorized numpy hashing kernels — the batched (Arrow) counterpart of the
serial oracle. Same arithmetic as /root/reference/src/utils/hash.c:6-25 and
the min-update of src/utils/utils.c:3-33, but computed as one
(n_shingles × sketch_size) matrix per chunk with ``np.minimum.reduceat``
per-document reduction, instead of per-element loops. Differential tests in
tests/test_kernels.py require cell-for-cell equality with oracle.py — the
same invariant the reference demands of its parallel variants vs serial
(/root/reference/test/test_parallel_lock.c:47-57).
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np

from ..config import INFTY, SIG_INFTY_INT, SIG_INFTY_LONG, HASH_KWISE, MinHashConfig

_U64 = np.uint64


def hash_matrix(
    x: np.ndarray, coeffs: tuple[np.ndarray, ...], hash_type: int, M: int
) -> np.ndarray:
    """Hash every element by every function: uint64[n] → uint64[n, size].

    Pairwise: ``((a * x) % M + b) % M`` where ``a * x`` wraps mod 2^64 first,
    exactly like the C uint64 arithmetic (src/utils/hash.c:6-9) — computed
    in place so the working set stays one (n × size) matrix (callers keep n
    small enough for it to be cache-resident; see min_sketch_batch).
    K-wise: degree-k polynomial accumulated mod M per step with the same
    wrap-before-mod order as src/utils/hash.c:13-25.
    """
    x = np.ascontiguousarray(x, dtype=np.uint64)
    M = _U64(M)
    u31 = _U64(31)
    with np.errstate(over="ignore"):
        if hash_type == HASH_KWISE:
            (C,) = coeffs  # (size, k+1) uint64
            n, size = x.shape[0], C.shape[0]
            total = np.zeros((n, size), dtype=np.uint64)
            pow_x = np.ones(n, dtype=np.uint64)
            for i in range(C.shape[1]):
                term = pow_x[:, None] * C[None, :, i]
                term %= M
                total += term
                # total < 2M here (both addends already reduced), so the
                # canonical `%= M` is one conditional subtract — the uint64
                # division only ever runs on the full-width products
                np.subtract(total, M, out=total, where=total >= M)
                pow_x = (pow_x * x) % M
            return total
        a, b = coeffs
        h = x[:, None] * a[None, :]
        h %= M
        h += b[None, :]
        # h < M + 2^31 < 2^32: the second `%= M` reduces to one Mersenne
        # fold (M = 2^31 - 1) + conditional subtract — same values as the
        # division, measured ~8% cheaper on the (chunk × size) hot loop
        t = h >> u31
        h &= M
        h += t
        np.subtract(h, M, out=h, where=h >= M)
        return h


def min_sketch_batch(
    shingle_sets: Sequence[np.ndarray],
    cfg: MinHashConfig,
    coeffs: tuple[np.ndarray, ...] | None = None,
    chunk_elems: int = 1 << 10,
) -> np.ndarray:
    """MinHash sketches for a batch of documents → uint64[n_docs, size].

    Concatenates all documents' shingle ids, hashes them in bounded chunks
    (≤ chunk_elems × size × 8 bytes of temporary — the default keeps each
    worker's working set ~1 MB so 32 concurrent executor cores don't thrash
    the shared L3: measured best at both 8 and 32 procs, ~6× over
    DRAM-sized chunks), and reduces per-document minima with
    ``np.minimum.reduceat``. Empty documents stay all-INFTY
    (init_empty_values, src/configuration/configuration.c:143-148). Documents
    larger than a chunk are folded across chunks — min is associative and
    commutative (the same algebra that makes the reference's merge and
    Spark's partial aggregation correct, src/utils/utils.c:36-46).
    """
    if coeffs is None:
        coeffs = cfg.coefficients()
    n_docs = len(shingle_sets)
    size = cfg.sketch_size
    out = np.full((n_docs, size), INFTY, dtype=np.uint64)

    nonempty = [i for i, s in enumerate(shingle_sets) if len(s) > 0]
    if not nonempty:
        return out
    orig_idx = np.array(nonempty, dtype=np.int64)
    lengths = np.array([len(shingle_sets[i]) for i in nonempty], dtype=np.int64)
    starts = np.concatenate([[0], np.cumsum(lengths)])[:-1]
    X = np.concatenate([np.asarray(shingle_sets[i], dtype=np.uint64) for i in nonempty])

    total = X.shape[0]
    pos = 0
    while pos < total:
        end = min(pos + chunk_elems, total)
        H = hash_matrix(X[pos:end], coeffs, cfg.hash_type, cfg.prime_modulus)
        first = int(np.searchsorted(starts, pos, side="right")) - 1
        # doc containing the chunk's LAST element (end-1, not end — a doc
        # starting exactly at `end` belongs to the next chunk)
        last = int(np.searchsorted(starts, end - 1, side="right")) - 1
        seg_starts = np.maximum(starts[first : last + 1], pos) - pos
        mins = np.minimum.reduceat(H, seg_starts, axis=0)
        docs = orig_idx[first : last + 1]
        out[docs] = np.minimum(out[docs], mins)
        pos = end
    return out


def sketch_to_long(sketches: np.ndarray) -> np.ndarray:
    """uint64 sketches → int64 for Spark array<long> storage. Real values are
    < prime_modulus = 2^31-1 so they fit unchanged; INFTY maps to
    SIG_INFTY_LONG (2^63-1) so JVM-side ``least()`` merges keep min order."""
    out = sketches.copy()
    out[out == INFTY] = _U64(SIG_INFTY_LONG)
    return out.astype(np.int64)


def sketch_to_int(sketches: np.ndarray) -> np.ndarray:
    """uint64 sketches → int32 for Spark array<int> storage. Real values are
    < prime_modulus = 2^31-1 so they fit exactly; INFTY maps to SIG_INFTY_INT
    (int32 max — never a real value) so `least()` merges keep min order."""
    out = sketches.copy()
    out[out == INFTY] = _U64(SIG_INFTY_INT)
    return out.astype(np.int32)


def int_to_long_sentinel(ints: np.ndarray) -> np.ndarray:
    """int32 storage domain → int64 query/oracle domain (sentinel widened)."""
    out = np.asarray(ints, dtype=np.int64)
    out[out == SIG_INFTY_INT] = SIG_INFTY_LONG
    return out


def long_to_sketch(longs: np.ndarray) -> np.ndarray:
    """Inverse of sketch_to_long (for oracle comparison in tests)."""
    out = np.asarray(longs, dtype=np.int64).astype(np.uint64)
    out[out == _U64(SIG_INFTY_LONG)] = INFTY
    return out
