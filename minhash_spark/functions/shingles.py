"""Text normalization + shingling into uint64 element ids.

The reference sketches opaque ``uint64_t`` set elements
(/root/reference/include/minhash.h:56) — its tests insert consecutive
integers (/root/reference/test/test_serial.c:66-68). Turning web text into
integer sets is therefore *this* engine's responsibility; the sketch layer
(oracle.py / kernels.py) consumes whatever uint64 ids we produce here.

Shingle ids are FNV-1a hashes of sliding byte windows over the normalized
text — fully vectorized (one numpy xor/multiply pair per window byte, k ops
total for the whole document), deterministic, and identical between the Spark
pipeline and the serial oracle because both import THIS function.
"""

from __future__ import annotations

import numpy as np

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)


def normalize_text(text: str) -> str:
    """Canonical text form: lowercase, whitespace collapsed to single spaces,
    stripped. Shared verbatim by pipeline and oracle so the per-row
    "byte-identical text per url" invariant holds trivially."""
    if text is None:
        return ""
    return " ".join(text.lower().split())


def _fnv1a_windows(data: np.ndarray, k: int) -> np.ndarray:
    """FNV-1a over every length-k window of a uint8 array → uint64[n-k+1]."""
    windows = np.lib.stride_tricks.sliding_window_view(data, k)
    h = np.full(windows.shape[0], _FNV_OFFSET, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for j in range(k):
            h = (h ^ windows[:, j].astype(np.uint64)) * _FNV_PRIME
    return h


def _fnv1a_bytes(data: bytes) -> np.uint64:
    h = _FNV_OFFSET
    arr = np.frombuffer(data, dtype=np.uint8)
    with np.errstate(over="ignore"):
        for byte in arr:
            h = (h ^ np.uint64(byte)) * _FNV_PRIME
    return h


def fnv1a_many(items: list[bytes]) -> np.ndarray:
    """FNV-1a of many byte strings, vectorized by grouping equal lengths
    into (n, L) matrices and folding column-wise — identical values to
    _fnv1a_bytes, ~30× faster on token/gram batches."""
    if not items:
        return np.empty(0, dtype=np.uint64)
    lengths = np.array([len(b) for b in items])
    out = np.empty(len(items), dtype=np.uint64)
    with np.errstate(over="ignore"):
        for L in np.unique(lengths):
            idx = np.nonzero(lengths == L)[0]
            if L == 0:
                out[idx] = _FNV_OFFSET
                continue
            mat = np.frombuffer(
                b"".join(items[i] for i in idx), dtype=np.uint8
            ).reshape(len(idx), int(L))
            h = np.full(mat.shape[0], _FNV_OFFSET, dtype=np.uint64)
            for j in range(int(L)):
                h = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
            out[idx] = h
    return out


def char_shingles(text: str, k: int = 5) -> np.ndarray:
    """Distinct char k-shingle ids (uint64) of the *normalized* text.

    Texts shorter than k bytes produce one shingle over the whole text;
    empty text produces an empty set (→ all-INFTY sketch, matching
    init_empty_values, /root/reference/src/configuration/configuration.c:143).
    """
    norm = normalize_text(text).encode("utf-8")
    if len(norm) == 0:
        return np.empty(0, dtype=np.uint64)
    if len(norm) < k:
        return np.array([_fnv1a_bytes(norm)], dtype=np.uint64)
    return np.unique(_fnv1a_windows(np.frombuffer(norm, dtype=np.uint8), k))


def char_shingle_sets_batch(texts, k: int = 5) -> list[np.ndarray]:
    """char_shingles for a whole batch — identical per-doc values, one
    FNV-1a sliding-window pass over the batch's concatenated bytes instead
    of a per-document numpy call chain (strided window view + k column
    copies per doc). Windows that would cross a document boundary are never
    emitted: each doc's shingles are the slice [off_d, off_d + len_d - k]
    of the global window-hash array, exactly the windows the per-doc form
    hashes. Sub-k docs keep the single whole-text hash; empty docs the
    empty set."""
    n = len(texts)
    norms = [normalize_text(t).encode("utf-8") for t in texts]
    out: list[np.ndarray] = [None] * n  # type: ignore[list-item]
    long_idx = [i for i, b in enumerate(norms) if len(b) >= k]
    for i, b in enumerate(norms):
        if len(b) == 0:
            out[i] = np.empty(0, dtype=np.uint64)
        elif len(b) < k:
            out[i] = np.array([_fnv1a_bytes(b)], dtype=np.uint64)
    if long_idx:
        lens = np.fromiter(
            (len(norms[i]) for i in long_idx), dtype=np.int64, count=len(long_idx)
        )
        buf = np.frombuffer(b"".join(norms[i] for i in long_idx), dtype=np.uint8)
        H = _fnv1a_windows(buf, k)
        offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
        for j, i in enumerate(long_idx):
            out[i] = np.unique(H[offs[j] : offs[j] + lens[j] - k + 1])
    return out


def word_shingles(text: str, w: int = 3) -> np.ndarray:
    """Distinct word w-shingle ids: FNV-1a over the utf-8 bytes of w
    consecutive tokens joined by 0x1f."""
    tokens = normalize_text(text).split(" ")
    if tokens == [""]:
        return np.empty(0, dtype=np.uint64)
    if len(tokens) < w:
        joined = [b"\x1f".join(t.encode("utf-8") for t in tokens)]
    else:
        joined = [
            b"\x1f".join(t.encode("utf-8") for t in tokens[i : i + w])
            for i in range(len(tokens) - w + 1)
        ]
    return np.unique(fnv1a_many(joined))


def shingle_fn(mode: str, size: int):
    """Return the shingling callable for a DedupConfig (mode, size)."""
    if mode == "char":
        return lambda text: char_shingles(text, size)
    if mode == "word":
        return lambda text: word_shingles(text, size)
    raise ValueError(f"unknown shingle mode {mode!r}")
