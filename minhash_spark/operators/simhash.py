"""SimHash fingerprint path — catches near-identical documents (tiny edits)
with a single 64-bit fingerprint per doc instead of a 128-cell sketch.

Fingerprint: weighted sign-sum of per-token FNV-1a hash bits (Charikar
SimHash), vectorized numpy inside an Arrow pandas UDF. Candidates: pigeonhole
banding — split the 64-bit fingerprint into `n_bands` equal bit-slices and
equi-join on any matching slice; two fingerprints within Hamming distance
`n_bands - 1` are guaranteed to share a slice. Verification: JVM-side
``bit_count(fp_a ^ fp_b) <= max_hamming`` — no Python after the fingerprint.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

from ..functions.shingles import normalize_text, fnv1a_many

_FNV_OFFSET = np.uint64(14695981039346656037)
_FNV_PRIME = np.uint64(1099511628211)
_BITS = np.arange(64, dtype=np.uint64)


def simhash_batch(texts) -> np.ndarray:
    """SimHash fingerprints for a batch of texts → uint64[n].

    Fully vectorized ACROSS the batch (values identical to the per-document
    definition — sign of the count-weighted per-bit sum over token
    occurrences, w·(2b−1) summed over distinct tokens):

    - Normalized docs are joined into ONE byte buffer with single-space
      separators (normalized text has no leading/trailing/double spaces, so
      every token boundary — within or between docs — is exactly one 0x20
      byte). Token starts/lengths fall out of one np.nonzero over the buffer;
      no per-token Python objects are ever built.
    - FNV-1a runs per length-group with a fancy-indexed (n_tokens × L) byte
      gather + L-step column fold — the same arithmetic as
      shingles.fnv1a_many, minus the b"".join of per-token bytes.
    - The per-bit sums use np.unpackbits (uint8 0/1 matrix, 8× narrower than
      the old ±1 int32 sign matrix — the memory-traffic reduction is what
      keeps 32 concurrent workers off the DRAM wall) + one np.add.reduceat
      per batch. The sign test `sum(±1) > 0` becomes `2·ones > count`.
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    norms: list[bytes] = []
    idx: list[int] = []
    for i, t in enumerate(texts):
        s = normalize_text(t)
        if s:
            norms.append(s.encode("utf-8"))
            idx.append(i)
    if not norms:
        return out
    lens = np.fromiter((len(b) for b in norms), dtype=np.int64, count=len(norms))
    buf = np.frombuffer(b" ".join(norms), dtype=np.uint8)
    offs = np.concatenate([[0], np.cumsum(lens + 1)])[:-1]  # doc start offsets
    spaces = np.nonzero(buf == 0x20)[0]
    tok_starts = np.concatenate([[0], spaces + 1])
    tok_lens = np.concatenate([spaces, [buf.shape[0]]]) - tok_starts
    # tokens per doc = spaces strictly inside the doc + 1 (the joining
    # separator at offs+lens is excluded by the strict searchsorted bound)
    counts = (
        np.searchsorted(spaces, offs + lens) - np.searchsorted(spaces, offs)
    ) + 1

    H = np.empty(tok_starts.shape[0], dtype=np.uint64)
    with np.errstate(over="ignore"):
        order = np.argsort(tok_lens, kind="stable")
        sorted_lens = tok_lens[order]
        uniq = np.unique(sorted_lens)
        bounds = np.searchsorted(sorted_lens, uniq)
        for k, L in enumerate(uniq):
            lo = bounds[k]
            hi = bounds[k + 1] if k + 1 < len(uniq) else len(sorted_lens)
            ids = order[lo:hi]
            mat = buf[tok_starts[ids][:, None] + np.arange(int(L))[None, :]]
            h = np.full(len(ids), _FNV_OFFSET, dtype=np.uint64)
            for j in range(int(L)):
                h = (h ^ mat[:, j].astype(np.uint64)) * _FNV_PRIME
            H[ids] = h

    seg = np.concatenate([[0], np.cumsum(counts)])[:-1]
    bits = np.unpackbits(H.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little")
    sums = np.add.reduceat(bits, seg, axis=0, dtype=np.int64)
    fpbits = (2 * sums) > counts[:, None]
    fp = (fpbits.astype(np.uint64) << _BITS[None, :]).sum(axis=1, dtype=np.uint64)
    out[np.array(idx, dtype=np.int64)] = fp
    return out


def simhash_udf():
    @pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        return pd.Series(simhash_batch(list(texts)).astype(np.int64))

    return _simhash


def with_simhash(df: DataFrame, text_col: str = "text", out_col: str = "simhash") -> DataFrame:
    return df.withColumn(out_col, simhash_udf()(F.col(text_col)))


def simhash_candidates(
    fp_df: DataFrame,
    id_col: str = "url",
    fp_col: str = "simhash",
    max_hamming: int = 3,
    max_bucket_size: int = 5000,
) -> DataFrame:
    """(id, simhash) → (url_a, url_b, hamming ≤ max_hamming).

    Pigeonhole guarantee needs n_bands = max_hamming + 1 slices; slice width
    = 64 / n_bands bits. Bucket skew is handled by the shared three-tier
    enumerator (all-pairs ≤ max_bucket_size, salted all-pairs ≤ 4×, star
    beyond — only star is approximate, and only for buckets past 4× the cap).
    """
    n_bands = max_hamming + 1
    width = 64 // n_bands

    # The fingerprint column is consumed by THREE plan branches (the banding
    # explode and both sides of the Hamming-verify join). Without a persist,
    # each branch re-evaluates the fingerprint UDF over the full corpus —
    # measured as two extra concurrent full-scan Python stages per run.
    # The (id, fp) table is 16 bytes/doc; cache it and evaluate the UDF once.
    # Registered with the lsh persisted-handle registry so callers that
    # release_persisted() after materializing reclaim it (same contract as
    # the enumerator's bucket table).
    from .lsh import _PERSISTED, tiered_bucket_pairs

    fp_df = fp_df.select(F.col(id_col), F.col(fp_col)).persist()
    _PERSISTED.append(fp_df)

    def _slice(i: int):
        shifted = F.shiftrightunsigned(F.col(fp_col), i * width)
        if width >= 64:  # single band = whole fingerprint, mask overflows long
            return shifted
        return shifted.bitwiseAND(F.lit((1 << width) - 1))

    slices = F.array(*[_slice(i) for i in range(n_bands)])
    bands = fp_df.select(
        F.col(id_col),
        F.posexplode(slices).alias("band_id", "band_val"),
    )

    raw = tiered_bucket_pairs(
        bands,
        bucket_cols=["band_id", "band_val"],
        id_col=id_col,
        max_bucket_size=max_bucket_size,
        salted_bucket_max=4 * max_bucket_size,
        salt_factor=16,
    ).distinct()

    fps_a = fp_df.select(F.col(id_col).alias("url_a"), F.col(fp_col).alias("fp_a"))
    fps_b = fp_df.select(F.col(id_col).alias("url_b"), F.col(fp_col).alias("fp_b"))
    return (
        raw.join(fps_a, "url_a")
        .join(fps_b, "url_b")
        .select(
            "url_a",
            "url_b",
            F.bit_count(F.col("fp_a").bitwiseXOR(F.col("fp_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
    )
