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


def simhash_batch(texts, chunk_tokens: int = 1 << 17) -> np.ndarray:
    """SimHash fingerprints for a batch of texts → uint64[n].

    Vectorized ACROSS the batch: all token occurrences are flattened into one
    array, FNV-1a hashed via the length-grouped matrix fold
    (shingles.fnv1a_many), expanded to a (tokens × 64) ±1 sign matrix, and
    reduced per document with np.add.reduceat. Summing ±1 per OCCURRENCE
    equals the count-weighted distinct-token form (w·(2b−1) summed over
    distinct tokens), so values are identical to the per-document loop this
    replaces. Token chunks are bounded (chunk_tokens × 64 int32 ≈ 32 MB) so
    32 concurrent workers don't blow the cache/DRAM budget; per-doc sums fold
    across chunk boundaries (addition is associative)."""
    n = len(texts)
    counts = np.zeros(n, dtype=np.int64)
    flat: list[bytes] = []
    for i, t in enumerate(texts):
        toks = normalize_text(t).split(" ")
        if toks == [""]:
            continue
        counts[i] = len(toks)
        flat.extend(tok.encode("utf-8") for tok in toks)
    out = np.zeros(n, dtype=np.uint64)
    if not flat:
        return out
    H = fnv1a_many(flat)
    starts = np.concatenate([[0], np.cumsum(counts)])[:-1]
    nonempty = counts > 0
    doc_starts = starts[nonempty]
    v = np.zeros((int(nonempty.sum()), 64), dtype=np.int64)
    total = H.shape[0]
    pos = 0
    while pos < total:
        end = min(pos + chunk_tokens, total)
        signed = (
            ((H[pos:end, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int32)
        )
        signed = 2 * signed - 1
        first = int(np.searchsorted(doc_starts, pos, side="right")) - 1
        last = int(np.searchsorted(doc_starts, end - 1, side="right")) - 1
        seg_starts = np.maximum(doc_starts[first : last + 1], pos) - pos
        v[first : last + 1] += np.add.reduceat(signed, seg_starts, axis=0)
        pos = end
    fp = ((v > 0).astype(np.uint64) * (np.uint64(1) << _BITS)[None, :]).sum(
        axis=1, dtype=np.uint64
    )
    out[nonempty] = fp
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
    from .lsh import tiered_bucket_pairs

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
