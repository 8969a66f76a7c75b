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


def _token_hashes(text: str) -> tuple[np.ndarray, np.ndarray]:
    """Distinct token FNV-1a hashes + counts (weights) for one document —
    vectorized length-grouped FNV (functions.shingles.fnv1a_many)."""
    toks = normalize_text(text).split(" ")
    if toks == [""]:
        return np.empty(0, dtype=np.uint64), np.empty(0, dtype=np.int64)
    hashes = fnv1a_many([t.encode("utf-8") for t in toks])
    return np.unique(hashes, return_counts=True)


def simhash_udf():
    @pandas_udf(LongType())
    def _simhash(texts: pd.Series) -> pd.Series:
        out = np.zeros(len(texts), dtype=np.uint64)
        for i, t in enumerate(texts):
            h, w = _token_hashes(t)
            if h.shape[0] == 0:
                continue
            bits = ((h[:, None] >> _BITS[None, :]) & np.uint64(1)).astype(np.int64)
            v = ((2 * bits - 1) * w[:, None]).sum(axis=0)
            out[i] = np.bitwise_or.reduce(
                np.where(v > 0, np.uint64(1), np.uint64(0)) << _BITS
            )
        return pd.Series(out.astype(np.int64))

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
