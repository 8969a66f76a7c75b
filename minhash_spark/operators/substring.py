"""Substring-dedup path — finds documents whose (normalized) text is
contained verbatim inside another document.

Candidate generation is DETERMINISTIC, not probabilistic LSH: if doc A's
normalized token sequence occurs inside doc B's, then A's word w-grams occupy
contiguous positions in B's w-gram sequence, so among A's first `winnow_k`
w-grams exactly one aligns with a container position ≡ 0 (mod winnow_k).
Therefore:

    index  = every winnow_k-th w-gram hash of each doc   (container side)
    probes = first winnow_k w-gram hashes of each doc    (containee side)
    probe ⋈ index on the hash  ⇒  guaranteed candidate for every true
    containment where the containee has ≥ winnow_k + w - 1 tokens.

This trades index size (1/winnow_k of all shingles) against a minimum
containee length — the standard production tradeoff; shorter docs are covered
by the exact/MinHash paths. Verification is a pure JVM expression: normalize
both texts with built-in string functions and test `contains` — C-speed
substring search inside whole-stage codegen, no Python after the candidate
join. (An earlier revision built per-container Python suffix arrays; for the
handful of probes a container sees after winnowed candidate generation, a
direct contains beats constructing any index.)
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType

from ..functions.shingles import normalize_text, fnv1a_many


def _word_gram_hashes(text: str, w: int) -> np.ndarray:
    """Positional (non-distinct) word w-gram FNV-1a hashes of normalized text."""
    toks = normalize_text(text).split(" ")
    if toks == [""] or len(toks) < w:
        return np.empty(0, dtype=np.uint64)
    enc = [t.encode("utf-8") for t in toks]
    return fnv1a_many(
        [b"\x1f".join(enc[i : i + w]) for i in range(len(enc) - w + 1)]
    )


def _grams_udf(w: int, winnow_k: int, side: str):
    @pandas_udf(ArrayType(LongType()))
    def _grams(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            h = _word_gram_hashes(t, w)
            if side == "index":
                sel = h[::winnow_k]
            else:  # probe: first winnow_k positional grams
                sel = h[:winnow_k]
            out.append(sel.astype(np.int64))
        return pd.Series(out)

    return _grams


def containment_candidates(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    w: int = 3,
    winnow_k: int = 8,
    max_bucket_size: int = 5000,
) -> DataFrame:
    """→ (containee, container) candidate pairs. Deterministic for containees
    with ≥ winnow_k + w - 1 tokens; buckets over max_bucket_size are capped
    (hot w-grams, e.g. boilerplate phrases)."""
    grams_index = _grams_udf(w, winnow_k, "index")
    grams_probe = _grams_udf(w, winnow_k, "probe")

    base = df.select(F.col(id_col).alias("_id"), F.col(text_col).alias("_text"))
    index = base.select(
        F.col("_id").alias("container"),
        F.explode(grams_index(F.col("_text"))).alias("gram"),
    ).distinct()
    probe = base.select(
        F.col("_id").alias("containee"),
        F.explode(grams_probe(F.col("_text"))).alias("gram"),
    ).distinct()

    sizes = index.groupBy("gram").count()
    keep = sizes.filter(F.col("count") <= max_bucket_size).select("gram")
    index = index.join(keep, "gram")

    return (
        probe.join(index, "gram")
        .where(F.col("containee") != F.col("container"))
        .select("containee", "container")
        .distinct()
    )


def normalize_col(c: Column) -> Column:
    """JVM normalization matching functions.shingles.normalize_text for ASCII
    text: lowercase, whitespace runs → single space, strip."""
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


def verify_containment(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Verify candidates by exact substring search of normalized text —
    JVM `contains` inside whole-stage codegen → (containee, container).
    Empty containees never match (contains('', x) would be vacuously true)."""
    texts = df.select(
        F.col(id_col).alias("_tid"), normalize_col(F.col(text_col)).alias("_nt")
    )
    return (
        candidates.join(
            texts.select(
                F.col("_tid").alias("containee"), F.col("_nt").alias("_needle")
            ),
            "containee",
        )
        .join(
            texts.select(
                F.col("_tid").alias("container"), F.col("_nt").alias("_hay")
            ),
            "container",
        )
        .where(
            (F.length("_needle") > 0) & F.contains(F.col("_hay"), F.col("_needle"))
        )
        .select("containee", "container")
    )


def substring_dedup(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    w: int = 3,
    winnow_k: int = 8,
    max_bucket_size: int = 5000,
) -> DataFrame:
    cands = containment_candidates(df, id_col, text_col, w, winnow_k, max_bucket_size)
    return verify_containment(cands, df, id_col, text_col)
