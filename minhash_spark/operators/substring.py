"""Suffix-array substring-dedup path — finds documents whose (normalized)
text is contained verbatim inside another document.

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
by the exact/MinHash paths. Verification builds a per-container suffix array
(partition-local, inside applyInPandas) and binary-searches each candidate
containee — repeated probes against the same container amortize the sort.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, LongType, StructType, StructField, StringType

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


def _build_suffix_array(s: str) -> list[int]:
    """Plain suffix array by sorted suffixes. Partition-local and bounded by
    per-document length; containers beyond ~100k chars should be chunked
    upstream."""
    return sorted(range(len(s)), key=lambda i: s[i:])


def _contains_via_suffix_array(container: str, sa: list[int], needle: str) -> bool:
    lo, hi = 0, len(sa)
    while lo < hi:
        mid = (lo + hi) // 2
        if container[sa[mid] : sa[mid] + len(needle)] < needle:
            lo = mid + 1
        else:
            hi = mid
    return lo < len(sa) and container[sa[lo] : sa[lo] + len(needle)] == needle


def verify_containment(
    candidates: DataFrame,
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Verify candidates by exact substring search of normalized text using a
    per-container suffix array → (containee, container)."""
    texts = df.select(F.col(id_col).alias("_tid"), F.col(text_col).alias("_ttext"))
    joined = (
        candidates.join(
            texts.withColumnRenamed("_tid", "containee").withColumnRenamed(
                "_ttext", "containee_text"
            ),
            "containee",
        )
        .join(
            texts.withColumnRenamed("_tid", "container").withColumnRenamed(
                "_ttext", "container_text"
            ),
            "container",
        )
    )

    # id columns keep whatever type the caller uses (string url, long doc_id)
    schema = StructType(
        [
            StructField("containee", candidates.schema["containee"].dataType),
            StructField("container", candidates.schema["container"].dataType),
        ]
    )

    def _verify(pdf: pd.DataFrame) -> pd.DataFrame:
        if pdf.empty:
            return pd.DataFrame(columns=["containee", "container"])
        container_text = normalize_text(pdf["container_text"].iloc[0])
        sa = _build_suffix_array(container_text)
        hits = []
        for _, row in pdf.iterrows():
            needle = normalize_text(row["containee_text"])
            if needle and _contains_via_suffix_array(container_text, sa, needle):
                hits.append((row["containee"], row["container"]))
        return pd.DataFrame(hits, columns=["containee", "container"])

    return joined.groupBy("container").applyInPandas(_verify, schema)


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
