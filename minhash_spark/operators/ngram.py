"""N-gram Jaccard similarity as pure JVM array expressions — exact set
Jaccard over word n-grams (n=1 → token-set Jaccard). Used for pair-level
verification when the MinHash *estimate* isn't enough, and as a standalone
dedup operator with a SQL-expressible oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .text import tokens_col


def ngrams_col(text_col: str | Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined) of the lowercased text."""
    toks = F.transform(tokens_col(text_col), lambda t: F.lower(t))
    if n == 1:
        return F.array_distinct(toks)
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
        )
    )
    return F.array_distinct(grams)


def jaccard_col(a: Column, b: Column) -> Column:
    """|A∩B| / |A∪B| as double; two empty sets → 0.0. Rounded to 6 dp for
    stable cross-engine value hashes."""
    union_size = F.size(F.array_union(a, b))
    inter_size = F.size(F.array_intersect(a, b))
    return F.round(
        F.when(union_size == 0, F.lit(0.0)).otherwise(
            inter_size.cast("double") / union_size.cast("double")
        ),
        6,
    )


def containment_col(a: Column, b: Column) -> Column:
    """Containment coefficient |A∩B| / |A| as double (asymmetric: how much of
    A's n-gram set lives inside B — the quote/boilerplate-detection measure;
    empty A → 0.0). Rounded to 6 dp for stable cross-engine hashes."""
    a_size = F.size(a)
    inter_size = F.size(F.array_intersect(a, b))
    return F.round(
        F.when(a_size == 0, F.lit(0.0)).otherwise(
            inter_size.cast("double") / a_size.cast("double")
        ),
        6,
    )


def ngram_containment_pairs(
    pairs: DataFrame,
    df: DataFrame,
    n: int = 3,
    id_col: str = "url",
    text_col: str = "text",
    left: str = "url_a",
    right: str = "url_b",
) -> DataFrame:
    """Attach the n-gram containment coefficient of left-in-right to id
    pairs → (left, right, containment)."""
    grams = df.select(
        F.col(id_col).alias("_gid"), ngrams_col(text_col, n).alias("_grams")
    )
    a = grams.select(F.col("_gid").alias(left), F.col("_grams").alias("_ga"))
    b = grams.select(F.col("_gid").alias(right), F.col("_grams").alias("_gb"))
    return (
        pairs.join(a, left)
        .join(b, right)
        .select(
            left,
            right,
            containment_col(F.col("_ga"), F.col("_gb")).alias("containment"),
        )
    )


def ngram_jaccard_pairs(
    pairs: DataFrame,
    df: DataFrame,
    n: int = 3,
    id_col: str = "url",
    text_col: str = "text",
    left: str = "url_a",
    right: str = "url_b",
) -> DataFrame:
    """Attach exact n-gram Jaccard to id pairs → (left, right, jaccard)."""
    grams = df.select(
        F.col(id_col).alias("_gid"), ngrams_col(text_col, n).alias("_grams")
    )
    a = grams.select(F.col("_gid").alias(left), F.col("_grams").alias("_ga"))
    b = grams.select(F.col("_gid").alias(right), F.col("_grams").alias("_gb"))
    return (
        pairs.join(a, left)
        .join(b, right)
        .select(
            left,
            right,
            jaccard_col(F.col("_ga"), F.col("_gb")).alias("jaccard"),
        )
    )
