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


def decontaminate_report(
    docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 5,
    id_col: str = "url",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """Benchmark decontamination: for every corpus document sharing at least
    one word n-gram with the eval set, report the overlap
    → (id, n_grams, n_contaminated, contamination, flagged).

    The training-data-pipeline gate against eval leakage (the GPT-3 /
    Pile-style n-gram contamination check; reference analog: the
    corpus-membership query surface, src/fcds/minhash-fcds.c:292-316,
    generalized from exact membership to n-gram overlap).

    Scale shape: the eval side (a benchmark suite — MBs, not TBs) is
    deduplicated to a distinct-gram set and BROADCAST, so the exploded
    corpus grams never shuffle: explode → broadcast-hash-join → partial
    aggregation by doc id all fuse into the scan stage. Per-doc gram sets
    are `array_distinct`ed, so the post-join count(*) IS the exact
    intersection size. Docs with zero overlap drop out of the inner join —
    the report is O(contaminated docs), not O(corpus).
    """
    grams = docs.select(
        F.col(id_col).alias("_gid"), ngrams_col(text_col, n).alias("_grams")
    )
    eval_grams = (
        eval_docs.select(F.explode(ngrams_col(text_col, n)).alias("_gram"))
        .distinct()
    )
    exploded = grams.select(
        "_gid",
        F.size("_grams").cast("long").alias("n_grams"),
        F.explode("_grams").alias("_gram"),
    )
    hits = (
        exploded.join(F.broadcast(eval_grams), "_gram")
        .groupBy("_gid", "n_grams")
        .agg(F.count("*").alias("n_contaminated"))
    )
    frac = F.round(
        F.col("n_contaminated").cast("double") / F.col("n_grams").cast("double"), 6
    )
    return hits.select(
        F.col("_gid").alias(id_col),
        "n_grams",
        "n_contaminated",
        frac.alias("contamination"),
        (frac >= F.lit(threshold)).alias("flagged"),
    )
