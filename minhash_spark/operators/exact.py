"""Exact-duplicate detection: hash-groupBy on the content digest.

One shuffle on a 64-hex-char key with map-side partial aggregation; at 10^12
docs this is the cheapest dedup stage and runs first so downstream fuzzy
stages see only distinct texts if desired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(
    df: DataFrame, id_col: str = "url", text_col: str = "text"
) -> DataFrame:
    """Groups of byte-identical text → (text_sha, n_docs, canonical, members).
    canonical = min id; only groups with ≥ 2 members (actual duplicates)."""
    return (
        df.select(
            F.sha2(F.col(text_col), 256).alias("text_sha"), F.col(id_col).alias("_id")
        )
        .groupBy("text_sha")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("_id").alias("canonical"),
            F.sort_array(F.collect_list("_id")).alias("members"),
        )
        .where(F.col("n_docs") >= 2)
    )


def dedup_exact(df: DataFrame, id_col: str = "url", text_col: str = "text") -> DataFrame:
    """Keep one row (the min id) per distinct text — the exact-dup
    short-circuit. Window-free: groupBy min + semi join keeps it partial-agg
    friendly instead of sorting whole partitions."""
    keep = (
        df.select(F.sha2(F.col(text_col), 256).alias("text_sha"), F.col(id_col))
        .groupBy("text_sha")
        .agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, id_col, "left_semi")
