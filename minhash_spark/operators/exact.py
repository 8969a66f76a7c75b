"""Exact-duplicate detection: hash-groupBy on the content digest.

One shuffle on a 64-hex-char key with map-side partial aggregation; at 10^12
docs this is the cheapest dedup stage and runs first so downstream fuzzy
stages see only distinct texts if desired.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dup_groups(
    df: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    members_cap: int | None = None,
) -> DataFrame:
    """Groups of byte-identical text → (text_sha, n_docs, canonical[, members]).
    canonical = min id; only groups with ≥ 2 members (actual duplicates).

    `members` is opt-in and CAPPED: a viral boilerplate group (millions of
    identical pages) must never materialize one unbounded array row, so the
    member list keeps only the `members_cap` smallest ids — bounded BEFORE
    aggregation (window rank filter), not sliced after an unbounded
    collect_list."""
    hashed = df.select(
        F.sha2(F.col(text_col), 256).alias("text_sha"), F.col(id_col).alias("_id")
    )
    groups = (
        hashed.groupBy("text_sha")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("_id").alias("canonical"),
        )
        .where(F.col("n_docs") >= 2)
    )
    if members_cap is None:
        return groups
    from pyspark.sql import Window

    w = Window.partitionBy("text_sha").orderBy("_id")
    capped = (
        hashed.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= members_cap)
        .groupBy("text_sha")
        .agg(F.sort_array(F.collect_list("_id")).alias("members"))
    )
    return groups.join(capped, "text_sha")


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


def latest_version(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    payload_cols: list[str] | None = None,
) -> DataFrame:
    """Snapshot dedup: keep exactly one row per key — the one with the
    lexicographically greatest (order_cols...) tuple. The multi-crawl
    corpus case: ten crawls of one url, keep the newest warc_ts (break ts
    ties on a unique id column so the winner is deterministic and
    oracle-replayable).

    Scale shape: a single shuffle on key_cols with MAP-SIDE PARTIAL
    aggregation (max_by over a struct ordering key). Deliberately NOT the
    row_number window form — a window sorts every version of every key
    within each partition; max_by keeps one candidate row per key per map
    task, so a key with 10^4 crawl snapshots contributes one row per
    partition to the exchange instead of 10^4 sorted rows.
    """
    payload_cols = payload_cols or [
        c for c in df.columns if c not in key_cols
    ]
    winner = F.max_by(
        F.struct(*[F.col(c) for c in payload_cols]),
        F.struct(*[F.col(c) for c in order_cols]),
    ).alias("_w")
    out = df.groupBy(*key_cols).agg(winner)
    return out.select(
        *key_cols, *[F.col(f"_w.{c}").alias(c) for c in payload_cols]
    )
