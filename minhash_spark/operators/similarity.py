"""Embedding similarity search: brute-force cosine top-k (exact baseline) and
signed-random-projection LSH buckets (the scale path), plus threshold-based
embedding-cosine near-duplicate pairs.

Cosine math stays JVM-side (zip_with/aggregate over array<double>, inside
whole-stage codegen); only the SRP signature uses a pandas UDF (one matmul
per Arrow batch).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine over float embeddings, computed in double left-to-right (same
    summation order as a sequential loop, so engines agree bit-for-bit)."""
    ad, bd = _as_double(a), _as_double(b)
    return dot_col(ad, bd) / (norm_col(ad) * norm_col(bd))


def cosine_pairs(
    emb: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine ≥ threshold — embedding-based near-dup detection.
    Exhaustive O(n²) compare; at scale run it per SRP bucket instead
    (srp_cosine_pairs). Score rounded to 6 dp for stable cross-engine hashes."""
    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def brute_force_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors per query vector (query set broadcast).
    Ranking uses the 6-dp-rounded score with id tie-break so ordering is
    deterministic and engine-independent."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv")), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Signed-random-projection signature: sign pattern of n_planes
    hyperplane projections packed into one long. Deterministic planes from
    the seed; one numpy matmul per Arrow batch."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    @pandas_udf(LongType())
    def _srp(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        bits = (X @ planes) > 0
        sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(sig.astype(np.int64))

    return _srp


def srp_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate near-dup pairs: bucket by SRP signature, exact cosine
    within buckets. The O(n²) compare becomes O(Σ bucket²) — the ANN scale
    path. Recall < 1 by construction (report measures it vs brute force)."""
    sig = srp_signature_udf(dim, n_planes, seed)
    bucketed = emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), sig(F.col(vec_col)).alias("bucket")
    )
    a = bucketed.select(
        F.col("bucket"), F.col("id").alias("id_a"), F.col("v").alias("va")
    )
    b = bucketed.select(
        F.col("bucket"), F.col("id").alias("id_b"), F.col("v").alias("vb")
    )
    return (
        a.join(b, "bucket")
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
        .distinct()
    )
