"""Embedding similarity search: exact all-pairs cosine (block-partitioned,
shuffle-friendly), brute-force top-k (exact ANN baseline), and
signed-random-projection LSH buckets (the approximate scale path).

Cosine math stays JVM-side (zip_with/aggregate over array<double>, inside
whole-stage codegen); only the SRP signature uses a pandas UDF (sequential
per-dimension accumulation so the sign pattern matches DuckDB's
list_dot_product bit-for-bit — the oracle contract).
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
    n_blocks: int = 16,
) -> DataFrame:
    """All pairs with cosine ≥ threshold — the EXACT all-pairs baseline.

    Total compare work is inherently O(n²); what must not be O(n²)-in-one-task
    is the plan. Rows are hashed into `n_blocks` blocks and the triangular
    block grid is enumerated with an EQUI-join on (bi, bj) — n_blocks(n_blocks
    +1)/2 balanced shuffle tasks instead of one BroadcastNestedLoopJoin
    (the theta-join `id_a < id_b` plan). Each row is replicated n_blocks+1
    times across the two sides — the standard distributed all-pairs shape.
    At corpus scale use srp_cosine_pairs; this is the small-n exact baseline
    and recall oracle. Score rounded to 6 dp for stable cross-engine hashes."""
    e = emb.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_blocks)).alias("blk"),
    )
    left = e.select(
        F.col("blk").alias("bi"),
        F.explode(F.sequence(F.col("blk"), F.lit(n_blocks - 1))).alias("bj"),
        F.col("id").alias("id_l"),
        F.col("v").alias("vl"),
    )
    right = e.select(
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
        F.col("id").alias("id_r"),
        F.col("v").alias("vr"),
    )
    joined = left.join(right, ["bi", "bj"]).where(
        (F.col("bi") != F.col("bj")) | (F.col("id_l") < F.col("id_r"))
    )
    return (
        joined.select(
            F.least("id_l", "id_r").alias("id_a"),
            F.greatest("id_l", "id_r").alias("id_b"),
            F.round(cosine_col(F.col("vl"), F.col("vr")), 6).alias("cosine"),
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
    """Exact top-k cosine neighbors per query vector (query set broadcast —
    acceptable because the query side is small by contract; the corpus side
    streams through in parallel). Ranking uses the 6-dp-rounded score with id
    tie-break so ordering is deterministic and engine-independent."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    # The corpus side typically arrives as a single small parquet file → one
    # scan task, which serializes the entire O(n·q) cosine compute on one
    # core (measured: wall ≈ summed task time). The broadcast join keeps the
    # corpus un-shuffled by the JOIN, so spreading the scan is the only way
    # to parallelize the compare loop — one cheap round-robin exchange of the
    # corpus rows before the compute (guide §2.5: repartition after a
    # low-parallelism read).
    par = emb.sparkSession.sparkContext.defaultParallelism
    c = emb.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("cv"))
    c = c.repartition(par)
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


def ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    `n_cells` Voronoi cells around centroid vectors, search only the
    `n_probe` cells nearest each query. Centroids are the first `n_cells`
    vectors by id — the UNTRAINED baseline; use trained_ivf_topk for the
    k-means codebook (same search plan, trained centroids). Everything is
    JVM: the centroid table broadcasts,
    assignment is a rank-1 window over the broadcast join, the probe join is
    an equi-join on cell id. Compare cost drops from O(n·q) to
    O(n·q·n_probe/n_cells) at recall measured against brute_force_topk."""
    cents = emb.orderBy(id_col).limit(n_cells).select(
        F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")
    )
    scored = (
        emb.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
        .join(F.broadcast(cents))
        .select(
            "id",
            "v",
            "cid",
            F.round(cosine_col(F.col("v"), F.col("cv")), 6).alias("_ccos"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("_ccos").desc(), F.col("cid").asc())
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    cells = ranked.where(F.col("_rn") == 1).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv2"), "cid"
    )
    q_ids = queries.select(F.col(id_col).alias("qid"))
    probes = (
        ranked.join(F.broadcast(q_ids), F.col("id") == F.col("qid"))
        .where(F.col("_rn") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"), "cid")
    )
    cand = (
        probes.join(cells, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv2")), 6).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def quantized_col(vec_col: Column, quant: int = 1000) -> Column:
    """Integer-quantized copy of an embedding (round(x·quant), still
    double-typed): the k-means TRAINING representation. Quantization makes
    every per-dimension member sum an exactly-representable integer, so the
    centroid update is order-independent and bit-identical across engines —
    the property that lets a SQL oracle replay the training exactly. (The
    final top-k scoring still uses the original vectors.)"""
    return F.transform(_as_double(vec_col), lambda x: F.round(x * quant, 0))


def train_ivf_centroids(
    emb: DataFrame,
    n_cells: int = 8,
    n_iters: int = 2,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic Lloyd iterations for the IVF codebook, as DataFrame ops:
    assign = argmax cosine(x_q, c) (6-dp rounded, cid tie-break) via a
    broadcast centroid join + rank-1 window; update = per-(cell, dim) sums
    collected to the driver (n_cells·dim values — the classic Spark k-means
    shape: partial aggregation on executors, tiny model state on the driver).

    Determinism/oracle contract: vectors are integer-quantized (quantized_col)
    so member sums are exact integers regardless of aggregation order;
    centroid components are exact-sum / exact-count double divisions. The
    whole procedure is therefore replayable bit-for-bit by unrolled SQL
    (oracle_sql.trained_ivf_topk_sql). Seeds = the n_cells smallest ids'
    vectors; an emptied cell keeps its previous centroid."""
    spark = emb.sparkSession
    e = emb.select(
        F.col(id_col).alias("id"), quantized_col(F.col(vec_col), quant).alias("xq")
    )
    cents = [
        (r["id"], list(r["xq"]))
        for r in e.orderBy("id").limit(n_cells).collect()
    ]
    if not cents:
        raise ValueError(
            "train_ivf_centroids: embeddings table is empty — cannot seed a codebook"
        )
    if len(cents) < n_cells:
        import logging

        logging.getLogger(__name__).warning(
            "train_ivf_centroids: only %d vectors for n_cells=%d; the "
            "codebook will have %d cells (n_probe is relative to this "
            "effective count)", len(cents), n_cells, len(cents),
        )
    dim = len(cents[0][1])
    for _ in range(n_iters):
        cdf = spark.createDataFrame(
            cents, "cid bigint, cv array<double>"
        )
        w = Window.partitionBy("id").orderBy(F.col("_c").desc(), F.col("cid").asc())
        assigned = (
            e.join(F.broadcast(cdf))
            .select(
                "id",
                "xq",
                "cid",
                F.round(cosine_col(F.col("xq"), F.col("cv")), 6).alias("_c"),
            )
            .withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
        )
        sums = (
            assigned.select("cid", F.posexplode("xq").alias("dim", "val"))
            .groupBy("cid", "dim")
            .agg(F.sum("val").alias("sv"), F.count("*").alias("cnt"))
            .collect()
        )
        by_cell: dict[int, dict[int, tuple[float, int]]] = {}
        for r in sums:
            by_cell.setdefault(r["cid"], {})[r["dim"]] = (r["sv"], r["cnt"])
        cents = [
            (
                cid,
                [by_cell[cid][d][0] / by_cell[cid][d][1] for d in range(dim)]
                if cid in by_cell
                else old,
            )
            for cid, old in cents
        ]
    return cents


def trained_ivf_topk(
    emb: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 8,
    n_probe: int = 2,
    n_iters: int = 2,
    quant: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF top-k with a k-means-trained codebook (train_ivf_centroids), same
    search plan as ivf_topk: broadcast centroids, rank-1 assignment window,
    cell equi-join probes, per-query top-k window. Cell assignment uses the
    quantized vectors (the training representation, so the oracle can replay
    it); final scoring uses the ORIGINAL embeddings."""
    spark = emb.sparkSession
    cents = train_ivf_centroids(
        emb, n_cells=n_cells, n_iters=n_iters, quant=quant,
        id_col=id_col, vec_col=vec_col,
    )
    cdf = F.broadcast(spark.createDataFrame(cents, "cid bigint, cv array<double>"))
    scored = (
        emb.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            quantized_col(F.col(vec_col), quant).alias("xq"),
        )
        .join(cdf)
        .select(
            "id",
            "v",
            "cid",
            F.round(cosine_col(F.col("xq"), F.col("cv")), 6).alias("_ccos"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.col("_ccos").desc(), F.col("cid").asc())
    ranked = scored.withColumn("_rn", F.row_number().over(w))
    cells = ranked.where(F.col("_rn") == 1).select(
        F.col("id").alias("neighbor_id"), F.col("v").alias("cv2"), "cid"
    )
    q_ids = queries.select(F.col(id_col).alias("qid"))
    probes = (
        ranked.join(F.broadcast(q_ids), F.col("id") == F.col("qid"))
        .where(F.col("_rn") <= n_probe)
        .select(F.col("id").alias("query_id"), F.col("v").alias("qv"), "cid")
    )
    cand = (
        probes.join(cells, "cid")
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(cosine_col(F.col("qv"), F.col("cv2")), 6).alias("cosine"),
        )
    )
    wk = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id").asc()
    )
    return (
        cand.withColumn("rank", F.row_number().over(wk))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cosine", "rank")
    )


def srp_signature_udf(dim: int, n_planes: int = 16, seed: int = 42):
    """Signed-random-projection signature: sign pattern of n_planes
    hyperplane projections packed into one long. Deterministic planes from
    the seed. The projection accumulates per-dimension SEQUENTIALLY
    (acc += x_d · p_d), the same left-to-right order as a scalar dot-product
    loop — so DuckDB's list_dot_product computes bit-identical sums and the
    sign pattern (bucket id) is oracle-checkable. Still one vectorized numpy
    pass over the Arrow batch (dim rank-1 updates on an (n, planes) matrix)."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((dim, n_planes))
    weights = (1 << np.arange(n_planes, dtype=np.uint64)).astype(np.uint64)

    @pandas_udf(LongType())
    def _srp(vecs: pd.Series) -> pd.Series:
        X = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
        acc = np.zeros((X.shape[0], planes.shape[1]), dtype=np.float64)
        for d in range(planes.shape[0]):
            acc += X[:, d : d + 1] * planes[d]
        bits = acc > 0
        sig = (bits.astype(np.uint64) * weights[None, :]).sum(axis=1)
        return pd.Series(sig.astype(np.int64))

    return _srp


def srp_cosine_pairs(
    emb: DataFrame,
    threshold: float,
    dim: int,
    n_planes: int = 16,
    seed: int = 42,
    n_sets: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int = 20_000,
    salted_bucket_max: int = 100_000,
) -> DataFrame:
    """Approximate near-dup pairs: bucket by SRP signature, exact cosine
    within buckets. The O(n²) compare becomes O(Σ bucket²) — the ANN scale
    path.

    Recall levers: `n_sets` independent plane sets (seed+s) — a pair missed
    by one sign pattern is caught by another (multi-probe analog; recall
    1-(1-p)^n_sets for per-set collision probability p). Skew: bucket pair
    enumeration goes through the shared three-tier enumerator, so a
    degenerate bucket (e.g. all-zero vectors, or a dominant-direction corpus)
    is salted then star-capped instead of producing one O(m²) task."""
    from .lsh import tiered_bucket_pairs

    sets = []
    for s in range(n_sets):
        sig = srp_signature_udf(dim, n_planes, seed + s)
        sets.append(
            emb.select(
                F.lit(s).alias("set_id"),
                F.col(id_col).alias("id"),
                sig(F.col(vec_col)).alias("bucket"),
            )
        )
    bucketed = sets[0]
    for s_df in sets[1:]:
        bucketed = bucketed.unionByName(s_df)

    raw = tiered_bucket_pairs(
        bucketed,
        bucket_cols=["set_id", "bucket"],
        id_col="id",
        max_bucket_size=max_bucket_size,
        salted_bucket_max=salted_bucket_max,
        salt_factor=16,
    ).distinct()

    va = emb.select(F.col(id_col).alias("url_a"), F.col(vec_col).alias("va"))
    vb = emb.select(F.col(id_col).alias("url_b"), F.col(vec_col).alias("vb"))
    return (
        raw.join(va, "url_a")
        .join(vb, "url_b")
        .select(
            F.col("url_a").alias("id_a"),
            F.col("url_b").alias("id_b"),
            F.round(cosine_col(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
