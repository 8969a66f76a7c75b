"""Connected components via alternating large-star / small-star rounds —
the O(log n)-round algorithm for HIGH-DIAMETER graphs (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14).

The default min-label propagation (operators/cluster.py) needs
O(graph diameter) rounds; near-dup clusters are near-cliques so that is
almost always 2-3 rounds and cheaper per round. Use THIS variant when the
edge set may contain long chains (e.g. containment chains A⊂B⊂C⊂…, or
star-capped mega-buckets daisy-chained through shared anchors), where
min-label would pay O(diameter) shuffles.

Both operations are pure DataFrame aggregations + joins (no collect_list —
the per-node neighborhood minimum is a plain groupBy min, so a web-scale
high-degree node never materializes its neighbor array):

- large-star: every node u links its LARGER neighbors to m(u) =
  min({u} ∪ Γ(u)) — edges (v, m) for v ∈ Γ(u), v > u.
- small-star: orienting edges toward the larger endpoint, every node u links
  its smaller neighbors and itself to their minimum.

Each round strictly reduces a monotone potential; the edge set converges to
stars (member → component-minimum) in O(log n) rounds. Convergence is
detected by an order-insensitive checksum of the edge set (count + XOR of
pair hashes) going stable — one tiny agg per round instead of a set
comparison join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _star_checksum(edges: DataFrame) -> tuple[int, int]:
    # bit_xor: order-insensitive and overflow-free (a LONG sum would raise
    # under Spark 4's default ANSI mode once enough hashes accumulate)
    row = edges.agg(
        F.count("*").alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components_twostar(
    edges: DataFrame,
    src: str = "url_a",
    dst: str = "url_b",
    max_iterations: int = 30,
    stats_out: dict | None = None,
) -> DataFrame:
    """edges(src, dst) → (url, cluster_id), cluster_id = component minimum —
    same contract as operators.cluster.connected_components, O(log n) rounds.
    `stats_out`, if given, receives {"rounds": int, "converged": bool}.
    """
    e = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    vertices = (
        e.select(F.col("u").alias("url"))
        .union(e.select(F.col("v").alias("url")))
        .distinct()
        .localCheckpoint()
    )

    prev = _star_checksum(e)
    converged = False
    rounds = 0
    prev_ckpt = e
    for _ in range(max_iterations):
        rounds += 1
        # -- large-star: u's larger neighbors adopt m = min({u} ∪ Γ(u)) -----
        sym = e.union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("_mn"))
        m = F.least(F.col("u"), F.col("_mn"))
        e = (
            sym.where(F.col("v") > F.col("u"))
            .join(mins, "u")
            .select(F.col("v").alias("u"), m.alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct()
        )

        # -- small-star: orient toward larger endpoint; u and its smaller
        #    neighbors adopt their minimum ---------------------------------
        o = e.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        mins = o.groupBy("u").agg(F.min("v").alias("_mn"))
        linked = o.join(mins, "u").select(F.col("v").alias("u"), F.col("_mn").alias("v"))
        self_links = mins.select(F.col("u"), F.col("_mn").alias("v"))
        e = (
            linked.union(self_links)
            .where(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()  # truncate lineage every round
        )
        # this round's edges are materialized (eager checkpoint) — free the
        # previous round's blocks instead of pinning O(rounds) edge copies
        # in block storage until driver GC. The first checkpoint also backs
        # `vertices`, but that is itself checkpointed, so its blocks are
        # safe to drop.
        prev_ckpt.unpersist()
        prev_ckpt = e

        cur = _star_checksum(e)
        if cur == prev:
            converged = True
            break
        prev = cur

    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["converged"] = converged
    if not converged:
        import logging

        logging.getLogger(__name__).warning(
            "connected_components_twostar: edge set not stable after %d "
            "rounds — components may be split",
            max_iterations,
        )

    # stars: (member, root). Roots themselves (and isolated vertices of the
    # original edge set — impossible here since every vertex has an edge,
    # but kept for safety) label themselves.
    labels = e.select(F.col("u").alias("url"), F.col("v").alias("cluster_id"))
    return (
        vertices.join(labels, "url", "left")
        .select(
            "url", F.coalesce("cluster_id", F.col("url")).alias("cluster_id")
        )
    )
