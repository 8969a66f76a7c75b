"""Connected components over the verified duplicate-pair graph via iterative
min-label propagation (union-find by repeated "adopt the smallest label among
yourself and your neighbors").

Convergence: each iteration is one round of label broadcast, so the loop
terminates after at most graph-diameter iterations; duplicate clusters are
near-cliques (LSH pairs), so diameter is tiny in practice. Each iteration is
one shuffle join + one shuffled groupBy; `localCheckpoint` after every round
truncates lineage so plans don't grow (SURVEY.md §7 hard part (b)).

Labels are the document ids themselves (min over the cluster picks a
deterministic canonical member). Works for any orderable id type; callers at
extreme scale should pass a compact id column.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

logger = logging.getLogger(__name__)


def connected_components(
    edges: DataFrame,
    src: str = "url_a",
    dst: str = "url_b",
    max_iterations: int = 50,
    num_partitions: int | None = None,
    stats_out: dict | None = None,
) -> DataFrame:
    """edges(src, dst) → (url, cluster_id) for every vertex appearing in
    edges; cluster_id is the minimum vertex id of the component. `stats_out`,
    if given, receives {"rounds": int, "converged": bool} — same reporting
    contract as the two-star variant.

    The iteration shuffles are sized to the EDGE COUNT, not the session's
    global shuffle partitions: the dup-pair graph is orders of magnitude
    smaller than the corpus, and running each of the ~2·iterations tiny
    shuffles across 2×cores partitions leaves the cores idle on scheduling
    (measured 13% utilization at local[32]). ~500k edges per partition keeps
    tasks meaningful; pass num_partitions explicitly for huge graphs."""
    spark = edges.sparkSession

    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
    ).localCheckpoint()  # materialize upstream exactly once, original conf
    if num_partitions is None:
        n_edges = sym.count()  # cheap: reads the checkpoint
        par = spark.sparkContext.defaultParallelism
        num_partitions = max(min(par, 8), n_edges // 500_000 + 1)
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    prev_broadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_adaptive = spark.conf.get("spark.sql.adaptive.enabled")
    converged = False
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(num_partitions))
        # broadcast OFF inside the loop: edges and labels are co-partitioned by
        # "u" after the first shuffle, so the iteration join needs no exchange at
        # all — while a broadcast join would rebuild and re-ship a driver-side
        # hash table of every label EVERY iteration (a serial ~seconds barrier
        # that dominates the loop on small-to-mid graphs and grows with labels)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # AQE OFF inside the loop: every per-round query here runs over
        # already-materialized checkpoints at a fixed, deliberately small
        # partition count, so AQE has nothing to coalesce or re-join — it
        # only adds a per-shuffle re-planning barrier to each of the
        # ~2·rounds tiny jobs (measured as pure driver latency on the
        # dup-pair graphs this loop sees).
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        # the loop probes neighbors through e.v, so partition the edge table by v
        # ONCE — labels stay partitioned by u (groupBy output), so the iteration
        # join and the label update join both line up with zero per-round
        # exchanges of the edge set
        # localCheckpoint is eager, so once the repartitioned copy is
        # materialized the first checkpoint's blocks can be dropped — at
        # large edge counts each stale checkpoint holds the whole edge set
        # in block storage until driver GC happens to collect the reference
        pre = sym
        sym = sym.repartition(num_partitions, "v").localCheckpoint()
        pre.unpersist()

        # FUSED FIRST ROUND. With the identity labelling labels₀(u) = u, round
        # 1 of the propagation reduces to new_label(u) = min(u, min_{(u,v)∈E} v)
        # — one aggregation over the symmetric edge set, no labels table, no
        # join, and no separate vertex-set distinct (the groupBy keys ARE the
        # vertex set). Identical labels to running the generic round on
        # identity labels; also always a change when edges exist (every edge
        # lowers its larger endpoint), so the convergence probe for round 1
        # is skipped rather than computed.
        labels = (
            sym.groupBy("u")
            .agg(F.least(F.col("u"), F.min("v")).alias("label"))
            .localCheckpoint()
        )

        rounds = 1
        prev_ckpt = labels
        for _ in range(max_iterations - 1):
            rounds += 1
            # smallest label visible from each vertex through one hop
            nbr_min = (
                sym.alias("e")
                .join(labels.alias("l"), F.col("e.v") == F.col("l.u"), "inner")
                .select(F.col("e.u").alias("nu"), F.col("l.label").alias("label"))
                .groupBy("nu")
                .agg(F.min("label").alias("nbr_label"))
            )
            new_labels = (
                labels.alias("l")
                .join(nbr_min.alias("n"), F.col("l.u") == F.col("n.nu"), "left")
                .select(
                    F.col("l.u").alias("u"),
                    F.least(
                        F.col("l.label"),
                        F.coalesce(F.col("n.nbr_label"), F.col("l.label")),
                    ).alias("new_label"),
                    F.col("l.label").alias("old_label"),
                )
            ).localCheckpoint()
            # the new round's labels are materialized; the previous round's
            # checkpoint blocks are dead — free them now rather than keeping
            # O(rounds) full label copies pinned in block storage
            prev_ckpt.unpersist()
            prev_ckpt = new_labels
            changed = new_labels.where(F.col("new_label") < F.col("old_label")).limit(1)
            labels = new_labels.select("u", F.col("new_label").alias("label"))
            if changed.count() == 0:
                converged = True
                break
    finally:
        # a failed job mid-loop must not leave the whole session running with
        # ~num_partitions shuffle partitions, broadcast joins disabled, or
        # AQE off
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_broadcast)
        spark.conf.set("spark.sql.adaptive.enabled", prev_adaptive)

    if stats_out is not None:
        stats_out["rounds"] = rounds
        stats_out["converged"] = converged
    if not converged:
        # a component with diameter > max_iterations would be silently split;
        # surface it instead (near-dup clusters are near-cliques, so hitting
        # this means the edge set is pathological — raise max_iterations or
        # pre-contract with the exact-dup path)
        logger.warning(
            "connected_components: min-label propagation did not converge "
            "within %d iterations — some components may be split into "
            "multiple cluster_ids",
            max_iterations,
        )

    return labels.select(F.col("u").alias("url"), F.col("label").alias("cluster_id"))
