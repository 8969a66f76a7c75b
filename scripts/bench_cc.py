"""Connected-components comparison at bench scale: min-label propagation
(operators/cluster.py, O(diameter) rounds) vs alternating large-star/
small-star (operators/cluster_twostar.py, O(log n) rounds) on the SAME
verified-pair edge set — the measured backing for the O(log n) claim.

Reuses the tmpfs signature cache of profile_pair_stages.py (writes it if
absent), derives the verified pairs once, then runs each CC variant
`repeats` times reporting wall + rounds + cluster checksum equality.

The dedup graph is clique-shaped (diameter ~1-2), so it cannot show the
O(log n) vs O(diameter) separation — `chain` mode synthesizes a
HIGH-DIAMETER fixture instead: K disjoint path graphs of length L with the
component-minimum id at one end (min-label's worst case: the label must
walk all L-1 hops, one per round, while large-star/small-star contracts
the path in O(log L) rounds). That is the regime a real corpus hits when
near-dup clusters chain through borderline pairs instead of forming
cliques.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_cc.py [sf_dir] [amplify] [repeats]
       SPARK_GRAFT_CPUS=32 python scripts/bench_cc.py chain [length] [n_chains] [repeats]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minhash_spark.session import get_spark, default_parallelism
from minhash_spark.operators.signatures import with_minhash_signature
from minhash_spark.operators.lsh import bands_table, candidate_pairs, release_persisted
from minhash_spark.operators.verify import verify_pairs
from minhash_spark.operators.cluster import connected_components
from minhash_spark.operators.cluster_twostar import connected_components_twostar
from minhash_spark.queries import CFG
import bench

SIG_CACHE = "/dev/shm/profile_sigs"


def _checksum(cc):
    # order-insensitive component checksum over (vertex, label)
    return cc.agg(
        F.sum(F.xxhash64("url", "cluster_id") % 1_000_003).alias("s"),
        F.count("*").alias("n"),
    ).collect()[0].asDict()


def run_variants(edges, repeats: int, min_label_iters: int, twostar_iters: int) -> dict:
    out, sums = {}, set()
    for name, fn in (
        (
            "min_label",
            lambda st: connected_components(
                edges, max_iterations=min_label_iters, stats_out=st
            ),
        ),
        (
            "twostar",
            lambda st: connected_components_twostar(
                edges, max_iterations=twostar_iters, stats_out=st
            ),
        ),
    ):
        walls, rounds, converged = [], None, None
        for _ in range(repeats):
            st: dict = {}
            t0 = time.time()
            cc = fn(st)
            cs = _checksum(cc)
            walls.append(round(time.time() - t0, 1))
            rounds = st.get("rounds")
            converged = st.get("converged")
            sums.add((cs["s"], cs["n"]))
        out[name] = {
            "wall_best": min(walls),
            "walls": walls,
            "rounds": rounds,
            "converged": converged,
        }
    return {"variants": out, "identical_assignments": len(sums) == 1}


def main_dedup_graph() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    repeats = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    cache = f"{SIG_CACHE}_{os.path.basename(sf_dir)}_{amplify}_pk"

    spark = get_spark("bench-cc")
    if not os.path.exists(os.path.join(cache, "_SUCCESS")):
        docs = bench.amplified_docs(spark, sf_dir, amplify)
        with_minhash_signature(docs, CFG, packed=True).select(
            "doc_id", "minhash"
        ).write.mode("overwrite").parquet(cache)
    sigs = spark.read.parquet(cache).persist()
    n_docs = sigs.count()

    bands = bands_table(sigs, CFG, id_col="doc_id")
    cands = candidate_pairs(bands, CFG, id_col="doc_id")
    edges = (
        verify_pairs(cands, sigs, CFG, id_col="doc_id")
        .select("url_a", "url_b")
        .localCheckpoint()
    )
    n_edges = edges.count()
    release_persisted()
    sigs.unpersist()

    out = {"fixture": "dedup_graph", "n_docs": n_docs, "n_edges": n_edges,
           "cpus": default_parallelism(), "amplify": amplify}
    out.update(run_variants(edges, repeats, 50, 30))
    print(json.dumps(out))


def main_chain() -> None:
    length = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    n_chains = int(sys.argv[3]) if len(sys.argv) > 3 else 1000
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 3

    spark = get_spark("bench-cc-chain")
    # chain c occupies ids [c·L, (c+1)·L); edges connect consecutive ids, so
    # the component minimum c·L sits at one END — min-label must carry it
    # across all L−1 hops, one round per hop (its true worst case)
    e = spark.range(n_chains * length).withColumn(
        "i", F.pmod("id", F.lit(length))
    )
    edges = (
        e.where(F.col("i") < length - 1)
        .select(F.col("id").alias("url_a"), (F.col("id") + 1).alias("url_b"))
        .localCheckpoint()
    )
    n_edges = edges.count()

    out = {"fixture": "chain", "length": length, "n_chains": n_chains,
           "n_vertices": n_chains * length, "n_edges": n_edges,
           "diameter": length - 1, "cpus": default_parallelism()}
    # min-label needs ≥ diameter rounds; give it headroom so it converges
    # and the rounds count is the measured diameter, not the cap
    out.update(run_variants(edges, repeats, length + 10, 60))
    print(json.dumps(out))


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "chain":
        main_chain()
    else:
        main_dedup_graph()


if __name__ == "__main__":
    main()
