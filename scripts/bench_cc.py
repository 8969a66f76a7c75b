"""Connected-components comparison at bench scale: min-label propagation
(operators/cluster.py, O(diameter) rounds) vs alternating large-star/
small-star (operators/cluster_twostar.py, O(log n) rounds) on the SAME
verified-pair edge set — the measured backing for the O(log n) claim.

Reuses the tmpfs signature cache of profile_pair_stages.py (writes it if
absent), derives the verified pairs once, then runs each CC variant
`repeats` times reporting wall + rounds + cluster checksum equality.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_cc.py [sf_dir] [amplify] [repeats]
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


def main() -> None:
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

    def checksum(cc):
        # order-insensitive component checksum: xor of xxhash64(url, label)
        return cc.agg(
            F.sum(F.xxhash64("url", "cluster_id") % 1_000_003).alias("s"),
            F.count("*").alias("n"),
        ).collect()[0].asDict()

    out = {"n_docs": n_docs, "n_edges": n_edges, "cpus": default_parallelism(),
           "amplify": amplify, "variants": {}}
    sums = set()
    for name, fn in (
        ("min_label", lambda st: connected_components(edges, stats_out=st)),
        ("twostar", lambda st: connected_components_twostar(edges, stats_out=st)),
    ):
        walls, rounds = [], None
        for _ in range(repeats):
            st: dict = {}
            t0 = time.time()
            cc = fn(st)
            cs = checksum(cc)
            walls.append(round(time.time() - t0, 1))
            rounds = st.get("rounds")
            sums.add((cs["s"], cs["n"]))
        out["variants"][name] = {
            "wall_best": min(walls),
            "walls": walls,
            "rounds": rounds,
        }
    out["identical_assignments"] = len(sums) == 1
    print(json.dumps(out))


if __name__ == "__main__":
    main()
