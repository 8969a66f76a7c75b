"""Optimization-round helper bench (bench.py is frozen for measurement).

Times individual bench queries in isolation with the same inputs and
methodology as bench.py (count()/noop materialization, best-of-N), so a
single operator can be iterated on without paying for the full suite.

Usage: python bench_extra.py [query ...]   (default: all)
Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_REPEATS (default 3)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from minhash_spark.session import get_spark
from minhash_spark.operators.signatures import with_minhash_signature
from minhash_spark.operators.lsh import bands_table, candidate_pairs, release_persisted
from minhash_spark.operators.verify import verify_pairs
from minhash_spark.operators.cluster import connected_components
from minhash_spark.operators.simhash import with_simhash, simhash_candidates
from minhash_spark.operators.substring import substring_dedup
from minhash_spark.operators.similarity import srp_cosine_pairs, brute_force_topk
from minhash_spark.operators.text import token_count
from minhash_spark.queries import CFG, _emb_union
import bench


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "3"))
    only = set(sys.argv[1:])
    spark = get_spark("minhash-spark-bench-extra")

    docs = bench.corpus_parquet(spark, sf_dir)
    docs.count()

    def dedup():
        sigs = with_minhash_signature(docs, CFG, packed=True).select(
            "doc_id", "minhash"
        ).persist()
        cands = candidate_pairs(bands_table(sigs, CFG, id_col="doc_id"), CFG,
                                id_col="doc_id")
        verified = verify_pairs(cands, sigs, CFG, id_col="doc_id").persist()
        connected_components(verified).count()
        sigs.unpersist()
        verified.unpersist()

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "text")
    toks = token_count("text")
    containers = raw.where((toks >= 10) & (toks <= 60)).select(
        (F.col("doc_id") + 20_000_000).alias("doc_id"),
        F.concat(
            F.lit("prefix pad alpha bravo "), "text", F.lit(" omega zulu suffix pad")
        ).alias("text"),
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", "embedding"
    )

    queries = {
        "dedup_minhash_e2e": dedup,
        "simhash_candidates": lambda: simhash_candidates(
            with_simhash(docs), id_col="doc_id"
        ).count(),
        "substring_containment": lambda: substring_dedup(
            raw.unionAll(containers), id_col="doc_id"
        ).count(),
        "srp_ann_pairs": lambda: srp_cosine_pairs(
            _emb_union(spark, sf_dir), threshold=0.5, dim=64, n_planes=8
        ).count(),
        "ann_topk_bruteforce": lambda: brute_force_topk(
            emb, emb.where(F.col("vec_id") < 100), k=10
        ).count(),
    }

    out = {}
    for name, fn in queries.items():
        if only and name not in only:
            continue
        samples = []
        for _ in range(repeats):
            spark.sparkContext.setJobDescription(name)
            t0 = time.time()
            fn()
            samples.append(round(time.time() - t0, 3))
            release_persisted()
        out[name] = {"min": min(samples), "samples": samples}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
