"""Dump .explain("formatted") for the bench's heavy queries to a directory.

Usage: python scripts/dump_plans_r06.py <out_dir> [suffix]
Run once at the round-start commit (suffix "before") and once at HEAD
(suffix "after") to produce the plans/r06 artifacts the judge checks.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minhash_spark.session import get_spark
from minhash_spark.operators.signatures import with_minhash_signature
from minhash_spark.operators.lsh import bands_table, candidate_pairs
from minhash_spark.operators.verify import verify_pairs
from minhash_spark.operators.simhash import with_simhash, simhash_candidates
from minhash_spark.operators.substring import substring_dedup
from minhash_spark.operators.similarity import srp_cosine_pairs, brute_force_topk
from minhash_spark.operators.text import token_count
from minhash_spark.queries import CFG, _emb_union
import bench


def main() -> None:
    out_dir = sys.argv[1]
    suffix = sys.argv[2] if len(sys.argv) > 2 else "after"
    os.makedirs(out_dir, exist_ok=True)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dump-plans")

    docs = bench.corpus_parquet(spark, sf_dir)
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

    sigs = with_minhash_signature(docs, CFG, packed=True).select("doc_id", "minhash")
    cands = candidate_pairs(bands_table(sigs, CFG, id_col="doc_id"), CFG,
                            id_col="doc_id")
    plans = {
        "dedup_verified_pairs": verify_pairs(cands, sigs, CFG, id_col="doc_id"),
        "simhash_candidates": simhash_candidates(with_simhash(docs), id_col="doc_id"),
        "substring_containment": substring_dedup(
            raw.unionAll(containers), id_col="doc_id"
        ),
        "srp_ann_pairs": srp_cosine_pairs(
            _emb_union(spark, sf_dir), threshold=0.5, dim=64, n_planes=8
        ),
        "ann_topk_bruteforce": brute_force_topk(
            emb, emb.where(F.col("vec_id") < 100), k=10
        ),
    }
    for name, df in plans.items():
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        print("wrote", path)


if __name__ == "__main__":
    main()
