"""Streaming store-growth bench: the Spark analog of the reference's
infinite-write throughput harness (test/fcds/test_fixed_queries_infinite_write.c:94-99).

Drives N equal micro-batches of the amplified bench corpus through
incremental_dedup_batch against one growing store and records per-batch
wall seconds, verified pairs, and total band-store rows. Large batches
touch every store bucket, so their store-join component grows with the
store — the curve quantifies that slope. A second PROBE phase then pushes
tiny batches (3 docs ≈ 96 band keys over 1024 store buckets) against the
full store: their band keys touch <10% of the bucket directories, so the
pruned store read keeps probe wall flat and small — the property that makes
continuous small-batch ingest viable against a corpus-scale store.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_streaming.py [sf_dir] [amplify] [n_batches]
Prints one JSON line; per-batch rows also to stderr as markdown.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minhash_spark.session import get_spark, default_parallelism
from minhash_spark.queries import CFG
from minhash_spark.streaming.incremental import (
    _store_subdirs,
    incremental_dedup_batch,
)
import bench


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    n_store_buckets = 1024

    spark = get_spark("minhash-stream-bench")
    docs = bench.corpus_parquet(spark, sf_dir, amplify).select(
        F.col("doc_id").alias("url"), "text"
    )
    n_docs = docs.count()

    store = tempfile.mkdtemp(prefix="bench_stream_store_", dir="/dev/shm")
    shutil.rmtree(store, ignore_errors=True)
    _, band_store = _store_subdirs(store)

    rows_out = []
    probe_out = []
    try:
        for i in range(n_batches):
            batch = docs.where(F.pmod(F.col("url"), F.lit(n_batches)) == i)
            t0 = time.time()
            n_pairs = incremental_dedup_batch(
                spark,
                batch,
                store,
                CFG,
                epoch_id=i,
                n_store_buckets=n_store_buckets,
            ).count()
            wall = time.time() - t0
            store_rows = spark.read.parquet(band_store).count()
            rows_out.append(
                {
                    "batch": i,
                    "wall_sec": round(wall, 1),
                    "verified_pairs": n_pairs,
                    "band_store_rows": store_rows,
                }
            )
            print(f"# {rows_out[-1]}", file=sys.stderr, flush=True)

        # probe phase: tiny batches against the full store — selective
        # bucket pruning keeps these flat (docs chosen outside the corpus
        # id space so they only near-dup against themselves)
        base = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
            (F.col("doc_id") + 900_000_000).alias("url"), "text"
        )
        for j in range(3):
            probe = base.where(F.pmod(F.col("url"), F.lit(97)) == j).limit(3)
            t0 = time.time()
            n_pairs = incremental_dedup_batch(
                spark,
                probe,
                store,
                CFG,
                epoch_id=n_batches + j,
                n_store_buckets=n_store_buckets,
            ).count()
            probe_out.append(
                {"probe": j, "wall_sec": round(time.time() - t0, 1),
                 "verified_pairs": n_pairs}
            )
            print(f"# {probe_out[-1]}", file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)

    print(
        json.dumps(
            {
                "metric": "incremental_batches",
                "sf": os.path.basename(sf_dir.rstrip("/")),
                "amplify": amplify,
                "n_docs": n_docs,
                "n_batches": n_batches,
                "n_store_buckets": n_store_buckets,
                "cpus": default_parallelism(),
                "batches": rows_out,
                "probes": probe_out,
            }
        )
    )
    md = ["| batch | wall (s) | verified pairs | band-store rows |", "|---|---|---|---|"]
    for r in rows_out:
        md.append(
            f"| {r['batch']} | {r['wall_sec']} | {r['verified_pairs']} | "
            f"{r['band_store_rows']} |"
        )
    print("\n".join(md), file=sys.stderr)


if __name__ == "__main__":
    main()
