"""Store-compaction benchmark: per-batch ingest wall + tiny-probe wall as a
store accumulates batch directories, WITHOUT vs WITH the file-count
compaction policy (maybe_compact_store). The growing cost this measures is
per-batch file/manifest fan-out — every touched bucket holds one file per
past batch — which bucket/key pruning cannot remove; compaction rewrites it
to one file per bucket.

Usage: SPARK_GRAFT_CPUS=N python scripts/bench_compact.py [sf_dir] [n_batches] [max_batches]
Prints one JSON line; per-batch rows to stderr.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minhash_spark.session import get_spark
from minhash_spark.streaming.incremental import (
    incremental_dedup_batch,
    maybe_compact_store,
    probe_store,
    _side_batch_ids,
    _store_subdirs,
)
from minhash_spark.queries import CFG
import bench


def run_series(spark, docs, store, n_batches, compact_max):
    shutil.rmtree(store, ignore_errors=True)
    rows = []
    for e in range(n_batches):
        b = docs.where(F.pmod(F.xxhash64("doc_id"), F.lit(n_batches)) == e).select(
            F.col("doc_id").alias("url"), "text"
        )
        t0 = time.time()
        incremental_dedup_batch(
            spark, b, store, CFG, epoch_id=e, n_store_buckets=256
        ).count()
        ingest = time.time() - t0
        compacted = None
        if compact_max:
            t0 = time.time()
            compacted = maybe_compact_store(spark, store, max_batches=compact_max)
            compact_wall = time.time() - t0 if compacted else 0.0
        else:
            compact_wall = 0.0
        t0 = time.time()
        probe = docs.limit(3).select(F.col("doc_id").alias("url"), "text")
        n_pairs = probe_store(spark, probe, store, CFG).count()
        probe_wall = time.time() - t0
        dirs = max(len(_side_batch_ids(d)) for d in _store_subdirs(store))
        rows.append(
            {
                "batch": e,
                "ingest_sec": round(ingest, 2),
                "probe_sec": round(probe_wall, 2),
                "probe_pairs": n_pairs,
                "store_dirs": dirs,
                "compacted": bool(compacted),
                "compact_sec": round(compact_wall, 2),
            }
        )
        print(f"# {rows[-1]}", file=sys.stderr, flush=True)
    return rows


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    compact_max = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    spark = get_spark("bench-compact")
    docs = bench.corpus_parquet(spark, sf_dir)
    docs.count()
    base = "/dev/shm/bench_compact_store"
    plain = run_series(spark, docs, base + "_plain", n_batches, 0)
    compacted = run_series(spark, docs, base + "_compact", n_batches, compact_max)
    shutil.rmtree(base + "_plain", ignore_errors=True)
    shutil.rmtree(base + "_compact", ignore_errors=True)

    def tail_avg(rows, k, n=5):
        xs = [r[k] for r in rows[-n:]]
        return round(sum(xs) / len(xs), 2)

    print(
        json.dumps(
            {
                "metric": "compaction_series",
                "sf": os.path.basename(sf_dir.rstrip("/")),
                "n_batches": n_batches,
                "compact_max": compact_max,
                "plain": plain,
                "compacted": compacted,
                "tail5_ingest_plain": tail_avg(plain, "ingest_sec"),
                "tail5_ingest_compacted": tail_avg(compacted, "ingest_sec"),
                "tail5_probe_plain": tail_avg(plain, "probe_sec"),
                "tail5_probe_compacted": tail_avg(compacted, "probe_sec"),
            }
        )
    )


if __name__ == "__main__":
    main()
