"""sf1-scale native run: the engine's intermediates at ~50× the bench
corpus. Amplifies sf0.1 to 5M docs (amplify 1000 — same construction and
ground truth as the headline bench corpus), runs (A) the full dedup e2e
(signatures → bands → tiered candidates → verify → connected components)
and (B) a 5-batch incremental ingest into a 4096-bucket store, while a
sampler thread tracks the peak resident set across the driver, the local
JVM and every Python worker — the OOM/spill-collapse evidence a 50× run
is for.

Usage: SPARK_GRAFT_CPUS=32 python scripts/bench_sf1.py [sf_dir] [amplify]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from minhash_spark.operators.cluster import connected_components
from minhash_spark.operators.lsh import bands_table, candidate_pairs, release_persisted
from minhash_spark.operators.signatures import with_minhash_signature
from minhash_spark.operators.verify import verify_pairs
from minhash_spark.queries import CFG
from minhash_spark.session import get_spark, default_parallelism
import bench

PAGE = os.sysconf("SC_PAGE_SIZE")


def _proc_table() -> dict[int, tuple[int, int]]:
    """pid → (ppid, rss_bytes) for every live process."""
    out = {}
    for d in os.listdir("/proc"):
        if not d.isdigit():
            continue
        try:
            with open(f"/proc/{d}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            # fields after comm: state(0) ppid(1) ... rss(21)
            out[int(d)] = (int(parts[1]), int(parts[21]) * PAGE)
        except (OSError, IndexError, ValueError):
            continue
    return out


def _tree_rss(root: int) -> int:
    """Total RSS of `root` and all its descendants (JVM, pyspark daemons,
    Arrow workers)."""
    table = _proc_table()
    children: dict[int, list[int]] = {}
    for pid, (ppid, _) in table.items():
        children.setdefault(ppid, []).append(pid)
    total, stack = 0, [root]
    while stack:
        pid = stack.pop()
        if pid in table:
            total += table[pid][1]
            stack.extend(children.get(pid, []))
    return total


class PeakSampler(threading.Thread):
    """Tracks two peaks: tree RSS (driver + JVM + every Python worker) and
    scratch bytes (shuffle/checkpoint growth on the local-dir mounts above
    their level at start — on tmpfs this IS memory, so it's the number that
    decides whether a run OOMs)."""

    MOUNTS = ("/dev/shm", "/tmp")

    def __init__(self, interval: float = 2.0):
        super().__init__(daemon=True)
        self.interval = interval
        self.peak = 0
        self.peak_scratch = 0
        self._base = {m: shutil.disk_usage(m).used for m in self.MOUNTS}
        self._halt = threading.Event()

    def run(self) -> None:
        me = os.getpid()
        while not self._halt.is_set():
            self.peak = max(self.peak, _tree_rss(me))
            scratch = sum(
                max(0, shutil.disk_usage(m).used - self._base[m])
                for m in self.MOUNTS
            )
            self.peak_scratch = max(self.peak_scratch, scratch)
            self._halt.wait(self.interval)

    def stop(self) -> int:
        self._halt.set()
        self.join(timeout=5)
        return self.peak


def dedup_e2e(spark, docs) -> dict:
    n_docs = docs.count()
    t0 = time.time()
    sigs = with_minhash_signature(docs, CFG, packed=True).select(
        "doc_id", "minhash"
    ).persist()
    bands = bands_table(sigs, CFG, id_col="doc_id")
    cands = candidate_pairs(bands, CFG, id_col="doc_id")
    # localCheckpoint (eager) instead of persist: truncating the lineage here
    # lets the ContextCleaner delete the signature/band/verify shuffle files
    # once the upstream refs are released — with a plain persist the full
    # lineage pins every shuffle for recompute and scratch grows to ~100 GB
    # at 5M docs (= the tmpfs OOM this run exists to catch)
    verified = verify_pairs(cands, sigs, CFG, id_col="doc_id").localCheckpoint()
    sigs.unpersist()
    release_persisted()
    spark.sparkContext._jvm.System.gc()  # reap dead shuffles before CC
    clusters = connected_components(verified)
    n_clustered = clusters.count()
    wall = round(time.time() - t0, 1)

    group = lambda c: F.struct(
        F.pmod(c, F.lit(10_000_000)).alias("base"),
        (c / F.lit(10_000_000 * bench.N_CLONES)).cast("long").alias("mut"),
    )
    found = verified.where(group(F.col("url_a")) == group(F.col("url_b"))).count()
    n_groups = n_docs // bench.N_CLONES
    expected = n_groups * (bench.N_CLONES * (bench.N_CLONES - 1) // 2)
    verified.unpersist()
    return {
        "n_docs": n_docs,
        "wall_sec": wall,
        "docs_per_sec": round(n_docs / wall, 1),
        "n_clustered_docs": n_clustered,
        "recall": round(found / expected, 5) if expected else 1.0,
    }


def incremental(spark, docs, n_batches: int = 5, n_store_buckets: int = 4096) -> dict:
    from minhash_spark.streaming.incremental import incremental_dedup_batch

    store = tempfile.mkdtemp(prefix="bench_sf1_store_", dir="/dev/shm")
    shutil.rmtree(store, ignore_errors=True)
    out = []
    try:
        for i in range(n_batches):
            batch = docs.where(F.pmod(F.col("url"), F.lit(n_batches)) == i)
            t0 = time.time()
            n_pairs = incremental_dedup_batch(
                spark, batch, store, CFG, epoch_id=i, n_store_buckets=n_store_buckets
            ).count()
            out.append(
                {"batch": i, "wall_sec": round(time.time() - t0, 1),
                 "verified_pairs": n_pairs}
            )
            print(f"# incr {out[-1]}", file=sys.stderr, flush=True)
    finally:
        shutil.rmtree(store, ignore_errors=True)
    return {"n_store_buckets": n_store_buckets, "batches": out}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    amplify = int(sys.argv[2]) if len(sys.argv) > 2 else 1000

    # shorten the cleaner's periodic driver GC (default 30 min): shuffle
    # files are only deleted after their dependency objects are collected,
    # and a 5M-doc run writes scratch faster than the default reclaims it
    spark = get_spark(
        "minhash-sf1-bench",
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    sampler = PeakSampler()
    sampler.start()

    docs = bench.corpus_parquet(spark, sf_dir, amplify).select("doc_id", "text")
    e2e = dedup_e2e(spark, docs)
    print(f"# e2e {e2e}", file=sys.stderr, flush=True)
    # fresh session between phases: stopping the context deletes phase-1's
    # entire scratch dir (shuffle + checkpoint blocks), so the incremental
    # phase starts from zero scratch — the cluster analog is per-job scratch
    spark.stop()
    spark = get_spark(
        "minhash-sf1-bench-incr",
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    docs = bench.corpus_parquet(spark, sf_dir, amplify).select("doc_id", "text")
    incr = incremental(
        spark, docs.select(F.col("doc_id").alias("url"), "text")
    )
    peak = sampler.stop()
    print(
        json.dumps(
            {
                "metric": "sf1_scale",
                "sf": os.path.basename(sf_dir.rstrip("/")),
                "amplify": amplify,
                "cpus": default_parallelism(),
                "dedup_e2e": e2e,
                "incremental": incr,
                "peak_tree_rss_gb": round(peak / 2**30, 2),
                "peak_scratch_gb": round(sampler.peak_scratch / 2**30, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
