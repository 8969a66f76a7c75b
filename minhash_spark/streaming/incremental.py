"""Incremental ingest via Structured Streaming.

The reference is a batch data structure — its "infinite write" tests are
throughput harnesses, not streaming semantics
(/root/reference/test/fcds/test_fixed_queries_infinite_write.c:94-99) — so
streaming here is an ENGINE capability, not reference parity: new page files
land in a directory, signatures are computed per micro-batch (same Arrow UDF
as the batch path — the signature is insertion-order independent, so
incremental == batch by the reference's own determinism invariant), and each
micro-batch is deduplicated against the accumulated signature store
(mergeability: sketch(A ∪ B) = merge semantics, src/utils/utils.c:36-46).

``availableNow`` triggers make the same code run as a drain-and-stop job —
the pattern for periodic incremental dedup over a landing zone.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from ..config import DedupConfig
from ..operators.signatures import with_minhash_signature
from ..operators.lsh import bands_table, candidate_pairs
from ..operators.verify import verify_pairs

PAGES_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ]
)


def stream_signatures(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
):
    """File-source stream → signature store (append-only parquet). Returns
    the StreamingQuery; with available_now=True it drains pending files and
    stops (call .awaitTermination())."""
    cfg = cfg or DedupConfig()
    src = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(input_dir)
        .select("url", "text")
    )
    sigs = with_minhash_signature(src, cfg).select("url", "minhash")
    writer = (
        sigs.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# on-disk signature representation of THIS build (packed little-endian int32
# buffers); stamped into _store_meta.json because band_key derivation depends
# on it — see _effective_store_buckets
_SIG_FORMAT = "packed-i4le"


def _store_subdirs(store_path: str) -> tuple[str, str]:
    return os.path.join(store_path, "signatures"), os.path.join(store_path, "bands")


def _has_batches(path: str) -> bool:
    return os.path.isdir(path) and any(
        d.startswith("batch_id=") for d in os.listdir(path)
    )


def _effective_store_buckets(store_path: str, requested: int | None) -> int:
    """The store's bucket count is a property of its on-disk LAYOUT: every
    batch must hash with the same modulus or later reads would prune to the
    wrong directories and silently MISS candidates. The first batch writes
    `_store_meta.json`; afterwards the persisted value wins over the
    argument (a mismatch is logged, not fatal — the store knows best).

    `requested=None` is the READ-ONLY lookup path (probe_store): the caller
    has no opinion about the layout, so the stored value is returned with no
    mismatch warning; a store with no meta cannot be probed."""
    import json
    import logging

    os.makedirs(store_path, exist_ok=True)
    meta_path = os.path.join(store_path, "_store_meta.json")
    if not os.path.exists(meta_path) and any(
        _has_batches(d) for d in _store_subdirs(store_path)
    ):
        # a populated store with no manifest predates the bucketed layout —
        # stamping fresh meta would make pruned_store_read fail later with
        # an unrelated-looking missing-`store_bucket`-column error
        raise ValueError(
            f"incremental store {store_path} contains batches but no "
            "_store_meta.json: legacy/unbucketed store layout. Rebuild the "
            "store (or migrate it by adding store_bucket partition columns "
            "and a _store_meta.json with its n_store_buckets)."
        )
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
        stored = int(meta["n_store_buckets"])
        if meta.get("sig_format") != _SIG_FORMAT:
            # band_key values differ between signature representations
            # (xxhash64 of an int list vs of packed bytes) — a batch written
            # in another format would silently never collide with this store
            raise ValueError(
                f"incremental store {store_path} was written with signature "
                f"format {meta.get('sig_format')!r}; this build writes "
                f"{_SIG_FORMAT!r}. Rebuild the store."
            )
        if requested is not None and stored != requested:
            logging.getLogger(__name__).warning(
                "incremental store %s was created with n_store_buckets=%d; "
                "ignoring requested %d (the layout is fixed at creation)",
                store_path, stored, requested,
            )
        return stored
    if requested is None:
        raise ValueError(
            f"incremental store {store_path} has no _store_meta.json — "
            "nothing to probe (read-only lookups need an existing store)"
        )
    with open(meta_path, "w") as f:
        json.dump({"n_store_buckets": requested, "sig_format": _SIG_FORMAT}, f)
    return requested


_MANIFEST = "_bucket_manifest.json"

# ---- key-level manifest Bloom filters --------------------------------------
# Bucket-level (directory) pruning cannot help a batch whose band keys touch
# every store bucket: directory pruning excludes nothing and the batch-vs-
# store join input grows O(store). These per-(batch, bucket) Bloom filters
# over the partition's KEY SET prune INSIDE touched buckets: a store
# partition is read only if at least one of the micro-batch's keys may be
# present in it. This is the Spark analog of the reference's merge-
# amortization knob `b` (src/parallel/minhash-concurrent.c:494-506) applied
# to reads — stale store regions the new data cannot collide with are never
# scanned. Bloom filters have NO false negatives, so pruning can never drop
# a real candidate; false positives only cost an extra partition read.
_BLOOM_K = 4  # probes per key
_BLOOM_BITS_PER_KEY = 24  # → fill ≈ 0.15 at k=4 → fpp ≈ 5e-4 per key test
_BLOOM_MIN_BITS = 1024
# driver-side cap on collected (bucket, key) rows for read-time probing;
# past it the batch is "wide" and key pruning degrades to bucket pruning
_KEY_PRUNE_MAX_KEYS = 1 << 18


def _bloom_m_bits(n_keys: int) -> int:
    m = _BLOOM_MIN_BITS
    while m < n_keys * _BLOOM_BITS_PER_KEY:
        m <<= 1
    return m


def _bloom_positions(keys_u64, m: int):
    """(n, k) bit positions via splitmix64 double hashing — pure-numpy and
    deterministic, so the write-side builder (executor pandas UDF) and the
    read-side prober (driver) agree bit-for-bit."""
    import numpy as np

    def mix(x, c):
        x = x + np.uint64(c)
        x ^= x >> np.uint64(30)
        x *= np.uint64(0xBF58476D1CE4E5B9)
        x ^= x >> np.uint64(27)
        x *= np.uint64(0x94D049BB133111EB)
        x ^= x >> np.uint64(31)
        return x

    keys_u64 = np.asarray(keys_u64, dtype=np.uint64)
    h1 = mix(keys_u64, 0x9E3779B97F4A7C15)
    h2 = mix(keys_u64, 0xD1B54A32D192ED03) | np.uint64(1)
    i = np.arange(_BLOOM_K, dtype=np.uint64)
    return (h1[:, None] + i[None, :] * h2[:, None]) & np.uint64(m - 1)


def _bloom_build(keys_u64, m: int):
    import numpy as np

    bitmap = np.zeros(m // 8, dtype=np.uint8)
    pos = _bloom_positions(keys_u64, m).ravel()
    np.bitwise_or.at(bitmap, pos >> np.uint64(3), (1 << (pos & np.uint64(7))).astype(np.uint8))
    return bitmap


def _bloom_maybe_any(bitmap, m: int, keys_u64) -> bool:
    """True iff AT LEAST ONE key may be present (all k bits set for it)."""
    import numpy as np

    pos = _bloom_positions(keys_u64, m)
    bits = (bitmap[(pos >> np.uint64(3)).astype(np.int64)] >> (pos & np.uint64(7)).astype(np.uint8)) & 1
    return bool(bits.all(axis=1).any())


_BLOOM_ROW_SCHEMA = "store_bucket int, n long, m long, bits binary"


def _bucket_blooms(df_bucketed: DataFrame, key_col: str) -> dict[str, dict]:
    """One Bloom filter per store_bucket over the partition's distinct int64
    keys, built distributively (groupBy + applyInPandas: executors see the
    keys they are about to write; the driver collects only one ~m/8-byte row
    per bucket — bounded by the store layout, not the batch size)."""
    import base64

    import numpy as np
    import pandas as pd

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = np.unique(pdf["k"].to_numpy(dtype=np.int64).view(np.uint64))
        m = _bloom_m_bits(len(keys))
        return pd.DataFrame(
            {
                "store_bucket": [int(pdf["store_bucket"].iloc[0])],
                "n": [len(keys)],
                "m": [m],
                "bits": [_bloom_build(keys, m).tobytes()],
            }
        )

    rows = (
        df_bucketed.select("store_bucket", F.col(key_col).alias("k"))
        .groupBy("store_bucket")
        .applyInPandas(build, _BLOOM_ROW_SCHEMA)
        .collect()
    )
    return {
        str(r["store_bucket"]): {
            "n": int(r["n"]),
            "m": int(r["m"]),
            "bits": base64.b64encode(bytes(r["bits"])).decode(),
        }
        for r in rows
    }


def _write_bucket_manifest(
    batch_dir: str,
    blooms: dict[str, dict] | None = None,
    extra: dict | None = None,
) -> list[int]:
    """Record which store_bucket partitions a batch actually wrote, next to
    the batch's data (one listing of ONE directory at write time — cheap on
    any filesystem). Readers then prune from the manifest with zero
    filesystem listing at all: the object-store-friendly form of the
    explicit-path read (an S3 LIST per batch per micro-batch is exactly the
    metadata tax the bucketed layout exists to avoid). `blooms` additionally
    records a per-bucket key Bloom filter enabling KEY-LEVEL pruning inside
    touched buckets (see the module-level Bloom notes)."""
    buckets = sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(batch_dir)
        if d.startswith("store_bucket=")
    )
    payload: dict = {"store_buckets": buckets}
    if blooms:
        payload["bloom_k"] = _BLOOM_K
        payload["blooms"] = blooms
    if extra:
        payload.update(extra)
    with open(os.path.join(batch_dir, _MANIFEST), "w") as f:
        json.dump(payload, f)
    return buckets


def _batch_manifest(store_dir: str, batch_dir_name: str) -> dict:
    """Manifest dict for one batch directory: the stored manifest if
    available (no listing), else a synthesized {store_buckets} from a
    directory listing (stores written before manifests — no blooms)."""
    batch_dir = os.path.join(store_dir, batch_dir_name)
    mpath = os.path.join(batch_dir, _MANIFEST)
    if os.path.exists(mpath):
        with open(mpath) as f:
            return json.load(f)
    return {
        "store_buckets": [
            int(d.split("=", 1)[1])
            for d in os.listdir(batch_dir)
            if d.startswith("store_bucket=")
        ]
    }


def _batch_buckets(store_dir: str, batch_dir_name: str) -> list[int]:
    return _batch_manifest(store_dir, batch_dir_name)["store_buckets"]


def _bucket_col(col: str, n_buckets: int):
    """Stable hash bucket for store partitioning. band_key is already an
    xxhash64 value, so a plain pmod spreads it uniformly; other columns get
    an xxhash64 first."""
    c = F.col(col) if col == "band_key" else F.xxhash64(F.col(col))
    return F.pmod(c, F.lit(n_buckets)).cast("int")


def _collect_key_filter(
    df: DataFrame, bucket_expr, key_expr, cap: int = _KEY_PRUNE_MAX_KEYS
) -> dict[int, "object"] | None:
    """Driver-side {bucket: uint64 key array} of the batch's distinct
    (bucket, key) pairs, for Bloom probing of store partitions. Returns None
    when the batch is too wide to collect (> cap distinct keys) — callers
    then fall back to bucket-level pruning only. The collect is explicitly
    bounded: ≤ cap rows of (int, long)."""
    import numpy as np

    pairs = df.select(
        bucket_expr.alias("__b"), key_expr.alias("__k")
    ).distinct()
    # limit(cap+1) bounds the size check itself — no full count of a wide
    # batch's key set just to learn it is too big
    rows = pairs.limit(cap + 1).collect()
    if len(rows) > cap:
        return None
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(int(r["__b"]), []).append(r["__k"])
    return {
        b: np.array(ks, dtype=np.int64).view(np.uint64) for b, ks in out.items()
    }


def pruned_store_read(
    spark: SparkSession,
    store_dir: str,
    epoch_id: int,
    touched_buckets: list[int],
    key_filter: dict[int, "object"] | None = None,
) -> DataFrame:
    """Read a bucketed store side (`<store>/bands` or `<store>/signatures`)
    pruned to (a) batches other than `epoch_id` (a failed previous attempt of
    this same epoch is about to be overwritten) and (b) only the hash buckets
    in `touched_buckets`.

    The touched partition directories are enumerated EXPLICITLY and passed as
    scan paths (with basePath so the partition columns survive) instead of
    root-reading the store and filtering: a root read must LIST the whole
    store before partition pruning can apply, which is O(total batches ×
    buckets) file-system metadata per micro-batch — measured 45 s for a
    3-document probe against a 10-batch × 1024-bucket store, vs O(touched)
    existence checks here. On a real deployment the listdir/isdir calls
    below are the same O(touched) calls against the object store (or an
    Iceberg manifest lookup). df.inputFiles() on the result shows exactly
    the touched files. Falls back to the filtered root read when no touched
    directory exists yet (rare; also keeps the right schema for the empty
    result).

    With `key_filter` ({bucket: uint64 key array} of the batch's keys), a
    touched partition is additionally Bloom-probed against its manifest's
    per-bucket key filter and skipped when NO batch key can be present —
    key-level pruning inside touched buckets, the piece bucket pruning
    cannot provide when a wide batch touches every bucket. Partitions whose
    manifests predate blooms are kept unconditionally (no false pruning)."""
    import base64

    import numpy as np

    want = {int(b) for b in touched_buckets}
    paths: list[str] = []
    bloom_pruned: list[str] = []
    if os.path.isdir(store_dir):
        for d in os.listdir(store_dir):
            if not d.startswith("batch_id="):
                continue
            if int(d.split("=", 1)[1]) == epoch_id:
                continue
            man = _batch_manifest(store_dir, d)
            blooms = man.get("blooms") or {}
            for b in want.intersection(man["store_buckets"]):
                path = os.path.join(store_dir, d, f"store_bucket={b}")
                if key_filter is not None and str(b) in blooms:
                    keys = key_filter.get(b)
                    info = blooms[str(b)]
                    if (
                        keys is None
                        or not len(keys)
                        or not _bloom_maybe_any(
                            np.frombuffer(
                                base64.b64decode(info["bits"]), dtype=np.uint8
                            ),
                            int(info["m"]),
                            keys,
                        )
                    ):
                        # no batch key can be in this partition
                        bloom_pruned.append(path)
                        continue
                paths.append(path)
    if not paths:
        if bloom_pruned:
            # every bucket-matching partition was Bloom-rejected: the join
            # result is provably empty — return an empty frame with the
            # store schema (one footer read) instead of falling back to a
            # whole-store root read that would defeat the pruning
            return (
                spark.read.option("basePath", store_dir)
                .parquet(bloom_pruned[0])
                .limit(0)
            )
        return spark.read.parquet(store_dir).where(
            (F.col("batch_id") != epoch_id)
            & F.col("store_bucket").isin(list(want))
        )
    return spark.read.option("basePath", store_dir).parquet(*paths)


def incremental_dedup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    cfg: DedupConfig | None = None,
    epoch_id: int = 0,
    n_store_buckets: int = 64,
    key_prune: bool = True,
) -> DataFrame:
    """Dedup one micro-batch against the accumulated signature store:
    signatures + LSH bands for the batch, band join of the new bands against
    the PERSISTED band store ∪ batch bands, verified pairs returned; batch
    signatures and bands appended to the store. Designed for foreachBatch
    (pass its epoch_id through).

    Scale + exactly-once design:
    - The band table is a persisted, incrementally-grown store
      (`<store>/bands/batch_id=N/`), NOT recomputed from all signatures each
      micro-batch — at corpus scale re-banding the store would make every
      batch O(corpus).
    - Both store sides are HASH-BUCKETED on write (partition column
      `store_bucket` = hash pmod n_store_buckets over band_key / url), so the
      per-batch reads prune to the directories the batch actually touches: a
      small batch against a huge store reads O(batch-touched buckets), not
      O(corpus). `n_store_buckets` is a property of the store layout — use
      the same value for every batch written to one store (size it so
      batch_docs × bands ≪ corpus_bands / n_store_buckets stays selective;
      64 suits tests, thousands suit a 10^12-doc store).
    - Store writes are IDEMPOTENT per batch: each batch overwrites its own
      batch_id-keyed partition directory, so a foreachBatch replay (failure
      after the store write but before the sink commit) rewrites the same
      data instead of appending duplicates that would inflate band-match
      counts forever. The streaming checkpoint alone cannot provide this —
      the store write is a side effect outside the sink transaction.
    """
    cfg = cfg or DedupConfig()
    n_store_buckets = _effective_store_buckets(store_path, n_store_buckets)
    sig_store, band_store = _store_subdirs(store_path)
    batch_sigs = with_minhash_signature(
        batch_df.select("url", "text"), cfg, packed=True
    ).select("url", "minhash").persist()
    new_bands = bands_table(batch_sigs, cfg).persist()

    all_sigs = batch_sigs
    prev_bands = None
    batch_is_narrow = False
    if _has_batches(sig_store):
        # key-level pruning: collect the batch's distinct (bucket, band_key)
        # pairs (bounded by _KEY_PRUNE_MAX_KEYS) and Bloom-probe each store
        # partition's manifest — partitions that contain NONE of the batch's
        # band keys are never read. A wide batch (> cap keys) falls back to
        # bucket-level pruning (where it touches everything anyway).
        band_keys = (
            _collect_key_filter(
                new_bands,
                _bucket_col("band_key", n_store_buckets),
                F.col("band_key"),
            )
            if key_prune
            else None
        )
        if band_keys is not None:
            batch_is_narrow = True
            prev_bands = pruned_store_read(
                spark, band_store, epoch_id, list(band_keys), band_keys
            )
        else:
            touched_band_buckets = [
                r[0]
                for r in new_bands.select(
                    _bucket_col("band_key", n_store_buckets).alias("b")
                )
                .distinct()
                .collect()
            ]
            prev_bands = pruned_store_read(
                spark, band_store, epoch_id, touched_band_buckets
            )

    # candidates restricted to pairs touching the new batch, in two legs so
    # each band collision is counted exactly once (the batch candidate_pairs
    # semantics): batch-vs-batch enumerates each unordered pair once via
    # url_a < url_b; batch-vs-store joins the small new-batch band table
    # against the persisted store (the sides are disjoint — the store
    # excludes this epoch — so only canonicalization is needed). A single
    # new-vs-all join would keep BOTH orderings of an intra-batch pair,
    # doubling its band-match count vs batch-vs-store pairs.
    batch_a = new_bands.select("band_key", F.col("url").alias("url_a"))
    collisions = (
        batch_a.join(
            new_bands.select("band_key", F.col("url").alias("url_b")), ["band_key"]
        )
        .where(F.col("url_a") < F.col("url_b"))
        .select("url_a", "url_b")
    )
    if prev_bands is not None:
        # a narrow batch side is broadcast: the (Bloom-surviving) store
        # partitions stream through the join with no shuffle of the store
        batch_side = F.broadcast(batch_a) if batch_is_narrow else batch_a
        store_collisions = (
            batch_side.join(
                prev_bands.select("band_key", F.col("url").alias("url_b")),
                ["band_key"],
            )
            .where(F.col("url_a") != F.col("url_b"))
            .select(
                F.least("url_a", "url_b").alias("url_a"),
                F.greatest("url_a", "url_b").alias("url_b"),
            )
        )
        collisions = collisions.unionByName(store_collisions)
    # materialize the (small) candidate set once: the url-bucket collection
    # below needs an action anyway, and checkpointing keeps the caller's
    # later materialization of `verified` from recomputing the collision join
    joined = (
        collisions.groupBy("url_a", "url_b")
        .agg(F.count("*").alias("n_bands"))
        .where(F.col("n_bands") >= cfg.min_band_matches)
        .drop("n_bands")
    ).localCheckpoint()

    if prev_bands is not None:
        # verification only needs the signatures of candidate members — prune
        # the signature-store scan to the url hash buckets the candidates
        # touch, Bloom-refined to partitions that may actually HOLD one of
        # the candidate urls (key = xxhash64(url), same derivation as the
        # write-side manifest blooms)
        url_keys = (
            _collect_key_filter(
                joined.select(F.explode(F.array("url_a", "url_b")).alias("u")),
                _bucket_col("u", n_store_buckets),
                F.xxhash64("u"),
            )
            if key_prune
            else None
        )
        if url_keys is not None:
            prev_sigs = pruned_store_read(
                spark, sig_store, epoch_id, list(url_keys), url_keys
            )
        else:
            touched_url_buckets = [
                r[0]
                for r in joined.select(
                    F.explode(
                        F.array(
                            _bucket_col("url_a", n_store_buckets),
                            _bucket_col("url_b", n_store_buckets),
                        )
                    ).alias("b")
                )
                .distinct()
                .collect()
            ]
            prev_sigs = pruned_store_read(
                spark, sig_store, epoch_id, touched_url_buckets
            )
        all_sigs = prev_sigs.select("url", "minhash").unionByName(batch_sigs)
    verified = verify_pairs(joined, all_sigs, cfg)

    # CLUSTERED write: repartition on the bucket column first so each write
    # task covers few bucket directories. Without it every task opens a
    # writer per touched bucket — at thousands of store buckets that is
    # tasks×buckets small files per batch (measured 5× slower batches at
    # 1024 buckets), and at corpus scale a metadata explosion.
    sig_out = batch_sigs.withColumn(
        "store_bucket", _bucket_col("url", n_store_buckets)
    )
    sig_out.repartition(F.col("store_bucket")).write.mode(
        "overwrite"
    ).partitionBy("store_bucket").parquet(
        os.path.join(sig_store, f"batch_id={epoch_id}")
    )
    band_out = new_bands.withColumn(
        "store_bucket", _bucket_col("band_key", n_store_buckets)
    )
    band_out.repartition(F.col("store_bucket")).write.mode(
        "overwrite"
    ).partitionBy("store_bucket").parquet(
        os.path.join(band_store, f"batch_id={epoch_id}")
    )
    # per-bucket key Bloom filters into the manifests: one extra pass over
    # the (persisted) batch per side — the write-time cost that buys the
    # key-level read pruning above for every later batch and probe
    _write_bucket_manifest(
        os.path.join(sig_store, f"batch_id={epoch_id}"),
        _bucket_blooms(
            sig_out.select("store_bucket", F.xxhash64("url").alias("k")), "k"
        ),
    )
    _write_bucket_manifest(
        os.path.join(band_store, f"batch_id={epoch_id}"),
        _bucket_blooms(band_out.select("store_bucket", "band_key"), "band_key"),
    )
    batch_sigs.unpersist()
    new_bands.unpersist()
    return verified


def probe_store(
    spark: SparkSession,
    batch_df: DataFrame,
    store_path: str,
    cfg: DedupConfig | None = None,
) -> DataFrame:
    """READ-ONLY near-dup lookup against an accumulated store: which stored
    documents is each probe document a near-duplicate of? Returns
    (url_a = probe url, url_b = stored url, est_jaccard); the store is not
    modified — the "is this already in my corpus?" API, e.g. an ingest
    gate or an eval-set decontamination check against a training corpus.

    Same pruned-read machinery as incremental_dedup_batch (touched-bucket
    manifests, O(touched) store scan), minus the intra-batch pair leg and
    minus the store writes."""
    cfg = cfg or DedupConfig()
    sig_store, band_store = _store_subdirs(store_path)
    if not _has_batches(band_store):
        raise ValueError(f"probe_store: {store_path} has no batches to probe")
    n_store_buckets = _effective_store_buckets(store_path, None)

    batch_sigs = with_minhash_signature(
        batch_df.select("url", "text"), cfg, packed=True
    ).select("url", "minhash").persist()
    new_bands = bands_table(batch_sigs, cfg)
    # epoch -1: no batch is excluded — probes read the whole (pruned) store;
    # key-level Bloom pruning applies exactly as in ingest
    band_keys = _collect_key_filter(
        new_bands, _bucket_col("band_key", n_store_buckets), F.col("band_key")
    )
    if band_keys is not None:
        prev_bands = pruned_store_read(
            spark, band_store, -1, list(band_keys), band_keys
        )
    else:
        touched = [
            r[0]
            for r in new_bands.select(
                _bucket_col("band_key", n_store_buckets).alias("b")
            )
            .distinct()
            .collect()
        ]
        prev_bands = pruned_store_read(spark, band_store, -1, touched)
    joined_plan = (
        new_bands.select("band_key", F.col("url").alias("url_a"))
        .join(
            prev_bands.select("band_key", F.col("url").alias("url_b")),
            ["band_key"],
        )
        .where(F.col("url_a") != F.col("url_b"))
        .groupBy("url_a", "url_b")
        .agg(F.count("*").alias("n_bands"))
        .where(F.col("n_bands") >= cfg.min_band_matches)
        .drop("n_bands")
    )
    # Tiny-probe fast path: collect the candidate pairs TOGETHER WITH their
    # JVM-computed sig-store bucket/key columns in ONE job — the pair set of
    # a probe is candidate pairs against the pruned store, typically a
    # handful of rows. That replaces the localCheckpoint job + the separate
    # key-filter distinct/collect job of the generic path (probe latency is
    # pure micro-job orchestration), and `joined` becomes a local relation
    # the verify joins can broadcast. Falls back to checkpoint + on-cluster
    # key collection beyond the same bounded cap the key filter uses.
    import numpy as np

    probed = joined_plan.select(
        "url_a",
        "url_b",
        _bucket_col("url_b", n_store_buckets).alias("__b"),
        F.xxhash64("url_b").alias("__k"),
    )
    rows = probed.limit(_KEY_PRUNE_MAX_KEYS + 1).collect()
    if len(rows) <= _KEY_PRUNE_MAX_KEYS:
        joined = spark.createDataFrame(
            [(r["url_a"], r["url_b"]) for r in rows],
            joined_plan.schema,
        )
        by_bucket: dict[int, list] = {}
        for r in rows:
            by_bucket.setdefault(int(r["__b"]), []).append(r["__k"])
        url_keys = {
            b: np.unique(np.array(ks, dtype=np.int64)).view(np.uint64)
            for b, ks in by_bucket.items()
        }
    else:
        joined = joined_plan.localCheckpoint()
        url_keys = _collect_key_filter(
            joined, _bucket_col("url_b", n_store_buckets), F.xxhash64("url_b")
        )
    if url_keys is not None:
        prev_sigs = pruned_store_read(
            spark, sig_store, -1, list(url_keys), url_keys
        )
    else:
        touched_urls = [
            r[0]
            for r in joined.select(
                _bucket_col("url_b", n_store_buckets).alias("b")
            )
            .distinct()
            .collect()
        ]
        prev_sigs = pruned_store_read(spark, sig_store, -1, touched_urls)
    prev_sigs = prev_sigs.select("url", "minhash")
    # a probe url may also exist IN the store (re-checking a known doc):
    # the probe's current signature is authoritative, and a url must appear
    # once in the sig table or the verify joins would duplicate its pairs
    prev_sigs = prev_sigs.join(batch_sigs.select("url"), "url", "left_anti")
    all_sigs = prev_sigs.unionByName(batch_sigs)
    out = verify_pairs(joined, all_sigs, cfg)
    batch_sigs.unpersist()
    return out


# ---- store compaction -------------------------------------------------------
# Every ingested batch adds one batch_id=N directory per store side, each
# holding up to n_store_buckets small parquet files. Reads prune by BUCKET,
# so a store of B batches pays O(B) files (and manifest probes) per touched
# bucket forever — the per-batch file fan-out is the growing cost of
# wide-batch ingest that bucket/key pruning cannot remove (the reference's
# analog is its epoch-merge amortization knob `b`,
# src/parallel/minhash-concurrent.c:494-506). Compaction rewrites the
# existing batch directories into ONE batch directory per side (same rows,
# same bucketing, one file per bucket) with a merged manifest and REBUILT
# per-bucket key Blooms, so later batches/probes read and Bloom-probe one
# partition per touched bucket instead of B.

_COMPACT_SENTINEL = -1  # probe_store's "exclude nothing" epoch — never reuse


def _side_batch_ids(side_dir: str) -> list[int]:
    if not os.path.isdir(side_dir):
        return []
    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(side_dir)
        if d.startswith("batch_id=")
    )


def _finish_pending_compaction(side_dir: str) -> None:
    """Idempotent recovery: a compacted directory's manifest lists the batch
    dirs it replaces; any of them still present (crash between the compacted
    rename and the source removal) are removed now, and an un-renamed tmp dir
    from an interrupted write is discarded."""
    import shutil

    tmp = os.path.join(side_dir, "_compacting_tmp")
    if os.path.isdir(tmp):
        shutil.rmtree(tmp)
    for d in list(os.listdir(side_dir)) if os.path.isdir(side_dir) else []:
        if not d.startswith("batch_id="):
            continue
        man = _batch_manifest(side_dir, d)
        for src in man.get("replaces", []):
            src_path = os.path.join(side_dir, src)
            if os.path.isdir(src_path):
                shutil.rmtree(src_path)


def compact_store(
    spark: SparkSession,
    store_path: str,
    min_batches: int = 2,
) -> dict:
    """Compact both sides of an incremental store: merge every existing
    batch_id directory into one compacted batch per side (content-identical
    row union — no dedup, no re-hashing), one file per store bucket, merged
    manifest with rebuilt key Blooms. Returns {side: {"merged": n, "id": id}}.

    Call between micro-batches from the ingest driver (the store's existing
    single-writer contract). Crash-safe in the store's idempotent style:
    the compacted directory is written under a tmp name and renamed into
    place before the source directories are removed; the manifest's
    `replaces` list makes recovery (re-running compact_store, or the next
    one) finish the removal. Compacted ids are negative and descending
    (-2, -3, ...) so they can never collide with a foreachBatch epoch id or
    with probe_store's exclude-nothing sentinel (-1)."""
    import shutil

    out: dict = {}
    for side_dir in _store_subdirs(store_path):
        side = os.path.basename(side_dir)
        _finish_pending_compaction(side_dir)
        ids = _side_batch_ids(side_dir)
        if len(ids) < min_batches:
            out[side] = {"merged": 0, "id": None}
            continue
        new_id = min(_COMPACT_SENTINEL, min(ids)) - 1
        src_dirs = [f"batch_id={i}" for i in ids]
        df = spark.read.option("basePath", side_dir).parquet(
            *[os.path.join(side_dir, d) for d in src_dirs]
        )
        data_cols = [c for c in df.columns if c not in ("batch_id",)]
        merged = df.select(*data_cols)
        key = "band_key" if "band_key" in df.columns else None
        tmp = os.path.join(side_dir, "_compacting_tmp")
        merged.repartition(F.col("store_bucket")).write.mode(
            "overwrite"
        ).partitionBy("store_bucket").parquet(tmp)
        compacted = spark.read.option("basePath", tmp).parquet(tmp)
        blooms = _bucket_blooms(
            compacted.select(
                "store_bucket",
                (
                    F.col("band_key") if key else F.xxhash64("url")
                ).alias("k"),
            ),
            "k",
        )
        _write_bucket_manifest(tmp, blooms, extra={"replaces": src_dirs})
        final = os.path.join(side_dir, f"batch_id={new_id}")
        os.rename(tmp, final)
        for d in src_dirs:
            shutil.rmtree(os.path.join(side_dir, d))
        out[side] = {"merged": len(ids), "id": new_id}
    return out


def maybe_compact_store(
    spark: SparkSession, store_path: str, max_batches: int = 16
) -> dict | None:
    """File-count policy hook for ingest loops: compact when either store
    side has accumulated more than `max_batches` batch directories."""
    if any(
        len(_side_batch_ids(d)) > max_batches for d in _store_subdirs(store_path)
    ):
        return compact_store(spark, store_path)
    return None
