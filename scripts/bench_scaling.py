"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 between N and 4N executors). No real cluster exists in this
sandbox, so the same bench job runs at two parallelism levels on the same
machine and input; efficiency = (throughput_4N / throughput_N) / 4 over the
dedup headline.

Two pairs are reported:
- local[2] → local[8]: both levels far below the machine's shared-resource
  ceiling — measures the pipeline's intrinsic parallel scalability (the
  honest stand-in for N → 4N executor MACHINES, which multiply memory
  bandwidth and disks along with cores).
- local[8] → local[32]: saturates the single shared DRAM bus; the
  memory-bound hashing kernel alone caps at ~0.6 efficiency here (measured
  via plain multiprocessing, no Spark — recorded below), so this pair
  documents the single-box ceiling rather than the pipeline's scalability.

Writes BENCH/BASELINE.md. Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# (N cores, 4N cores, corpus amplification). Each pair runs on IDENTICAL
# input at both levels; the bigger pair gets the bigger corpus so parallel
# compute dominates fixed scheduling latency.
PAIRS = [(2, 8, 100), (8, 32, 100)]


def run_bench(cpus: int, sf_dir: str, amplify: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_AMPLIFY=str(amplify),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
        cwd=REPO,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def kernel_scaling() -> dict[int, float]:
    """Pure-numpy kernel throughput via multiprocessing (no Spark) — the
    hardware ceiling measurement."""
    code = r"""
import sys, time, json
sys.path.insert(0, %r)
from multiprocessing import Pool
from minhash_spark.functions.shingles import char_shingles
from minhash_spark.functions.kernels import min_sketch_batch
from minhash_spark.queries import CFG
import duckdb
texts = duckdb.sql("select text from '/root/testdata/sf0.01/documents.parquet'").df()["text"].tolist() * 20
sets = [char_shingles(t, CFG.shingle_size) for t in texts]
def work(i):
    min_sketch_batch(sets, CFG.minhash)
out = {}
for n in (2, 8, 32):
    with Pool(n) as p:
        t0 = time.time(); p.map(work, range(n)); wall = time.time() - t0
    out[n] = round(n * len(texts) / wall, 0)
print(json.dumps(out))
""" % REPO
    res = subprocess.run([sys.executable, "-c", code], capture_output=True, text=True, cwd=REPO)
    line = [l for l in res.stdout.splitlines() if l.startswith("{")][-1]
    return {int(k): v for k, v in json.loads(line).items()}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results: dict[tuple, dict] = {}
    effs = {}
    for n, n4, amp in PAIRS:
        for cpus in (n, n4):
            t0 = time.time()
            results[(cpus, amp)] = run_bench(cpus, sf_dir, amp)
            print(
                f"local[{cpus}] amp={amp}: {json.dumps(results[(cpus, amp)])} "
                f"(wall {time.time()-t0:.0f}s)",
                flush=True,
            )
        effs[(n, n4, amp)] = (
            results[(n4, amp)]["dedup_docs_per_sec"]
            / results[(n, amp)]["dedup_docs_per_sec"]
        ) / 4
        print(f"pair ({n}→{n4}, amp {amp}): eff {effs[(n, n4, amp)]:.3f}", flush=True)
    kern = kernel_scaling()
    print(f"kernel multiproc docs/s: {kern}", flush=True)

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    kern_eff_8_32 = (kern[32] / kern[8]) / 4
    kern_eff_2_8 = (kern[8] / kern[2]) / 4
    pair_rows = "\n".join(
        f"| local[{n}] → local[{n4}] | ×{amp} → {results[(n, amp)]['dedup_docs']} docs "
        f"| {results[(n, amp)]['dedup_docs_per_sec']} | {results[(n4, amp)]['dedup_docs_per_sec']} "
        f"| **{effs[(n, n4, amp)]:.3f}** |"
        for n, n4, amp in PAIRS
    )
    raw = "\n".join(json.dumps(v) for v in results.values())
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured throughput & scaling evidence

Input: `{sf_dir}` documents, amplified into near-dup clusters (5-clone
clusters × distinct mutations; see bench.amplified_docs). Each scaling pair
runs on IDENTICAL input at both parallelism levels (driver instruction:
evidence the N vs 4N executor rule with two local levels — no real cluster
in this sandbox).

## Scaling efficiency (dedup e2e headline, (tp_4N/tp_N)/4, target ≥ 0.8)

| pair | corpus | docs/s @N | docs/s @4N | efficiency |
|---|---|---|---|---|
{pair_rows}

Reading the two pairs:
- **local[2] → local[8]** measures intrinsic pipeline scalability with both
  levels below the machine's shared-resource ceiling — the faithful stand-in
  for N → 4N executor *machines*, which multiply DRAM bandwidth and disks
  along with cores.
- **local[8] → local[32]** saturates the single shared DRAM bus of this one
  box: the pure-numpy hashing kernel alone (no Spark, plain multiprocessing)
  measures {kern_eff_8_32:.2f} efficiency on this pair vs {kern_eff_2_8:.2f} on 2→8 —
  that bound is hardware, not orchestration.

Kernel-only multiprocessing throughput (docs/s, no Spark): {json.dumps(kern)}

## Raw bench JSON

```
{raw}
```

## Reference baseline

The reference repo publishes no numbers (BASELINE.md at repo root);
correctness parity is the sketch-semantics equality enforced by tests
(vectorized kernels == serial oracle clone; Spark output == kernels) and the
dup-pair recall ≥ 0.99 e2e gate (tests/test_pipeline.py).
""")
    print("→ BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
