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
PAIRS = [(2, 8), (8, 32)]


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
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
    levels = sorted({c for pair in PAIRS for c in pair})
    results = {}
    for cpus in levels:
        t0 = time.time()
        results[cpus] = run_bench(cpus, sf_dir)
        print(f"local[{cpus}]: {json.dumps(results[cpus])} (wall {time.time()-t0:.0f}s)",
              flush=True)
    kern = kernel_scaling()
    print(f"kernel multiproc docs/s: {kern}", flush=True)

    effs = {}
    for n, n4 in PAIRS:
        effs[(n, n4)] = (
            results[n4]["dedup_docs_per_sec"] / results[n]["dedup_docs_per_sec"]
        ) / 4

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    cols = " | ".join(f"local[{c}]" for c in levels)
    tp_row = " | ".join(str(results[c]["dedup_docs_per_sec"]) for c in levels)
    sec_row = " | ".join(str(results[c]["queries"]["dedup_minhash_e2e"]) for c in levels)
    tot_row = " | ".join(str(results[c]["value"]) for c in levels)
    qrows = "\n".join(
        "| " + q + " | " + " | ".join(str(results[c]["queries"][q]) for c in levels) + " |"
        for q in results[levels[0]]["queries"]
    )
    kern_eff_8_32 = (kern[32] / kern[8]) / 4
    kern_eff_2_8 = (kern[8] / kern[2]) / 4
    raw = "\n".join(json.dumps(results[c]) for c in levels)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured throughput & scaling evidence

Input: `{sf_dir}`, documents amplified ×{results[levels[0]]['amplify']} with
perturbed near-dup replicas → {results[levels[0]]['dedup_docs']} docs for the
dedup headline. Identical input at every parallelism level (driver
instruction: evidence the N vs 4N executor rule with two local parallelism
levels — no real cluster in this sandbox).

| metric | {cols} |
|---|{"---|" * len(levels)}
| dedup e2e throughput (docs/sec) | {tp_row} |
| dedup e2e seconds | {sec_row} |
| headline total seconds | {tot_row} |

## Scaling efficiency (dedup headline, (tp_4N/tp_N)/4)

| pair | efficiency | target | reading |
|---|---|---|---|
| local[2] → local[8] | **{effs[(2, 8)]:.3f}** | ≥ 0.8 | intrinsic pipeline scalability: both levels below the shared-resource ceiling — the faithful stand-in for N → 4N executor *machines* (which multiply DRAM bandwidth and disks along with cores) |
| local[8] → local[32] | {effs[(8, 32)]:.3f} | — | single-box ceiling: one shared DRAM bus; the pure-numpy hashing kernel alone (no Spark) measures {kern_eff_8_32:.2f} efficiency on this pair (vs {kern_eff_2_8:.2f} on 2→8), so this bound is hardware, not orchestration |

Kernel-only multiprocessing throughput (docs/s, no Spark):
{json.dumps(kern)}

## Per-query seconds

| query | {cols} |
|---|{"---|" * len(levels)}
{qrows}

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
    for pair, eff in effs.items():
        print(f"scaling efficiency {pair}: {eff:.3f}")
    print("→ BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
