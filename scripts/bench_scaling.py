"""Two-cluster-size scaling evidence (north rule: throughput scaling
efficiency ≥ 0.8 between N and 4N executors). No real cluster exists in this
sandbox, so the same bench job runs at local[8] and local[32] on identical
input; efficiency = (throughput_32 / throughput_8) / 4 over the dedup
headline. Writes BENCH/BASELINE.md.

Usage: python scripts/bench_scaling.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


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


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    results = {}
    for cpus in (8, 32):
        t0 = time.time()
        results[cpus] = run_bench(cpus, sf_dir)
        print(f"local[{cpus}]: {json.dumps(results[cpus])} "
              f"(wall {time.time()-t0:.0f}s)", flush=True)

    tp8 = results[8]["dedup_docs_per_sec"]
    tp32 = results[32]["dedup_docs_per_sec"]
    eff = (tp32 / tp8) / 4
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    rows = "\n".join(
        f"| {q} | {results[8]['queries'][q]} | {results[32]['queries'][q]} |"
        for q in results[8]["queries"]
    )
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH — measured throughput & scaling evidence

Input: `{sf_dir}` (documents amplified ×{results[8]['amplify']} with perturbed
replicas → {results[8]['dedup_docs']} docs for the dedup headline), identical
for both runs. Sandbox stand-in for N vs 4N executors: `local[8]` vs
`local[32]` (same machine, same input, per driver instruction).

| metric | local[8] | local[32] |
|---|---|---|
| dedup e2e throughput (docs/sec) | {tp8} | {tp32} |
| dedup e2e seconds | {results[8]['queries']['dedup_minhash_e2e']} | {results[32]['queries']['dedup_minhash_e2e']} |
| headline total seconds | {results[8]['value']} | {results[32]['value']} |

**Scaling efficiency (dedup headline): (T8/T32)/4 = ({tp32}/{tp8})/4 =
{eff:.3f}** (target ≥ 0.8 — north rule).

Per-query seconds:

| query | local[8] | local[32] |
|---|---|---|
{rows}

Raw JSON:

```
{json.dumps(results[8])}
{json.dumps(results[32])}
```

## Reference baseline

The reference repo publishes no numbers (BASELINE.md at repo root);
correctness parity is the sketch-semantics equality enforced by
tests (kernels == serial oracle, Spark == kernels) and the dup-pair
recall ≥ 0.99 e2e gate (tests/test_pipeline.py).
""")
    print(f"\nscaling efficiency: {eff:.3f} → BENCH/BASELINE.md")


if __name__ == "__main__":
    main()
