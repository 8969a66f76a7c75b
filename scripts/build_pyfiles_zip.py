"""Build the --py-files archive for spark-submit deployment:

    python scripts/build_pyfiles_zip.py [out.zip]
    spark-submit --master <cluster> --py-files minhash_spark.zip \
        scripts/run_pipeline.py --input /data/pages --output /data/out

The archive contains the minhash_spark package only (no tests/benches);
driver AND executors import from it, so the repo checkout is not needed on
the cluster. Note the spark-submit client-mode quirk: the zip lands on the
driver's sys.path at launch, so top-of-file imports of minhash_spark work;
scripts should still import after argument parsing (run_pipeline.py does)
to fail fast on usage errors without a Spark dependency.
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build(out_path: str) -> int:
    n = 0
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, dirs, files in os.walk(os.path.join(REPO, "minhash_spark")):
            dirs[:] = [d for d in dirs if d != "__pycache__"]
            for f in files:
                if f.endswith(".py"):
                    p = os.path.join(root, f)
                    zf.write(p, os.path.relpath(p, REPO))
                    n += 1
    return n


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "minhash_spark.zip"
    n = build(out)
    print(f"{out}: {n} files")
