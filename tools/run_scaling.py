"""N-vs-4N scaling evidence (BASELINE.json north rule).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the SAME MinHash-LSH job on the SAME
input at local[8] and local[32] (one fresh JVM each, spawned via
spark-submit) and reporting docs/sec at both plus scaling efficiency
(T_8 / T_32) / 4. Results are appended to BENCH/BASELINE.md.

Usage: python tools/run_scaling.py [n_docs]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_JOB = """
import json, os, sys, time
sys.path.insert(0, {repo!r})
from sparkdedup.session import get_spark
from sparkdedup.io import with_doc_id
from sparkdedup.config import MinHashConfig
from sparkdedup.minhash import minhash_dedup

cores = int(sys.argv[1])
corpus = sys.argv[2]
spark = get_spark(app_name=f"scale-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=2 * cores)
spark.sparkContext.setLogLevel("ERROR")
df = with_doc_id(spark.read.parquet(corpus), id_column="doc_id")
n = df.count()
t0 = time.time()
res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
survivors = res.kept.count()
wall = time.time() - t0
print(json.dumps({{"cores": cores, "n_docs": n, "survivors": survivors,
                  "seconds": round(wall, 2),
                  "docs_per_sec": round(n / wall, 1)}}))
spark.stop()
"""


def run(cores: int, corpus: str) -> dict:
    job = _JOB.format(repo=REPO)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(job)
        path = f.name
    out = subprocess.run(
        [sys.executable, path, str(cores), corpus],
        capture_output=True,
        text=True,
        timeout=3600,
    )
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    corpus = f"/tmp/sparkdedup_scale_{n_docs}.parquet"
    if not os.path.exists(corpus):
        print(f"generating {n_docs}-doc corpus at {corpus} ...")
        from sparkdedup.fixtures import write_code_files

        write_code_files(corpus, n_rows=n_docs, seed=42)

    r8 = run(8, corpus)
    print("local[8]:", r8)
    r32 = run(32, corpus)
    print("local[32]:", r32)
    assert r8["survivors"] == r32["survivors"], "parallelism changed the result!"

    eff = (r8["seconds"] / r32["seconds"]) / 4
    report = {
        "n_docs": n_docs,
        "local8": r8,
        "local32": r32,
        "scaling_efficiency_8_to_32": round(eff, 3),
    }
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
