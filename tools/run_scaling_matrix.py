"""Definitive scaling matrix: for each core count, run the identical
MinHash job N times inside one fresh JVM on a FIXED partition plan
(SCALE_PARTS, default 64) and report every repetition plus min and
median (the VM has ~2x run-to-run noise; min-of-N is the defensible
sustained number). SCALE_REPS controls repetitions.

Writes BENCH/scaling_matrix.json.
Usage: python tools/run_scaling_matrix.py [n_docs] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_JOB = """
import json, sys, time
sys.path.insert(0, {repo!r})
from sparkdedup.session import get_spark
from sparkdedup.io import with_doc_id
from sparkdedup.config import MinHashConfig
from sparkdedup.minhash import minhash_dedup

cores = int(sys.argv[1]); corpus = sys.argv[2]; reps = int(sys.argv[3])
parts = int(__import__("os").environ.get("SCALE_PARTS", "64"))
spark = get_spark(app_name=f"scale-{{cores}}", master=f"local[{{cores}}]", shuffle_partitions=parts)
spark.sparkContext.setLogLevel("ERROR")
df = with_doc_id(spark.read.parquet(corpus).repartition(parts), id_column="doc_id")
n = df.count()
times, survivors = [], None
for _ in range(reps):
    spark.catalog.clearCache()
    t0 = time.time()
    res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
    s = res.kept.count()
    times.append(round(time.time() - t0, 2))
    assert survivors is None or s == survivors
    survivors = s
times_sorted = sorted(times)
median = times_sorted[len(times_sorted) // 2]
print(json.dumps({{"cores": cores, "n_docs": n, "survivors": survivors,
                  "runs": times, "best": min(times), "median": median,
                  "best_docs_per_sec": round(n / min(times), 1),
                  "median_docs_per_sec": round(n / median, 1)}}))
spark.stop()
"""


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    cores_list = [int(c) for c in sys.argv[2:]] or [2, 8, 32]
    corpus = f"/tmp/sparkdedup_scale_{n_docs}.parquet"
    if not os.path.exists(corpus):
        from sparkdedup.fixtures import write_code_files

        write_code_files(corpus, n_rows=n_docs, seed=42)

    job = _JOB.format(repo=REPO)
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(job)
        path = f.name

    reps = int(os.environ.get("SCALE_REPS", "3"))
    results = {}
    for cores in cores_list:
        # pre-warm the page cache so rep-0 doesn't pay cold-disk reads
        with open(os.path.join(corpus), "rb") as fh:
            while fh.read(1 << 24):
                pass
        out = subprocess.run(
            [sys.executable, path, str(cores), corpus, str(reps)],
            capture_output=True, text=True, timeout=3600,
        )
        rec = json.loads(out.stdout.strip().splitlines()[-1])
        results[f"local{cores}"] = rec
        print(rec)

    survs = {r["survivors"] for r in results.values()}
    assert len(survs) == 1, "parallelism changed the result!"
    report = {"n_docs": n_docs, "partitions": int(os.environ.get("SCALE_PARTS", "64")), "reps": reps, "results": results}
    for lo, hi in zip(cores_list, cores_list[1:]):
        eff = (results[f"local{lo}"]["best"] / results[f"local{hi}"]["best"]) / (hi / lo)
        report[f"efficiency_{lo}_to_{hi}"] = round(eff, 3)
        eff_med = (
            results[f"local{lo}"]["median"] / results[f"local{hi}"]["median"]
        ) / (hi / lo)
        report[f"efficiency_median_{lo}_to_{hi}"] = round(eff_med, 3)
    print(json.dumps(report))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling_matrix.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
