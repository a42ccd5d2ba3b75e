"""Multi-JVM 'cluster' probe: 4 concurrent local[8] executors vs one
local[32].

On a real cluster, 4N cores arrive as 4 EXECUTOR PROCESSES with their
own heaps, GC and python worker pools — not 32 threads in one JVM.
This probe emulates that topology inside the sandbox: shard the corpus
4 ways, run 4 concurrent local[8] JVMs (one shard each, 1 warm-up rep
+ 1 measured rep per JVM, roughly synchronized), and report aggregate
docs/s against the single-JVM local[32] and local[8] numbers from
BENCH/scaling_matrix.json.

Interpretation:
  aggregate >> local[32]  -> the single shared JVM (heap/GC/scheduler)
                             was part of the 8->32 gap; a real cluster
                             recovers it.
  aggregate ~= local[32]  -> the box's shared memory subsystem is the
                             ceiling; independent machines (which bring
                             their own memory controllers) are the fix.

Sharding cuts cross-shard LSH joins, so per-shard work is slightly
less than 1/4 of the full job — this measures executor-topology
effects, not exact job equivalence (stated in the report).

Writes BENCH/multi_jvm.json.
Usage: python tools/multi_jvm_scaling.py [corpus] [n_jvms] [cores_each]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_JOB = """
import json, sys, time
sys.path.insert(0, {repo!r})
from sparkdedup.session import get_spark
from sparkdedup.io import with_doc_id
from sparkdedup.config import MinHashConfig
from sparkdedup.minhash import minhash_dedup

cores, shard, barrier = int(sys.argv[1]), sys.argv[2], float(sys.argv[3])
spark = get_spark(app_name=f"multijvm-{{shard}}", master=f"local[{{cores}}]", shuffle_partitions=16)
spark.sparkContext.setLogLevel("ERROR")
df = with_doc_id(spark.read.parquet(shard).repartition(16), id_column="doc_id")
n = df.count()
res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)  # warm-up
res.kept.count(); res.release()
spark.catalog.clearCache()
# rough start barrier so the measured reps overlap
while time.time() < barrier:
    time.sleep(0.05)
t0 = time.time()
res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
s = res.kept.count()
print(json.dumps({{"n": n, "survivors": s, "t_start": t0, "t_end": time.time()}}))
spark.stop()
"""


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdedup_scale_4800000.parquet"
    n_jvms = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    cores_each = int(sys.argv[3]) if len(sys.argv) > 3 else 8

    import pyarrow.parquet as pq
    import pyarrow as pa

    shards = []
    table = None
    for i in range(n_jvms):
        p = corpus.replace(".parquet", f".shard{i}of{n_jvms}.parquet")
        shards.append(p)
        if not os.path.exists(p):
            if table is None:
                table = pq.read_table(corpus)
            n = table.num_rows
            lo, hi = i * n // n_jvms, (i + 1) * n // n_jvms
            pq.write_table(table.slice(lo, hi - lo), p)
    table = None

    import time

    job = _JOB.format(repo=REPO)
    # warm-ups take ~2-4 min on a 1.2M shard; barrier far enough out
    barrier = time.time() + 420
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", job, str(cores_each), s, str(barrier)],
            stdout=subprocess.PIPE, stderr=subprocess.DEVNULL, text=True,
        )
        for s in shards
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=3600)
        outs.append(json.loads(out.strip().splitlines()[-1]))

    total_docs = sum(o["n"] for o in outs)
    t0 = min(o["t_start"] for o in outs)
    t1 = max(o["t_end"] for o in outs)
    wall = t1 - t0
    report = {
        "corpus": corpus,
        "topology": f"{n_jvms} x local[{cores_each}]",
        "per_jvm": [
            {"n": o["n"], "survivors": o["survivors"], "wall_s": round(o["t_end"] - o["t_start"], 1)}
            for o in outs
        ],
        "total_docs": total_docs,
        "aggregate_wall_s": round(wall, 1),
        "aggregate_docs_per_sec": round(total_docs / wall, 1),
        "max_start_skew_s": round(max(o["t_start"] for o in outs) - t0, 2),
        "note": "sharded corpora skip cross-shard joins; compares executor topology, not exact job equivalence",
    }
    try:
        matrix = json.load(open(os.path.join(REPO, "BENCH", "scaling_matrix.json")))
        report["single_jvm_local32_docs_per_sec"] = matrix["results"]["local32"]["best_docs_per_sec"]
        report["single_jvm_local8_docs_per_sec"] = matrix["results"]["local8"]["best_docs_per_sec"]
    except Exception:
        pass
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "multi_jvm.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
