"""Extra benchmark instrumentation (bench.py is frozen for measurement).

Per bench query: wall seconds over N reps (min + median) AND the number
of Spark jobs the query fired (setJobGroup + statusTracker) — the job
count is the direct evidence for action-elimination optimizations
(removed isEmpty probes, fused sizing probes, single-action driver CC).

Usage: python tools/bench_extra.py [reps] [sf_dir] [query ...]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BENCH_QUERIES = [
    "minhash_dedup",
    "simhash_dedup",
    "exact_dedup",
    "ccnet_line_dedup",
    "substring_dedup",
    "jaccard_dedup",
    "text_stats",
    "lang_id_counts",
    "ann_topk",
    "embedding_near_dup_lsh",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    names = sys.argv[3:] or BENCH_QUERIES
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from sparkdedup.session import get_spark

    spark = get_spark(app_name="bench-extra", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    qmap["embedding_near_dup_lsh"] = entrymod.q_embedding_near_dup_lsh_raw
    qmap["minhash_dedup"] = entrymod.q_minhash_dedup_raw
    qmap["simhash_dedup"] = entrymod.q_simhash_dedup_raw

    out: dict = {"sf_dir": sf_dir, "cpus": cpus, "reps": reps, "queries": {}}
    for name in names:
        samples = []
        jobs = None
        for i in range(reps):
            spark.catalog.clearCache()
            group = f"{name}-{i}"
            sc.setJobGroup(group, f"bench_extra: {name}")
            t0 = time.time()
            df = qmap[name](spark, sf_dir)
            n = df.count()
            samples.append(round(time.time() - t0, 3))
            sc.setJobGroup(None, None)
            jobs = len(sc.statusTracker().getJobIdsForGroup(group))
            entrymod.release_all()
        samples_sorted = sorted(samples)
        out["queries"][name] = {
            "min": samples_sorted[0],
            "median": samples_sorted[len(samples_sorted) // 2],
            "samples": samples,
            "jobs": jobs,
            "rows": n,
        }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
