"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

Extra context fields beyond the driver contract: per-query row counts,
docs/sec for the flagship minhash pipeline, and the parallelism used
(for the N-vs-4N scaling report in BENCH/BASELINE.md, see
tools/run_scaling.py).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

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

# the sandbox VM has ~2x run-to-run noise; two passes, per-query min
N_PASSES = 2
# queries that have swung +-50% across rounds get extra passes and a
# reported median-of-5 so a real regression is tellable from VM noise
# (VERDICT r3 #7); `queries` stays min-based for round-over-round
# comparability
VOLATILE = ("simhash_dedup", "embedding_near_dup_lsh")
VOLATILE_PASSES = 5


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    from sparkdedup.session import get_spark

    spark = get_spark(app_name="sparkdedup-bench", master=f"local[{cpus}]")
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qmap = entrymod.queries()
    # agreement-check driver rows also compute an O(N^2) exact side;
    # bench measures the raw pipelines those rows wrap
    qmap["embedding_near_dup_lsh"] = entrymod.q_embedding_near_dup_lsh_raw
    qmap["minhash_dedup"] = entrymod.q_minhash_dedup_raw
    qmap["simhash_dedup"] = entrymod.q_simhash_dedup_raw
    per_query: dict[str, float] = {}
    rows: dict[str, int] = {}
    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    samples: dict[str, list] = {name: [] for name in BENCH_QUERIES}

    def run_once(name: str) -> None:
        t0 = time.time()
        df = qmap[name](spark, sf_dir)
        rows[name] = df.count()
        samples[name].append(round(time.time() - t0, 3))
        # unpersist this query's pipeline caches so the 10-query
        # loop doesn't accumulate persisted frames (VERDICT r2 #8)
        entrymod.release_all()

    for _ in range(N_PASSES):
        spark.catalog.clearCache()
        for name in BENCH_QUERIES:
            run_once(name)
    for name in VOLATILE:
        while len(samples[name]) < VOLATILE_PASSES:
            run_once(name)
    per_query = {name: min(ts) for name, ts in samples.items()}
    medians = {
        name: sorted(samples[name])[len(samples[name]) // 2] for name in VOLATILE
    }
    total = round(sum(per_query.values()), 3)

    out = {
        "metric": "dedup_bench_total",
        "value": total,
        "unit": "sec",
        "queries": per_query,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "rows": rows,
        "n_docs": n_docs,
        "minhash_docs_per_sec": round(n_docs / per_query["minhash_dedup"], 1),
        "cpus": cpus,
        "medians_of_5": medians,
        "volatile_samples": {name: samples[name] for name in VOLATILE},
    }
    # headline sustained numbers from the 400k scaling matrix, if present
    matrix_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "scaling_matrix.json")
    if os.path.exists(matrix_path):
        try:
            matrix = json.load(open(matrix_path))
            nd = matrix.get("n_docs", 0)
            out[f"sustained_{nd // 1000}k"] = {
                k: v["best_docs_per_sec"] for k, v in matrix.get("results", {}).items()
            }
            out["scaling_efficiency_2_to_8"] = matrix.get("efficiency_2_to_8")
            out["scaling_efficiency_8_to_32"] = matrix.get("efficiency_8_to_32")
        except Exception:
            pass
    # shared-job standalone-cluster scaling (one job, cross-executor
    # shuffles intact), if the tools/cluster_scaling.py report exists
    for key, fname in (
        ("cluster_shared_job", "cluster_scaling.json"),
        ("cluster_executor_envelope", "cluster_scaling_envelope.json"),
    ):
        path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", fname)
        if not os.path.exists(path):
            continue
        try:
            cluster = json.load(open(path))
            res = cluster.get("results", {})
            effs = {}
            names = list(res)
            for i, a in enumerate(names):
                for b in names[i + 1:]:
                    ca, cb = res[a]["cores"], res[b]["cores"]
                    if cb > ca:
                        effs[f"{a}_to_{b}"] = round(
                            (res[a]["best"] / res[b]["best"]) / (cb / ca), 3
                        )
            out[key] = {
                "n_docs": cluster.get("n_docs"),
                "reps": cluster.get("reps"),
                "docs_per_sec": {k: v["best_docs_per_sec"] for k, v in res.items()},
                "efficiency_best": effs,
            }
            # ≥3-rep runs report dispersion (VERDICT r4 #3: the envelope
            # claim needs a spread statistic, not a 2-sample median)
            if all("mean" in v for v in res.values()):
                out[key]["efficiency_mean"] = {
                    k.removeprefix("efficiency_mean_"): v
                    for k, v in cluster.items() if k.startswith("efficiency_mean_")
                }
                out[key]["spread"] = {
                    k: {"mean": v["mean"], "stdev": v["stdev"], "min": v["min"],
                        "max": v["max"], "runs": v["runs"]}
                    for k, v in res.items()
                }
        except Exception:
            pass
    # end-to-end text -> encode -> IVF ANN dedup composite, if benched
    e2e_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH", "ann_text_e2e.json"
    )
    if os.path.exists(e2e_path):
        try:
            e2e = json.load(open(e2e_path))
            out["ann_text_e2e"] = {
                "n_docs": e2e.get("n_docs"),
                "docs_per_sec": e2e.get("docs_per_sec"),
                "stages_s": e2e.get("stages_s"),
            }
        except Exception:
            pass
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
