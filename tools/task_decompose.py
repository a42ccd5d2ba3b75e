"""Task-seconds vs wall decomposition for the N-vs-4N scaling story.

Runs the identical MinHash job at each core count in a fresh JVM and
separates the three possible explanations for sub-linear local[8] ->
local[32] scaling on this single-VM sandbox:

  1. WORK INFLATION (memory-subsystem contention): total CPU seconds
     consumed by the whole process tree (JVM + pyspark workers, from
     /proc utime+stime) per doc rises with the thread count — the same
     work costs more cycles when 32 threads share the memory bus.
  2. SCHEDULING STALL (host steal / oversubscription): Spark's
     executorRunTime >> executorCpuTime — tasks hold slots while not
     on-CPU.
  3. PLAN SERIALIZATION (a genuine engine defect): mean task
     concurrency (task run-seconds / wall) far below the core count,
     or single-task stages dominating — the only case that would also
     hurt a real 4N-executor cluster.

Writes BENCH/task_decomposition.json.
Usage: python tools/task_decompose.py [corpus_parquet] [cores ...]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

_JOB = """
import json, os, sys, time, urllib.request
sys.path.insert(0, {repo!r})

def proc_tree_cpu_seconds():
    '''utime+stime of this process and every live descendant.'''
    tick = os.sysconf("SC_CLK_TCK")
    me = os.getpid()
    children = {{}}
    stats = {{}}
    for pid in os.listdir("/proc"):
        if not pid.isdigit():
            continue
        try:
            with open(f"/proc/{{pid}}/stat") as f:
                parts = f.read().rsplit(")", 1)[1].split()
            ppid = int(parts[1])
            cpu = (int(parts[11]) + int(parts[12])) / tick
        except Exception:
            continue
        children.setdefault(ppid, []).append(int(pid))
        stats[int(pid)] = cpu
    total, frontier = 0.0, [me]
    while frontier:
        p = frontier.pop()
        total += stats.get(p, 0.0)
        frontier.extend(children.get(p, []))
    return total

from sparkdedup.session import get_spark
from sparkdedup.io import with_doc_id
from sparkdedup.config import MinHashConfig
from sparkdedup.minhash import minhash_dedup

cores = int(sys.argv[1]); corpus = sys.argv[2]
parts = int(os.environ.get("SCALE_PARTS", "64"))
spark = get_spark(app_name=f"decompose-{{cores}}", master=f"local[{{cores}}]",
                  shuffle_partitions=parts, ui=True)
spark.sparkContext.setLogLevel("ERROR")
ui = spark.sparkContext.uiWebUrl
app_id = spark.sparkContext.applicationId
df = with_doc_id(spark.read.parquet(corpus).repartition(parts), id_column="doc_id")
n = df.count()

# warm-up run (JIT, page-cache, python worker pool), then the measured run
res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
res.kept.count(); res.release()
spark.catalog.clearCache()

cpu0 = proc_tree_cpu_seconds()
t0 = time.time()
res = minhash_dedup(df, MinHashConfig(), collect_metrics=False)
survivors = res.kept.count()
wall = time.time() - t0
cpu1 = proc_tree_cpu_seconds()

stages = json.load(urllib.request.urlopen(
    f"{{ui}}/api/v1/applications/{{app_id}}/stages?status=complete"))
t0_ms = t0 * 1000
run_ms = cpu_ms = gc_ms = 0
per_stage = []
for st in stages:
    sub = st.get("firstTaskLaunchedTime") or st.get("submissionTime") or ""
    # ISO time parse is locale-fragile; filter on stageId ordering instead:
    pass
# measured run = stages submitted after the warm-up; identify by wall-clock
import datetime
def ms(ts):
    if not ts: return 0
    try:
        return datetime.datetime.strptime(ts.replace("GMT", "+0000"),
            "%Y-%m-%dT%H:%M:%S.%f%z").timestamp() * 1000
    except Exception:
        return 0
for st in stages:
    if ms(st.get("submissionTime")) < t0_ms - 500:
        continue
    r = st.get("executorRunTime", 0); c = st.get("executorCpuTime", 0) // 1_000_000
    g = st.get("jvmGcTime", 0)
    run_ms += r; cpu_ms += c; gc_ms += g
    per_stage.append({{"stage": st["stageId"], "name": st.get("name", "")[:50],
                      "tasks": st.get("numCompleteTasks", 0),
                      "run_s": round(r/1000, 1), "jvm_cpu_s": round(c/1000, 1),
                      "gc_s": round(g/1000, 1)}})
per_stage.sort(key=lambda s: -s["run_s"])
print("RESULT " + json.dumps({{
    "cores": cores, "n_docs": n, "survivors": survivors,
    "wall_s": round(wall, 1),
    "proc_tree_cpu_s": round(cpu1 - cpu0, 1),
    "cpu_s_per_kdoc": round((cpu1 - cpu0) / (n / 1000), 2),
    "task_run_s": round(run_ms / 1000, 1),
    "jvm_task_cpu_s": round(cpu_ms / 1000, 1),
    "gc_s": round(gc_ms / 1000, 1),
    "mean_task_concurrency": round(run_ms / 1000 / wall, 2),
    "docs_per_sec": round(n / wall, 1),
    "top_stages": per_stage[:6],
}}))
spark.stop()
"""


def main() -> None:
    corpus = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sparkdedup_scale_1600000.parquet"
    cores_list = [int(c) for c in sys.argv[2:]] or [8, 32]
    job = _JOB.format(repo=REPO)
    results = {}
    for cores in cores_list:
        out = subprocess.run(
            [sys.executable, "-c", job, str(cores), corpus],
            capture_output=True, text=True, timeout=3600,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
        if not line:
            print(f"cores={cores} FAILED:\n{out.stdout[-2000:]}\n{out.stderr[-2000:]}")
            sys.exit(1)
        results[f"local{cores}"] = json.loads(line[-1][len("RESULT "):])
        print(line[-1])

    report = {"corpus": corpus, "results": results}
    ks = [f"local{c}" for c in cores_list]
    if len(ks) >= 2:
        a, b = results[ks[0]], results[ks[-1]]
        speedup = a["wall_s"] / b["wall_s"]
        report["speedup"] = round(speedup, 2)
        report["efficiency"] = round(speedup / (b["cores"] / a["cores"]), 3)
        report["cpu_inflation"] = round(
            b["proc_tree_cpu_s"] / max(a["proc_tree_cpu_s"], 1e-9), 2
        )
        report["interpretation"] = (
            "cpu_inflation is total machine CPU-seconds for the identical job at "
            f"{b['cores']} vs {a['cores']} threads: values >> 1 mean the shared "
            "memory subsystem (not the plan) absorbs the extra cores; "
            "mean_task_concurrency near the core count rules out plan serialization."
        )
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "task_decomposition.json"), "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in ("speedup", "efficiency", "cpu_inflation") if k in report}))


if __name__ == "__main__":
    main()
