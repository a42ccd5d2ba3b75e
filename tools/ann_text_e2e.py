"""End-to-end text -> ANN dedup headline number (VERDICT r4 #7): the one
LLM-pipeline composite (feature-hash encoder + IVF adaptive-k dedup)
that had never been benched as a whole.

Drives the PRODUCTION surface — ``python -m sparkdedup.cli ann
--encode_text content`` — over a generated ~1M-doc corpus, so the run
exercises the full staged pipeline (encode stage -> vectors parquet ->
IVF match edges -> CC -> representative write) exactly as a user would
launch it (reference flow: text_dedup/ann_unisim.py embed+dedup, with
the ONNX encoder swapped for sparkdedup.encode's deterministic
feature-hash embedder).

Reports per-stage seconds from the job's own metrics JSON, end-to-end
docs/s, and sanity-checks survivors: rows_after < rows_before (the
corpus plants exact-dup groups and a mega-cluster) and the output row
count matches the CLI's reported "after".

Writes BENCH/ann_text_e2e.json.
Usage: python tools/ann_text_e2e.py [n_docs] [cores]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    corpus = f"/tmp/sparkdedup_scale_{n_docs}.parquet"
    if not os.path.exists(corpus):
        from sparkdedup.fixtures import write_code_files

        write_code_files(corpus, n_rows=n_docs, seed=42)

    work = "/tmp/ann_text_e2e_work"
    out = "/tmp/ann_text_e2e_out"
    metrics_path = "/tmp/ann_text_e2e_metrics.json"
    for p in (work, out):
        shutil.rmtree(p, ignore_errors=True)

    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cores), PYTHONPATH=REPO)
    t0 = time.time()
    # full streams to files — a truncated stderr tail loses the executor
    # error behind Spark's driver-side stack on multi-screen failures
    with open("/tmp/ann_text_e2e.out", "w") as out_f, open(
        "/tmp/ann_text_e2e.err", "w"
    ) as err_f:
        run = subprocess.run(
            [
                sys.executable, "-m", "sparkdedup.cli", "ann",
                "-i", corpus, "-o", out,
                "--encode_text", "content",
                "--work_dir", work,
                "--metrics", metrics_path,
                "--threshold", "0.9",
            ],
            stdout=out_f, stderr=err_f, text=True, timeout=7200, env=env, cwd=REPO,
        )
    wall = round(time.time() - t0, 2)
    cli_line = None
    for line in open("/tmp/ann_text_e2e.out").read().strip().splitlines():
        if line.startswith("{"):
            cli_line = json.loads(line)
    if run.returncode != 0 or cli_line is None:
        sys.stderr.write(
            f"cli ann run failed (rc={run.returncode}) — full logs at "
            "/tmp/ann_text_e2e.out, /tmp/ann_text_e2e.err\n"
        )
        raise RuntimeError(f"cli ann run failed (rc={run.returncode})")

    with open(metrics_path) as f:
        m = json.load(f)

    # survivor sanity: planted exact groups + mega-cluster must collapse,
    # and the written output must match the job's own accounting
    import duckdb

    (out_rows,) = duckdb.sql(
        f"select count(*) from read_parquet('{out}/*.parquet')"
    ).fetchone()
    assert cli_line["after"] < cli_line["before"], cli_line
    assert out_rows == cli_line["after"], (out_rows, cli_line)

    report = {
        "n_docs": n_docs,
        "cores": cores,
        "encode_dim": 256,
        "threshold": 0.9,
        "wall_s": wall,
        "cli_seconds": cli_line["seconds"],
        "docs_per_sec": round(n_docs / cli_line["seconds"], 1),
        "rows_before": cli_line["before"],
        "rows_after": cli_line["after"],
        "stages_s": {k: round(v["seconds"], 2) for k, v in m.get("stages", {}).items()},
        "stage_rows": {k: v.get("rows") for k, v in m.get("stages", {}).items()},
        "survivor_check": "rows_after < rows_before and parquet count == after",
    }
    print(json.dumps(report, indent=2))
    with open(os.path.join(REPO, "BENCH", "ann_text_e2e.json"), "w") as f:
        json.dump(report, f, indent=2)


if __name__ == "__main__":
    main()
