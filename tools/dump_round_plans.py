"""Dump `.explain("formatted")` for the bench/driver queries touched in
an optimization round to per-query text files (the judge checks plan
claims against these).

Usage: python tools/dump_round_plans.py <out_dir> [sf_dir] [query ...]

Unlike tools/dump_plans.py (which writes the consolidated PLANS.md),
this writes one `<query>.txt` per query so before/after pairs can be
committed under plans/rNN/.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod
from sparkdedup.session import get_spark

DEFAULT_QUERIES = [
    "minhash_dedup",
    "simhash_dedup",
    "jaccard_dedup",
    "ccnet_line_dedup",
    "substring_dedup",
    "lang_id_counts",
    "ann_topk",
    "embedding_near_dup_lsh",
]


def main() -> None:
    out_dir = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    names = sys.argv[3:] or DEFAULT_QUERIES
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="round-plans", master="local[8]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    # plan review wants the RAW scale paths, not the agreement wrappers
    qmap["embedding_near_dup_lsh"] = entrymod.q_embedding_near_dup_lsh_raw
    qmap["minhash_dedup"] = entrymod.q_minhash_dedup_raw
    qmap["simhash_dedup"] = entrymod.q_simhash_dedup_raw
    for name in names:
        df = qmap[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
            f.write(buf.getvalue().strip() + "\n")
        print(f"wrote {name}.txt")
        entrymod.release_all()
    spark.stop()


if __name__ == "__main__":
    main()
