"""Deterministic synthetic `code_files` corpus (FIXTURES.md T1).

Schema matches the BASELINE.json input_hint table:
(repo, path, commit, lang, content) + a stable long ``doc_id``.

Planted structure (seed=42, fully deterministic):
  * exact-duplicate groups (byte-identical content, distinct keys)
  * near-duplicate clusters at several token-mutation rates (word-5-gram
    Jaccard roughly 0.95 .. 0.3), cluster sizes 2-8
  * one mega-cluster (~5% of rows, near-identical) to exercise band-key
    skew handling
  * shared >=k byte runs across otherwise-distinct files (license
    header) for substring dedup, plus shorter control runs
  * repeated boilerplate lines across files (ccnet), incl. lines equal
    only after normalize() (case/digits/punct)
  * sub-min_length short docs and unicode content

No external data; everything is generated from a word list.
"""

from __future__ import annotations

import hashlib
from typing import Dict, List, Tuple

import numpy as np
import pandas as pd

LANGS = ["python", "java", "c", "go", "js", "md"]
_EXT = {"python": "py", "java": "java", "c": "c", "go": "go", "js": "js", "md": "md"}

_VOCAB = (
    "def class return import from self init args kwargs value result data "
    "index count total buffer stream reader writer parse token node tree "
    "graph edge vertex hash map list set dict tuple str int float bool "
    "error raise try except finally with open close read write append "
    "config options params request response client server handler route "
    "test assert expect mock fixture setup teardown batch chunk shard "
    "partition shuffle merge sort filter reduce fold scan join union "
    "commit branch diff patch blob index remote fetch push pull clone"
).split()

LICENSE_HEADER = (
    "Licensed under the Apache License Version 2.0 you may not use this file "
    "except in compliance with the License You may obtain a copy of the "
    "License at http apache org licenses LICENSE 2.0 Unless required by "
    "applicable law or agreed to in writing software distributed under the "
    "License is distributed on an AS IS BASIS WITHOUT WARRANTIES OR "
    "CONDITIONS OF ANY KIND either express or implied"
)

BOILERPLATE_LINES = [
    "import os",
    "import sys",
    "from typing import List",
    "# -*- coding: utf-8 -*-",
    "if __name__ == '__main__':",
    "    main()",
]


def _doc_tokens(rng: np.random.RandomState, n_tokens: int) -> List[str]:
    return [_VOCAB[i] for i in rng.randint(0, len(_VOCAB), size=n_tokens)]


def _render(tokens: List[str], rng: np.random.RandomState) -> str:
    """Join tokens into code-looking lines (8-12 tokens per line)."""
    lines: List[str] = []
    i = 0
    while i < len(tokens):
        w = int(rng.randint(6, 12))
        lines.append(" ".join(tokens[i : i + w]))
        i += w
    return "\n".join(lines)


def _mutate(tokens: List[str], rate: float, rng: np.random.RandomState) -> List[str]:
    out = list(tokens)
    n_mut = max(1, int(len(tokens) * rate))
    pos = rng.choice(len(tokens), size=min(n_mut, len(tokens)), replace=False)
    for p in pos:
        out[p] = _VOCAB[int(rng.randint(0, len(_VOCAB)))]
    return out


def generate_code_files(
    n_rows: int = 2000, seed: int = 42, with_truth: bool = False
):
    """Generate the deterministic corpus.

    with_truth=True additionally returns a parallel pandas Series of
    planted cluster ids (same index as doc_id; -1 = not planted as a
    near/exact duplicate) for quality evaluation (FIXTURES.md T2/T3).
    """
    rng = np.random.RandomState(seed)
    contents: List[str] = []
    truth: List[int] = []
    next_cluster = 0

    def plant(n: int) -> int:
        nonlocal next_cluster
        truth.extend([next_cluster] * n)
        next_cluster += 1
        return next_cluster - 1

    n_mega = max(4, n_rows // 20)  # ~5% mega-cluster
    n_exact_groups = max(2, n_rows // 100)
    n_near_clusters = max(4, n_rows // 25)
    n_substr = max(4, n_rows // 50)
    n_short = max(3, n_rows // 100)
    n_unicode = max(3, n_rows // 100)

    # mega-cluster: near-identical large file, tiny mutations
    mega_base = _doc_tokens(rng, 400)
    plant(n_mega)
    for _ in range(n_mega):
        contents.append(_render(_mutate(mega_base, 0.01, rng), rng))

    # exact duplicate groups
    for _ in range(n_exact_groups):
        base = _render(_doc_tokens(rng, int(rng.randint(40, 200))), rng)
        k = int(rng.randint(2, 5))
        plant(k)
        for _ in range(k):
            contents.append(base)

    # near-dup clusters at varied mutation rates
    rates = [0.01, 0.03, 0.05, 0.08, 0.12, 0.2, 0.35]
    for ci in range(n_near_clusters):
        base_tokens = _doc_tokens(rng, int(rng.randint(60, 300)))
        rate = rates[ci % len(rates)]
        k = int(rng.randint(2, 8))
        plant(k)
        for _ in range(k):
            contents.append(_render(_mutate(base_tokens, rate, rng), rng))

    # shared-substring pairs: distinct bodies + identical license header
    for _ in range(n_substr):
        body_a = _render(_doc_tokens(rng, int(rng.randint(50, 150))), rng)
        body_b = _render(_doc_tokens(rng, int(rng.randint(50, 150))), rng)
        contents.append(LICENSE_HEADER + "\n" + body_a)
        contents.append(LICENSE_HEADER + "\n" + body_b)
        # control: short shared run (< 100 bytes)
        short_run = "short shared header line"
        contents.append(short_run + "\n" + _render(_doc_tokens(rng, 60), rng))

    # boilerplate lines (ccnet) spliced into fresh docs
    for _ in range(max(4, n_rows // 50)):
        body = _render(_doc_tokens(rng, int(rng.randint(40, 120)))  , rng)
        k = int(rng.randint(1, len(BOILERPLATE_LINES)))
        contents.append("\n".join(BOILERPLATE_LINES[:k]) + "\n" + body)
        # variant equal only after normalize(): case + digit changes
        contents.append("\n".join(line.upper().replace("2", "7") for line in BOILERPLATE_LINES[:k]) + "\n" + body)

    # short docs (< min_length=5 tokens)
    for _ in range(n_short):
        contents.append(" ".join(_doc_tokens(rng, int(rng.randint(1, 4)))))

    # unicode docs
    uni_words = ["naïve", "séquence", "数据", "токен", "emoji😀", "ключ"]
    for i in range(n_unicode):
        base = _doc_tokens(rng, 50) + [uni_words[i % len(uni_words)]] * 5
        rng.shuffle(base)
        contents.append(_render(base, rng))

    # fill remainder with unique docs
    truth.extend([-1] * max(0, n_rows - len(truth)))
    while len(contents) < n_rows:
        contents.append(_render(_doc_tokens(rng, int(rng.randint(30, 250))), rng))
    contents = contents[:n_rows]
    truth.extend([-1] * (len(contents) - len(truth)))
    truth = truth[: len(contents)]

    # deterministic shuffle so cluster members are scattered across ids
    order = rng.permutation(len(contents))
    contents = [contents[i] for i in order]
    truth = [truth[i] for i in order]

    rows = []
    for i, content in enumerate(contents):
        repo = f"org{i % 37}/repo{i % 101}"
        lang = LANGS[i % len(LANGS)]
        path = f"src/mod{i % 13}/file{i}.{_EXT[lang]}"
        commit = hashlib.sha1(f"{repo}:{path}".encode()).hexdigest()
        rows.append((i, repo, path, commit, lang, content))
    df = pd.DataFrame(rows, columns=["doc_id", "repo", "path", "commit", "lang", "content"])
    if with_truth:
        return df, pd.Series(truth, name="cluster")
    return df


def write_code_files(path: str, n_rows: int = 2000, seed: int = 42) -> str:
    df = generate_code_files(n_rows, seed)
    df.to_parquet(path, index=False)
    return path
