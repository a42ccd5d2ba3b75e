"""Shingling: word/char n-grams over document batches (pandas UDF bodies).

Semantics are pinned to the reference:
  * word shingles: ``re.split(r"\\W", content.lower())`` tokens, sliding
    n-grams joined with a single space and lower-cased again; documents
    with fewer than ``min_length`` tokens produce NO shingles; documents
    with fewer than ``n`` tokens produce one whole-document shingle
    (/root/reference/text_dedup/minhash_spark.py:108-137,
    /root/reference/text_dedup/utils/tokenization.py:8-45).
  * char shingles (SimHash): n-grams over raw characters, ""-joined and
    lower-cased (/root/reference/text_dedup/simhash.py:339).

These run inside Arrow-batched UDFs: Python only at the batch level; the
hashing of all shingles in a batch is a single vectorized call.
"""

from __future__ import annotations

import re
from typing import Iterable, List, Optional, Sequence

import numpy as np

from sparkdedup.hashing import xxh32_batch, xxh64_batch

# Python \W with re.UNICODE — the reference's NON_ALPHA
# (minhash_spark.py:34). The Java-regex equivalent used for pure-column
# token counting is '(?U)\\W' (see minhash.py:token_count_expr).
NON_ALPHA = re.compile(r"\W", re.UNICODE)


def word_shingles(text: str, n: int, min_length: int) -> Optional[set]:
    """Distinct word n-gram shingles of one document, or None if the
    document has fewer than ``min_length`` tokens (filter semantics,
    minhash_spark.py:140-168)."""
    tokens = NON_ALPHA.split(text.lower())
    if len(tokens) < min_length:
        return None
    if len(tokens) < n:
        return {" ".join(tokens).lower().encode("utf-8")}
    join = " ".join
    return {join(tokens[i : i + n]).lower().encode("utf-8") for i in range(len(tokens) - n + 1)}


def char_shingles(text: str, n: int, min_length: int = 5) -> Optional[set]:
    """Distinct char n-gram shingles (SimHash, simhash.py:339)."""
    if len(text) < min_length:
        return None
    if len(text) < n:
        return {text.lower().encode("utf-8")}
    return {text[i : i + n].lower().encode("utf-8") for i in range(len(text) - n + 1)}


def _batch_hashes(
    shingle_sets: List[Optional[Iterable[bytes]]],
    hash_batch,
    dtype,
    seed: int = 0,
) -> List[Optional[np.ndarray]]:
    """Hash every shingle of every doc in ONE vectorized call, then split
    back per document."""
    all_shingles: List[bytes] = []
    counts: List[int] = []
    for s in shingle_sets:
        if s is None:
            counts.append(-1)
        else:
            shingles = list(s)
            counts.append(len(shingles))
            all_shingles.extend(shingles)
    hashes = hash_batch(all_shingles, seed=seed)
    out: List[Optional[np.ndarray]] = []
    pos = 0
    for c in counts:
        if c < 0:
            out.append(None)
        else:
            out.append(hashes[pos : pos + c])
            pos += c
    return out


def word_shingle_hashes_batch(
    texts: Sequence[str], n: int, min_length: int, seed: int = 0
) -> List[Optional[np.ndarray]]:
    """Per-doc arrays of distinct xxh32 shingle hashes (None = too short).

    Equivalent to the reference's fused ``ngram_hashes``
    (minhash_spark.py:108-137) applied to each doc of the batch.
    """
    sets = [word_shingles(t, n, min_length) for t in texts]
    return _batch_hashes(sets, xxh32_batch, np.uint32, seed=seed)


def char_shingle_hashes64_batch(
    texts: Sequence[str], n: int, min_length: int = 5, seed: int = 0
) -> List[Optional[np.ndarray]]:
    """Per-doc arrays of distinct 64-bit char-shingle hashes (SimHash)."""
    sets = [char_shingles(t, n, min_length) for t in texts]
    return _batch_hashes(sets, xxh64_batch, np.uint64, seed=seed)
