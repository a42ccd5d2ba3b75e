"""Unit pins for vendored hash primitives & LSH params.

Pinned values come from the reference's doctests
(/root/reference/text_dedup/minhash_spark.py:128-129, 262-263;
/root/reference/text_dedup/utils/hashfunc.py:80-85;
/root/reference/text_dedup/utils/analysis.py:79-80) and from the public
xxHash specification test vectors.
"""

import numpy as np
import pytest

from sparkdedup.hashing import (
    generate_permutations,
    optimal_param,
    sha1_hash,
    xxh32_batch,
    xxh64_batch,
)


def test_xxh32_matches_reference_ngram_hashes_doctest():
    # ngram_hashes("a b c d", 2, min_length=1) == {145323813, 433422276, 459146835}
    assert sorted(xxh32_batch([b"a b", b"b c", b"c d"]).tolist()) == [
        145323813,
        433422276,
        459146835,
    ]


def test_xxh32_known_vectors():
    # public xxHash spec vectors, seed 0
    assert xxh32_batch([b""])[0] == 0x02CC5D05
    assert xxh32_batch([b"Nobody inspects the spammish repetition"])[0] == 0xE2293B2F
    # long input exercises the 4-lane stripe loop
    assert int(xxh32_batch([b"a" * 101])[0]) == int(xxh32_batch([b"a" * 101])[0])


def test_xxh64_known_vectors():
    assert int(xxh64_batch([b""])[0]) == 0xEF46DB3751D8E999
    assert int(xxh64_batch([b"a"])[0]) == 0xD24EC4F1A98C6E5B
    assert int(xxh64_batch([b"abc"])[0]) == 0x44BC2CF5AD770999


def test_xxh_batch_mixed_lengths_consistent():
    items = [b"a", b"ab", b"abc", b"a" * 40, b"b" * 40, b"hello world", b""]
    batched32 = xxh32_batch(items)
    batched64 = xxh64_batch(items)
    for i, item in enumerate(items):
        assert batched32[i] == xxh32_batch([item])[0]
        assert batched64[i] == xxh64_batch([item])[0]


def test_sha1_hash_reference_pins():
    assert sha1_hash(b"hello world", 32) == 896314922
    assert sha1_hash(b"hello world", 64) == 13028719972609469994
    assert sha1_hash(b"hello world", 128) == 310522945683037930239412421226792791594


def test_optimal_param_reference_pins():
    assert optimal_param(0.7, 256) == (25, 10)  # minhash_spark.py:262-263
    assert optimal_param(0.75, 256) == (21, 12)  # analysis.py:79-80


def test_permutations_deterministic_and_in_range():
    a1, b1 = generate_permutations(250, 4_294_967_291, seed=42)
    a2, b2 = generate_permutations(250, 4_294_967_291, seed=42)
    assert np.array_equal(a1, a2) and np.array_equal(b1, b2)
    assert a1.dtype == np.uint32
    assert a1.min() >= 1
    assert int(a1.max()) < 4_294_967_291
