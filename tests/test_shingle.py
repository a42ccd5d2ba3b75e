"""Shingling semantics pins (reference tokenization doctests,
/root/reference/text_dedup/utils/tokenization.py:28-35 and
minhash_spark.py:128-133)."""

import numpy as np

from sparkdedup.shingle import char_shingles, word_shingle_hashes_batch, word_shingles


def test_word_shingles_basic():
    assert word_shingles("a b c d", 2, 1) == {b"a b", b"b c", b"c d"}


def test_word_shingles_below_min_length_is_none():
    # doctest: ngrams("a b c d", 2, min_length=5) -> []
    assert word_shingles("a b c d", 2, 5) is None


def test_word_shingles_short_doc_whole_tuple():
    # doctest: ngrams("a b", 3, min_length=1) -> [("a","b")] -> "a b"
    assert word_shingles("a b", 3, 1) == {b"a b"}


def test_word_shingles_lowercase_and_nonalpha_split():
    # \W splits on punctuation; lower() applied
    assert word_shingles("Foo.Bar", 1, 1) == {b"foo", b"bar"}


def test_word_shingle_hashes_match_reference_doctest():
    # ngram_hashes("a b c d", 2, min_length=1) == {145323813, 433422276, 459146835}
    [hashes] = word_shingle_hashes_batch(["a b c d"], 2, 1)
    assert sorted(hashes.tolist()) == [145323813, 433422276, 459146835]


def test_word_shingle_hashes_batch_none_for_short():
    out = word_shingle_hashes_batch(["a b c d", "x y"], 2, 3)
    assert sorted(out[0].tolist()) == [145323813, 433422276, 459146835]
    assert out[1] is None


def test_char_shingles():
    assert char_shingles("abcd", 2, 1) == {b"ab", b"bc", b"cd"}
    assert char_shingles("AB", 3, 1) == {b"ab"}
    assert char_shingles("ab", 3, 5) is None


def test_unicode_tokenization_matches_python_re():
    # unicode word chars are NOT split by Python \W (re.UNICODE)
    s = word_shingles("naïve café 数据 test word", 1, 1)
    assert "naïve".encode() in s
    assert "数据".encode() in s
