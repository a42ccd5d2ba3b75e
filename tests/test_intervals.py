"""Interval algebra pinned to the reference doctest tables
(/root/reference/text_dedup/suffix_array.py:53-90, 150-158, 231-246)."""

from sparkdedup.intervals import merge_intervals, restore, restore_and_merge

STAIR = [(0, 10), (1, 11), (2, 12), (3, 13), (4, 14), (5, 15), (6, 16), (7, 21)]


def test_merge_overlapping_staircase():
    assert merge_intervals(STAIR, "overlapping") == [(0, 21)]


def test_merge_longest_staircase():
    # "longest" keeps every non-contained interval
    assert merge_intervals(STAIR, "longest") == STAIR


def test_merge_overlapping_touching():
    assert merge_intervals([(0, 2), (2, 4), (4, 5)], "overlapping") == [(0, 5)]


def test_merge_longest_contained():
    assert merge_intervals([(0, 4), (2, 4), (4, 5)], "longest") == [(0, 4), (4, 5)]


def test_merge_duplicates_collapse():
    assert merge_intervals([(0, 10)] * 5) == [(0, 10)]


def test_restore_reference_doctest():
    got = list(restore([(0, 10), (10, 20)], [(0, 5), (5, 10), (5, 15), (5, 19)]))
    assert got == [(0, (0, 5)), (0, (5, 10)), (1, (0, 5)), (1, (0, 9))]


def test_restore_and_merge_longest():
    res, size = restore_and_merge(
        [(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)], 5, "longest"
    )
    assert res == [[(0, 5), (5, 10)], [(2, 9)]]
    assert size == 17


def test_restore_and_merge_overlapping():
    res, size = restore_and_merge(
        [(0, 10), (10, 20)], [(0, 5), (5, 10), (12, 19)], 5, "overlapping"
    )
    assert res == [[(0, 10)], [(2, 9)]]
    assert size == 17
