"""Interval utilities with reference-identical semantics.

Re-implements the merge/restore algebra of the reference's suffix-array
mode (/root/reference/text_dedup/suffix_array.py:31-256) over plain
(start, stop) tuples — used per-document inside Arrow UDFs (lists are
tiny) and unit-pinned against the reference's doctest tables. The
production substring pipeline (sparkdedup.suffix) only needs the
"overlapping" union, but the full algebra is exposed for parity:

  * merge_intervals(..., "overlapping"): merge touching/overlapping
  * merge_intervals(..., "longest"): drop intervals contained in an
    earlier (start-sorted, longest-first) interval
  * restore: map global byte ranges back into per-document local
    ranges given document boundary offsets
"""

from __future__ import annotations

from typing import Iterable, Iterator, List, Sequence, Tuple

Interval = Tuple[int, int]


def merge_intervals(
    intervals: Iterable[Interval], merge_strategy: str = "longest"
) -> List[Interval]:
    """Merge byte intervals (reference merge_intervals,
    suffix_array.py:31-128; pinned cases in tests/test_intervals.py)."""
    uniq = sorted(set((s, e) for s, e in intervals), key=lambda x: (x[0], -x[1]))
    merged: List[Interval] = []
    for cur in uniq:
        if not merged:
            merged.append(cur)
            continue
        prev = merged[-1]
        if merge_strategy == "overlapping":
            if prev[1] >= cur[0]:
                merged[-1] = (prev[0], max(prev[1], cur[1]))
            else:
                merged.append(cur)
        elif merge_strategy == "longest":
            if cur[1] <= prev[1]:  # contained -> ignore
                continue
            merged.append(cur)
        else:
            raise ValueError(merge_strategy)
    return merged


def restore(
    boundaries: Sequence[Interval], segments: Sequence[Interval]
) -> Iterator[Tuple[int, Interval]]:
    """Map globally-offset duplicate ranges into per-doc local ranges.

    Same 5-way overlap case analysis as the reference restore
    (suffix_array.py:131-203): segments clipped to each boundary,
    emitted as (doc_index, (local_start, local_stop)).
    """
    from collections import deque

    q = deque(segments)
    for i, (b_start, b_stop) in enumerate(boundaries):
        while q:
            x, y = q.popleft()
            while y <= b_start and q:
                x, y = q.popleft()
            if y <= b_start:
                break
            if x >= b_stop:
                q.appendleft((x, y))
                break
            if b_start <= x < b_stop <= y:
                yield i, (x - b_start, b_stop - b_start)
                if y > b_stop:
                    q.appendleft((b_stop, y))
                break
            elif b_start <= x < y <= b_stop:
                yield i, (x - b_start, y - b_start)
                continue
            elif x < b_start < y <= b_stop:
                yield i, (0, y - b_start)
                continue
            elif x < b_start < b_stop <= y:
                yield i, (0, b_stop - b_start)
                if y > b_stop:
                    q.appendleft((b_stop, y))
                break


def restore_and_merge(
    boundaries: Sequence[Interval],
    segments: Sequence[Interval],
    k: int,
    merge_strategy: str = "longest",
) -> Tuple[List[List[Interval]], int]:
    """restore + per-doc threshold filter (>= k) + merge; returns
    (per-doc merged intervals, total duplicate bytes) — reference
    restore_and_merge (suffix_array.py:206-256)."""
    results: List[List[Interval]] = [[] for _ in boundaries]
    for idx, (s, e) in restore(boundaries, segments):
        if e - s >= k:
            results[idx].append((s, e))
    total = 0
    for i in range(len(results)):
        results[i] = merge_intervals(results[i], merge_strategy)
        total += sum(e - s for s, e in results[i])
    return results, total
