"""Levenshtein edit distance (token/word error meters).

Reference meters: ``DatasetMeters{tknEdit, wrdEdit}`` (``cpc/Train.cpp:587-650``).
"""

from __future__ import annotations

from typing import Sequence, Tuple


def edit_distance(ref: Sequence, hyp: Sequence) -> int:
    """Plain Levenshtein distance between two sequences (host-side)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    prev = list(range(m + 1))
    for i in range(1, n + 1):
        cur = [i] + [0] * m
        ri = ref[i - 1]
        for j in range(1, m + 1):
            cost = 0 if ri == hyp[j - 1] else 1
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + cost)
        prev = cur
    return prev[m]


def error_counts(ref: Sequence, hyp: Sequence) -> Tuple[int, int]:
    """(edits, ref_len) — accumulate for corpus-level WER/TER."""
    return edit_distance(ref, hyp), len(ref)
