"""Pure-Python reference implementation of the global aligner.

Semantics identical to the native C++ (native/poreover_native.cpp), which in
turn pins the reference aligner's behavior (poreover/align/align.pyx:29-178)
including its tie-multi-fire traceback, out-of-band default-0 reads, dropped
pre-push boundary writes, and Python negative-index wraparound. Used as a
fallback when the native library is unavailable and as a cross-check in
tests. O(L*band) python loops — slow; production path is the C++.
"""
from __future__ import annotations

import numpy as np


def _score(a, b, match, mismatch):
    return match if a == b else mismatch


def _traceback(get, seq1, seq2, match, mismatch, gap_cost):
    l1, l2 = len(seq1), len(seq2)
    i, j = l1, l2
    a1, a2 = [], []
    while i > 0 and j > 0:
        n0 = get(i - 1, j - 1) + _score(seq1[i - 1], seq2[j - 1], match, mismatch)
        n1 = get(i - 1, j) + gap_cost
        n2 = get(i, j - 1) + gap_cost
        m = max(n0, n1, n2)
        # ties fire multiple branches with stale scores — reference behavior
        if n0 == m:
            i -= 1
            j -= 1
            a1.append(seq1[i])
            a2.append(seq2[j])
        if n1 == m:
            i -= 1
            a1.append(seq1[i])
            a2.append("-")
        if n2 == m:
            j -= 1
            a1.append("-")
            a2.append(seq2[j])
    while i > 0 or j > 0:
        if i > 0:
            i -= 1
            a1.append(seq1[i])
            a2.append("-")
        else:
            j -= 1
            a1.append("-")
            a2.append(seq2[j])
    return "".join(reversed(a1)), "".join(reversed(a2))


def global_pair_py(seq1, seq2, match=2, mismatch=-1, gap_cost=-1):
    l1, l2 = len(seq1), len(seq2)
    dp = np.zeros((l1 + 1, l2 + 1), dtype=np.int64)
    dp[:, 0] = gap_cost * np.arange(l1 + 1)
    dp[0, :] = gap_cost * np.arange(l2 + 1)
    for i in range(1, l1 + 1):
        for j in range(1, l2 + 1):
            dp[i, j] = max(
                dp[i - 1, j - 1] + _score(seq1[i - 1], seq2[j - 1], match, mismatch),
                dp[i - 1, j] + gap_cost,
                dp[i, j - 1] + gap_cost,
            )
    return _traceback(
        lambda i, j: int(dp[i, j]), seq1, seq2, match, mismatch, gap_cost
    )


class _BandedIntMatrix:
    """Reference SparseMatrix<int> semantics: default 0 everywhere outside
    stored bands, inclusive [start,end] rows, silent out-of-range sets."""

    def __init__(self):
        self.start = []
        self.end = []
        self.rows = []

    def push_row(self, s, e):
        self.start.append(s)
        self.end.append(e)
        self.rows.append(np.zeros(e - s + 1, dtype=np.int64))

    def set(self, i, j, v):
        if 0 <= i < len(self.rows) and self.start[i] <= j <= self.end[i]:
            self.rows[i][j - self.start[i]] = v

    def get(self, i, j):
        if 0 <= i < len(self.rows) and self.start[i] <= j <= self.end[i]:
            return int(self.rows[i][j - self.start[i]])
        return 0


def global_pair_banded_py(seq1, seq2, band_width=500, match=2, mismatch=-1, gap_cost=-1):
    l1, l2 = len(seq1), len(seq2)
    dp = _BandedIntMatrix()
    # reference boundary writes happen before any push_row -> dropped
    for i in range(l1):
        center = int(np.round(l2 / l1 * i))
        start = max(center - band_width, 0)
        end = min(center + band_width, l2 - 1)
        dp.push_row(start, end)
        for j in range(start, end):
            dp.set(
                i,
                j,
                max(
                    dp.get(i - 1, j - 1)
                    + _score(seq1[i - 1], seq2[j - 1], match, mismatch),
                    dp.get(i - 1, j) + gap_cost,
                    dp.get(i, j - 1) + gap_cost,
                ),
            )
    return _traceback(dp.get, seq1, seq2, match, mismatch, gap_cost)
