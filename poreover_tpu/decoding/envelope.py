"""Alignment-envelope construction (host-side numpy).

Builds the banded [v_min, v_max) search region of the U x V pair lattice from
the 1D basecall alignment, with the same shape/padding/overlap-repair
behavior as the reference builder (poreover/decoding/envelope.py:26-103).
This is cheap O(alignment length) host work; the expensive DP over the
envelope runs on TPU.
"""
from __future__ import annotations

import numpy as np


def get_alignment_columns(alignment: np.ndarray):
    """Column labels (m/i/d) plus per-read sequence indices for each column.

    ``alignment`` is a [2, L] array of single characters with '-' gaps
    (reference envelope.py:26-44).
    """
    x_index = -1
    y_index = -1
    cols = []
    for x, y in alignment.T:
        if x != "-":
            x_index += 1
        if y != "-":
            y_index += 1
        if x == "-":
            label = "i"
        elif y == "-":
            label = "d"
        else:
            label = "m"
        cols.append((label, x_index, y_index))
    return cols


def build_envelope(
    y1, y2, alignment_col, sequence_to_signal1, sequence_to_signal2, padding: int = 150
) -> np.ndarray:
    """Per-u [v_start, v_end) band of the pair lattice (reference envelope.py:46-87)."""
    U = len(y1)
    V = len(y2)

    def signal_ranges(seq_to_sig, t_end):
        starts = np.asarray(seq_to_sig, dtype=np.int64)
        ends = np.empty_like(starts)
        ends[:-1] = starts[1:]
        ends[-1] = t_end
        return starts, ends

    s1_start, s1_end = signal_ranges(sequence_to_signal1, U)
    s2_start, s2_end = signal_ranges(sequence_to_signal2, V)

    env = np.zeros((U, 2), dtype=np.int64) - 1
    n1 = len(s1_start)
    n2 = len(s2_start)
    for label, seq1, seq2 in alignment_col:
        i1 = min(max(seq1, 0), n1 - 1)
        i2 = min(max(seq2, 0), n2 - 1)
        u_lo, u_hi = int(s1_start[i1]), int(s1_end[i1])
        v_lo, v_hi = int(s2_start[i2]), int(s2_end[i2])
        rows = slice(u_lo, min(u_hi, U))
        cur_lo = env[rows, 0]
        cur_hi = env[rows, 1]
        env[rows, 0] = np.where((v_lo < cur_lo) | (cur_lo < 0), v_lo, cur_lo)
        env[rows, 1] = np.where((v_hi > cur_hi) | (cur_hi < 0), v_hi, cur_hi)

    env[:, 0] = np.maximum(0, env[:, 0] - padding)
    env[:, 1] = np.minimum(V, env[:, 1] + padding)

    # repair inverted rows, then force each row to overlap its predecessor
    prev_end = 0
    for i in range(U):
        if env[i, 0] > env[i, 1]:
            env[i, 0] = 0
        if env[i, 0] > prev_end:
            env[i, 0] = prev_end
            prev_end = env[i, 1]

    return env


def diagonal_envelope(U: int, V: int, width: int) -> np.ndarray:
    """Simple diagonal band (reference pair_decode.py:497-498)."""
    u = np.arange(U)
    center = (u / U * V).astype(np.int64)
    return np.stack(
        [np.maximum(center - width, 0), np.minimum(center + width, V)], axis=1
    )


def offset_envelope(full_envelope: np.ndarray, subset) -> np.ndarray:
    (u1, u2, v1, _v2) = subset
    sub = np.copy(full_envelope[u1:u2])
    sub[:, 0] -= v1
    sub[:, 1] -= v1
    return sub


def check_envelope(envelope: np.ndarray, U: int, V: int) -> bool:
    ok_greater = bool(np.all(envelope[:, 1] > envelope[:, 0]))
    ok_overlap = bool(np.all(envelope[:-1, 1] - envelope[1:, 0]))
    ok_length = len(envelope) == U + 2
    ok_range = bool(np.all(envelope[:, 1] <= V))
    return ok_greater and ok_overlap and ok_length and ok_range


def pad_envelope(envelope: np.ndarray, U: int, V: int) -> np.ndarray:
    """Append two rows and widen V-1 ends to V (reference envelope.py:96-103)."""
    new_env = np.concatenate((envelope, [envelope[-1], envelope[-1]]))
    for i in range(len(new_env)):
        if new_env[i, 1] == V - 1:
            new_env[i, 1] = V
    new_env[U] = new_env[U - 1]
    new_env[U + 1] = new_env[U - 1]
    return new_env
