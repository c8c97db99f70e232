"""Banded Viterbi acceptor (reference tests/test_transducer.py:15-32)."""
import numpy as np
import pytest

from poreover_tpu.io.trace import model_from_trace
from poreover_tpu.ops.acceptor import viterbi_acceptor


def test_acceptor_reproduces_viterbi_path():
    """Feeding the Viterbi-decoded sequence reproduces the Viterbi path."""
    model = model_from_trace("/root/reference/tests/poreover.csv")
    viterbi_seq, viterbi_path = model.viterbi_decode(return_path=True)
    acceptor_path = viterbi_acceptor(model.log_prob, viterbi_seq)
    assert np.all(viterbi_path == acceptor_path)


def test_acceptor_toy_exact():
    """Tiny lattice vs a direct numpy replica of the reference DP."""
    rng = np.random.default_rng(5)
    y = rng.random((8, 3))
    y = np.log(y / y.sum(axis=1, keepdims=True))
    label = "ABA"
    lut = {"A": 0, "B": 1}
    li = [lut[c] for c in label]
    T, L = len(y), len(label)
    band = 100  # wide-open band
    NEG = -np.inf

    v = np.full((L + 1, T), NEG)
    ptr = np.zeros((L + 1, T), dtype=int)
    v[0] = np.cumsum(y[:, -1])
    v[1, 0] = y[0, li[0]]
    ptr[1, 0] = 1
    for l in range(1, L + 1):
        for t in range(1, T):
            if t >= l - 1:
                emit = y[t, li[l - 1]] + v[l - 1, t - 1]
                stay = y[t, -1] + (v[l, t - 1])
                if emit >= stay:
                    v[l, t] = emit
                    ptr[l, t] = 1
                else:
                    v[l, t] = stay
                    ptr[l, t] = 0
    path_expect = np.full(T, 2)
    l, t = L, T - 1
    while l > 0:
        if ptr[l, t] > 0:
            path_expect[t] = li[l - 1]
            l -= 1
        t -= 1

    path = viterbi_acceptor(y, label, band_size=band, alphabet="AB")
    assert np.all(path == path_expect), (path, path_expect)


def test_acceptor_gap_only_tail():
    """Path emits all label chars; remaining steps are gap."""
    model = model_from_trace("/root/reference/tests/poreover.csv")
    seq = model.viterbi_decode()
    path = viterbi_acceptor(model.log_prob, seq)
    emitted = path[path < 4]
    assert len(emitted) == len(seq)
