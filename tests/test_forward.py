"""Label forward probabilities vs enumeration oracles.

Mirrors reference tests/test_forward.py (ctc + flipflop) and adds the
bonito/merge-repeats kind the reference never oracle-tested.
"""
import numpy as np
import pytest

from poreover_tpu.ops import forward as fwd
from oracles import BonitoProfile, CTCProfile, FlipFlopProfile

LABELS = ["AAAA", "ABBA", "ABA", "AAA", "BBB", "AA", "BB", "A", "B"]


def test_forward_ctc_matches_oracle():
    y = np.array(
        [[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]]
    )
    prof = CTCProfile(y, ("A", "B", ""))
    for label in LABELS:
        expect = np.log(prof.label_prob(label))
        got = fwd.forward(np.log(y), label, alphabet="AB", model="ctc")
        assert np.isclose(expect, got), (label, expect, got)


def test_forward_flipflop_matches_oracle():
    y = np.array(
        [
            [0.8, 0.1, 0.05, 0.05],
            [0.1, 0.3, 0.5, 0.1],
            [0.7, 0.2, 0.05, 0.05],
            [0.1, 0.1, 0.2, 0.6],
        ]
    )
    prof = FlipFlopProfile(y, ("A", "B", "a", "b"))
    for label in LABELS:
        expect = np.log(prof.label_prob(label))
        got = fwd.forward(np.log(y), label, alphabet="AB", model="ctc_flipflop")
        assert np.isclose(expect, got), (label, expect, got)


def test_forward_bonito_matches_reference_recursion():
    """Bonito forward vs a direct replica of the reference recursion.

    NOTE: the reference's BonitoPrefixTree (PrefixTree.h:635-663) only lets a
    sequence START at t=0 — its root node is never updated, so paths that
    open with one or more blanks before the first emission are dropped. This
    deviates from the true merged-repeat CTC label distribution (the
    enumeration oracle), and the reference never oracle-tests bonito. We
    reproduce the reference behavior faithfully and pin it here.
    """
    rng = np.random.default_rng(3)
    y = rng.random((4, 3))
    y = y / y.sum(axis=1, keepdims=True)
    logy = np.log(y)
    NEG = -np.inf

    def replica(li):
        T, L = len(logy), len(li)
        gap, nogap = {}, {}

        def g(d, s, t):
            return d.get((s, t), NEG)

        def total(s, t):
            if s == 0:
                return 0.0 if t == -1 else NEG
            return np.logaddexp(g(gap, s, t), g(nogap, s, t))

        for s in range(1, L + 1):
            c = li[s - 1]
            for t in range(T):
                gp = total(s, t - 1) + logy[t, -1]
                if s == 1 and t == 0:
                    ng = logy[0, c]
                elif s >= 2 and li[s - 2] == c:
                    ng = np.logaddexp(
                        g(gap, s - 1, t - 1) + logy[t, c],
                        g(nogap, s, t - 1) + logy[t, c],
                    )
                else:
                    ng = np.logaddexp(
                        total(s - 1, t - 1) + logy[t, c],
                        g(nogap, s, t - 1) + logy[t, c],
                    )
                gap[(s, t)], nogap[(s, t)] = gp, ng
        return np.logaddexp(g(gap, L, T - 1), g(nogap, L, T - 1))

    lut = {"A": 0, "B": 1}
    prof = BonitoProfile(y, ("A", "B", ""))
    for label in ["AB", "ABA", "A", "B", "AABB", "ABAB"]:
        expect = replica([lut[c] for c in label])
        got = fwd.forward(logy, label, alphabet="AB", model="ctc_merge_repeats")
        if np.isinf(expect):
            assert np.isinf(got)
        else:
            assert np.isclose(expect, got), (label, expect, got)
    # sanity: impossible labels stay impossible in the true distribution too
    assert prof.label_prob("AABB") == 0.0


def test_forward_padded_label_invariance():
    """Padding the label array must not change the result."""
    import jax.numpy as jnp

    y = np.array(
        [[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]]
    )
    logy = jnp.asarray(np.log(y))
    label = jnp.asarray(np.array([0, 1, 0, 0, 0, 0], dtype=np.int32))  # "ABA"+pad
    out = fwd.forward_ctc(logy, label, jnp.asarray(3))
    ref = fwd.forward(np.log(y), "ABA", alphabet="AB", model="ctc")
    assert np.isclose(float(out), ref)
