"""1D beam search vs enumeration oracles and exhaustive label scoring.

Mirrors reference tests/test_beam.py's 1D cases and extends them: with a
beam wide enough to hold every reachable prefix, beam search must return the
label that maximizes the model's own forward score.
"""
import itertools

import numpy as np
import pytest

from poreover_tpu.ops import forward as fwd
from poreover_tpu.ops.beam import beam_search
from oracles import CTCProfile, FlipFlopProfile


def _best_label_by_forward(y_log, alphabet, model, max_len):
    best, best_p = None, -np.inf
    for L in range(1, max_len + 1):
        for combo in itertools.product(alphabet, repeat=L):
            label = "".join(combo)
            p = fwd.forward(y_log, label, alphabet=alphabet, model=model)
            if p > best_p:
                best, best_p = label, p
    return best


def test_beam_1d_toy():
    y = np.array([[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]])
    prof = CTCProfile(y, ("A", "B", ""))
    result = beam_search(np.log(y), beam_width=25, alphabet="AB", model="ctc")
    assert result == prof.top_label()[0]


def test_beam_1d_toy2():
    y = np.array([[0.4, 0.5, 0.1], [0.4, 0.2, 0.4], [0.3, 0.5, 0.2]])
    prof = CTCProfile(y, ("A", "B", ""))
    result = beam_search(np.log(y), beam_width=25, alphabet="AB", model="ctc")
    assert result == prof.top_label()[0]


def test_beam_1d_random_profiles_vs_oracle():
    rng = np.random.default_rng(7)
    for _ in range(8):
        y = rng.random((5, 3))
        y = y / y.sum(axis=1, keepdims=True)
        prof = CTCProfile(y, ("A", "B", ""))
        result = beam_search(np.log(y), beam_width=64, alphabet="AB", model="ctc")
        assert result == prof.top_label()[0], (result, prof.top_label())


def test_beam_1d_flipflop_toy():
    y = np.array(
        [
            [0.8, 0.1, 0.05, 0.05],
            [0.1, 0.3, 0.5, 0.1],
            [0.7, 0.2, 0.05, 0.05],
            [0.1, 0.1, 0.2, 0.6],
        ]
    )
    prof = FlipFlopProfile(y, ("A", "B", "a", "b"))
    result = beam_search(
        np.log(y), beam_width=25, alphabet="AB", model="ctc_flipflop"
    )
    assert result == prof.top_label()[0]


def test_beam_maximizes_own_forward_score_bonito():
    """Wide beam == exhaustive search under the model's own scoring."""
    rng = np.random.default_rng(11)
    y = rng.random((4, 3))
    y = y / y.sum(axis=1, keepdims=True)
    y_log = np.log(y)
    expect = _best_label_by_forward(y_log, "AB", "ctc_merge_repeats", 4)
    result = beam_search(
        y_log, beam_width=64, alphabet="AB", model="ctc_merge_repeats"
    )
    assert result == expect


def test_beam_maximizes_own_forward_score_ctc():
    rng = np.random.default_rng(13)
    y = rng.random((4, 3))
    y = y / y.sum(axis=1, keepdims=True)
    y_log = np.log(y)
    expect = _best_label_by_forward(y_log, "AB", "ctc", 4)
    result = beam_search(y_log, beam_width=64, alphabet="AB", model="ctc")
    assert result == expect


def test_beam_on_real_trace():
    """Beam on the bundled 500-step read: deterministic, DNA-only, and its
    own forward score at least matches the Viterbi label's."""
    from poreover_tpu.io.trace import model_from_trace

    model = model_from_trace("/root/reference/tests/poreover.csv")
    seq1 = beam_search(model.log_prob, beam_width=10)
    seq2 = beam_search(model.log_prob, beam_width=10)
    assert seq1 == seq2
    assert set(seq1) <= set("ACGT")
    assert len(seq1) > 10
    viterbi_seq = model.viterbi_decode()
    p_beam = fwd.forward(model.log_prob, seq1, model="ctc")
    p_vit = fwd.forward(model.log_prob, viterbi_seq, model="ctc")
    assert p_beam >= p_vit - 1e-9
