"""1D prefix search vs enumeration oracle (reference tests/test_prefix.py:65-83)."""
import numpy as np
import pytest

from poreover_tpu.ops.prefix import prefix_search_log
from oracles import CTCProfile


def test_prefix_search_toy():
    y = np.array([[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]])
    prof = CTCProfile(y, ("A", "B", ""))
    label, prob = prefix_search_log(np.log(y), alphabet="AB")
    expect_label, expect_prob = prof.top_label()
    assert label == expect_label
    assert np.isclose(prob, np.log(expect_prob))


def test_prefix_search_random_profiles():
    rng = np.random.default_rng(21)
    hits = 0
    for _ in range(10):
        y = rng.random((5, 3))
        y = y / y.sum(axis=1, keepdims=True)
        prof = CTCProfile(y, ("A", "B", ""))
        label, prob = prefix_search_log(np.log(y), alphabet="AB")
        expect_label, expect_prob = prof.top_label()
        # prefix search is exact for the top label
        assert label == expect_label, (label, expect_label)
        assert np.isclose(prob, np.log(expect_prob))
        hits += 1
    assert hits == 10


def test_prefix_search_gap_dominant():
    """All-gap profile: empty label wins."""
    y = np.array([[0.05, 0.05, 0.9]] * 4)
    label, prob = prefix_search_log(np.log(y), alphabet="AB")
    assert label == ""
    assert np.isclose(prob, 4 * np.log(0.9))


def test_prefix_search_real_window():
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu.ops import forward as fwd

    model = model_from_trace("/root/reference/tests/poreover.csv")
    y = model.log_prob[:100]
    label, prob = prefix_search_log(y)
    assert set(label) <= set("ACGT")
    # returned prob must equal the label's forward probability
    assert np.isclose(prob, fwd.forward(y, label, model="ctc"))


def test_pair_prefix_search_toy():
    """Pair prefix search recovers the joint-profile top label with its
    normalized probability (reference tests/test_prefix.py:106-162)."""
    from poreover_tpu.ops.pair_prefix import pair_prefix_search_log
    from oracles import JointProfile

    y1 = np.array(
        [[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]]
    )
    y2 = np.array(
        [[0.7, 0.2, 0.1], [0.2, 0.3, 0.5], [0.7, 0.2, 0.1], [0.05, 0.05, 0.9]]
    )
    prof1 = CTCProfile(y1, ("A", "B", ""))
    prof2 = CTCProfile(y2, ("A", "B", ""))
    joint = JointProfile(prof1, prof2)
    label, prob = pair_prefix_search_log(np.log(y1), np.log(y2), alphabet="AB")
    expect_label, expect_prob = joint.top_label()
    assert label == expect_label
    assert np.isclose(prob, np.log(expect_prob) - np.log(joint.prob_agree))


def test_pair_prefix_search_random():
    from poreover_tpu.ops.pair_prefix import pair_prefix_search_log
    from oracles import JointProfile

    rng = np.random.default_rng(41)
    for _ in range(5):
        y1 = rng.random((4, 3))
        y1 = y1 / y1.sum(axis=1, keepdims=True)
        y2 = rng.random((4, 3))
        y2 = y2 / y2.sum(axis=1, keepdims=True)
        joint = JointProfile(CTCProfile(y1, ("A", "B", "")), CTCProfile(y2, ("A", "B", "")))
        label, prob = pair_prefix_search_log(np.log(y1), np.log(y2), alphabet="AB")
        expect_label, expect_prob = joint.top_label()
        if expect_label == "":
            continue  # gap-dominant: reference returns '' unnormalized
        assert label == expect_label, (label, expect_label)
        assert np.isclose(prob, np.log(expect_prob) - np.log(joint.prob_agree))


def test_pair_prefix_search_envelope_matches_dense():
    from poreover_tpu.ops.pair_prefix import pair_prefix_search_log

    rng = np.random.default_rng(43)
    y1 = rng.random((6, 5))
    y1 = np.log(y1 / y1.sum(axis=1, keepdims=True))
    y2 = rng.random((6, 5))
    y2 = np.log(y2 / y2.sum(axis=1, keepdims=True))
    dense = pair_prefix_search_log(y1, y2)
    env = np.tile([0, 6], (6, 1))
    full_env = pair_prefix_search_log(y1, y2, envelope=env)
    assert dense[0] == full_env[0]
    assert np.isclose(dense[1], full_env[1])


class TestBacktrackSearch:
    """Heap prefix search (reference search_backtrack.py:28-106)."""

    def test_matches_enumeration_top_label(self):
        from oracles import CTCProfile
        from poreover_tpu.ops.search_backtrack import prefix_search_backtrack

        y = np.array(
            [[0.6, 0.3, 0.1], [0.1, 0.2, 0.7], [0.2, 0.6, 0.2],
             [0.05, 0.05, 0.9]]
        )
        prof = CTCProfile(y, ("A", "B", ""))
        exp_label, exp_p = prof.top_label()
        label, p = prefix_search_backtrack(np.log(y), alphabet="AB",
                                           max_backtrack=4)
        assert label == exp_label
        assert np.isclose(p, np.log(exp_p), atol=1e-6)

    def test_agrees_with_greedy_prefix_search(self):
        from poreover_tpu.ops.prefix import prefix_search_log
        from poreover_tpu.ops.search_backtrack import prefix_search_backtrack

        rng = np.random.default_rng(3)
        for _ in range(3):
            x = rng.normal(size=(12, 5)) * 2
            y = np.log(np.exp(x) / np.exp(x).sum(1, keepdims=True))
            lab_g, p_g = prefix_search_log(y)
            lab_b, p_b = prefix_search_backtrack(y, max_backtrack=12)
            # backtracking explores a superset of the greedy path; its
            # winner must be at least as probable
            assert p_b >= p_g - 1e-9
