"""2D pair beam search: consistency + joint-profile oracle tests.

Mirrors the reference's test matrix (tests/test_beam.py:25-105): 2D of a
read with itself equals 1D; full envelope equals no envelope; a width-1
diagonal envelope equals 1D; toy pairs recover the joint-profile top label.
"""
import numpy as np
import pytest

from poreover_tpu.ops.beam import beam_search
from poreover_tpu.ops.beam2d import beam_search_2d
from oracles import CTCProfile, FlipFlopProfile, JointProfile


Y_TOY = np.array(
    [[0.8, 0.1, 0.1], [0.1, 0.3, 0.6], [0.7, 0.2, 0.1], [0.1, 0.1, 0.8]]
)


def test_2d_same_as_1d_toy():
    y = np.log(Y_TOY)
    r1 = beam_search(y, beam_width=25, alphabet="AB")
    r2 = beam_search_2d(y, y, beam_width=25, alphabet="AB")
    assert r1 == r2


def test_2d_full_envelope_joint_oracle():
    y1 = Y_TOY
    y2 = np.array(
        [[0.7, 0.2, 0.1], [0.2, 0.3, 0.5], [0.7, 0.2, 0.1], [0.05, 0.05, 0.9]]
    )
    seq = beam_search_2d(np.log(y1), np.log(y2), beam_width=25, alphabet="AB")
    joint = JointProfile(CTCProfile(y1, ("A", "B", "")), CTCProfile(y2, ("A", "B", "")))
    assert seq == joint.top_label()[0]


def test_2d_flipflop_matches_replica():
    """NOTE: the reference test (tests/test_beam.py:52-61) asserts flipflop
    1D == 2D, but under the by-row comparator (last0 + row-max of read1,
    node_greater_max) the shorter label legitimately outranks the 1D winner
    on this profile — the C++ math gives 'AAA' (score -4.63) over 'AAAA'
    (-5.76). We pin the vectorized kernel against an exact hashmap replica
    of the reference semantics instead."""
    from poreover_tpu.decoding.replica2d import beam_search_2d_by_row_replica

    y = np.array(
        [
            [0.8, 0.1, 0.05, 0.05],
            [0.1, 0.3, 0.5, 0.1],
            [0.7, 0.2, 0.05, 0.05],
            [0.1, 0.1, 0.2, 0.6],
        ]
    )
    r2 = beam_search_2d(
        np.log(y), np.log(y), beam_width=25, alphabet="AB", model="ctc_flipflop"
    )
    rr = beam_search_2d_by_row_replica(
        np.log(y), np.log(y), alphabet="AB", beam_width=25, model="ctc_flipflop"
    )
    assert r2 == rr


def test_2d_random_profiles_match_replica():
    """Vectorized kernel vs exact replica across models and envelopes."""
    from poreover_tpu.decoding.replica2d import beam_search_2d_by_row_replica

    rng = np.random.default_rng(17)
    for model, S in (("ctc", 3), ("ctc_merge_repeats", 3), ("ctc_flipflop", 4)):
        for trial in range(3):
            y1 = rng.random((6, S))
            y1 = np.log(y1 / y1.sum(axis=1, keepdims=True))
            y2 = rng.random((5, S))
            y2 = np.log(y2 / y2.sum(axis=1, keepdims=True))
            r_vec = beam_search_2d(y1, y2, beam_width=4, alphabet="AB", model=model)
            r_rep = beam_search_2d_by_row_replica(
                y1, y2, alphabet="AB", beam_width=4, model=model
            )
            assert r_vec == r_rep, (model, trial, r_vec, r_rep)


def test_2d_envelope_random_matches_replica():
    from poreover_tpu.decoding.replica2d import beam_search_2d_by_row_replica

    rng = np.random.default_rng(23)
    y1 = rng.random((8, 3))
    y1 = np.log(y1 / y1.sum(axis=1, keepdims=True))
    y2 = rng.random((8, 3))
    y2 = np.log(y2 / y2.sum(axis=1, keepdims=True))
    env = np.array([(max(0, i - 2), min(i + 3, 8)) for i in range(8)])
    r_vec = beam_search_2d(y1, y2, envelope=env, beam_width=4, alphabet="AB")
    r_rep = beam_search_2d_by_row_replica(
        y1, y2, alphabet="AB", beam_width=4, model="ctc", envelope=env
    )
    assert r_vec == r_rep


class TestRealTrace:
    @classmethod
    def setup_class(cls):
        from poreover_tpu.io.trace import model_from_trace

        cls.model = model_from_trace("/root/reference/tests/poreover.csv")
        cls.t_max = cls.model.log_prob.shape[0]

    def test_same(self):
        y = self.model.log_prob
        r1 = beam_search(y, beam_width=10)
        r2 = beam_search_2d(y, y, beam_width=10)
        assert r1 == r2

    def test_same_row_envelope(self):
        y = self.model.log_prob
        w = 10
        env = np.array(
            [(max(0, i - w), min(i + w, self.t_max)) for i in range(self.t_max)]
        )
        r1 = beam_search(y, beam_width=10)
        r2 = beam_search_2d(y, y, envelope=env, beam_width=10)
        assert r1 == r2

    def test_full_envelope_matches_none(self):
        y = self.model.log_prob
        env = np.tile([0, self.t_max - 1], (self.t_max, 1))
        r_full = beam_search_2d(y, y, beam_width=5)
        r_env = beam_search_2d(y, y, envelope=env, beam_width=5)
        assert r_full == r_env

    def test_diagonal_envelope_matches_1d(self):
        y = self.model.log_prob
        env = np.array([(i, i + 1) for i in range(self.t_max)])
        r1 = beam_search(y, beam_width=25)
        r2 = beam_search_2d(y, y, envelope=env, beam_width=25)
        assert r1 == r2


class TestRowCol:
    def test_rowcol_random_matches_replica(self):
        from poreover_tpu.decoding.replica2d import beam_search_2d_row_col_replica

        rng = np.random.default_rng(31)
        for model, S in (("ctc", 3), ("ctc_merge_repeats", 3), ("ctc_flipflop", 4)):
            for trial in range(3):
                y1 = rng.random((7, S))
                y1 = np.log(y1 / y1.sum(axis=1, keepdims=True))
                y2 = rng.random((6, S))
                y2 = np.log(y2 / y2.sum(axis=1, keepdims=True))
                env = np.array(
                    [(max(0, i - 2), min(i + 3, 6)) for i in range(7)]
                )
                r_vec = beam_search_2d(
                    y1, y2, envelope=env, beam_width=4, alphabet="AB",
                    model=model, method="row_col",
                )
                r_rep = beam_search_2d_row_col_replica(
                    y1, y2, env, alphabet="AB", beam_width=4, model=model
                )
                assert r_vec == r_rep, (model, trial, r_vec, r_rep)

    def test_rowcol_full_envelope_joint_oracle(self):
        y1 = Y_TOY
        y2 = np.array(
            [[0.7, 0.2, 0.1], [0.2, 0.3, 0.5], [0.7, 0.2, 0.1], [0.05, 0.05, 0.9]]
        )
        env = np.tile([0, 4], (4, 1))
        seq = beam_search_2d(
            np.log(y1), np.log(y2), envelope=env, beam_width=25,
            alphabet="AB", method="row_col",
        )
        joint = JointProfile(
            CTCProfile(y1, ("A", "B", "")), CTCProfile(y2, ("A", "B", ""))
        )
        assert seq == joint.top_label()[0]

    def test_rowcol_real_trace_vs_replica(self):
        from poreover_tpu.decoding.replica2d import beam_search_2d_row_col_replica
        from poreover_tpu.io.trace import model_from_trace

        m = model_from_trace("/root/reference/tests/poreover.csv")
        y = m.log_prob[:120]
        T = len(y)
        env = np.array([(max(0, i - 8), min(i + 8, T)) for i in range(T)])
        r_vec = beam_search_2d(
            y, y, envelope=env, beam_width=5, method="row_col"
        )
        r_rep = beam_search_2d_row_col_replica(y, y, env, beam_width=5)
        assert r_vec == r_rep


class TestRowColScale:
    """Full-pipeline-derived workload: TPU kernel vs single-core C++ trie
    decoder (native/pair_beam_cpu.cpp). Exact agreement at mid scale; at
    full read scale a handful of near-tie bases may differ because the C++
    (like the reference) keeps unbounded per-node hashmap history while the
    kernel keeps windowed state."""

    def test_real_envelope_slice_exact(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from bench import build_workload
        from poreover_tpu.native import pair_beam_row_col_cpu

        y1, y2, env = build_workload()
        N = 1500
        y1s, y2s = y1[:N], y2[: int(env[N, 1])]
        envs = np.clip(env[:N], 0, len(y2s))
        r_cpu = pair_beam_row_col_cpu(y1s, y2s, envs, beam_width=5)
        r_vec = beam_search_2d(
            y1s, y2s, envelope=envs, beam_width=5, method="row_col"
        )
        assert r_cpu == r_vec


class TestPlanned:
    """Plan-driven fast path vs replica and the step-driven kernel."""

    def test_planned_random_matches_replica(self):
        from poreover_tpu.decoding.replica2d import beam_search_2d_row_col_replica
        from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned

        rng = np.random.default_rng(47)
        for model, S in (("ctc", 3), ("ctc_merge_repeats", 3), ("ctc_flipflop", 4)):
            for trial in range(2):
                y1 = rng.random((9, S))
                y1 = np.log(y1 / y1.sum(axis=1, keepdims=True))
                y2 = rng.random((8, S))
                y2 = np.log(y2 / y2.sum(axis=1, keepdims=True))
                env = np.array([(max(0, i - 2), min(i + 3, 8)) for i in range(9)])
                r_p = beam_search_2d_planned(
                    y1, y2, env, beam_width=4, alphabet="AB", model=model
                )
                r_r = beam_search_2d_row_col_replica(
                    y1, y2, env, alphabet="AB", beam_width=4, model=model
                )
                assert r_p == r_r, (model, trial, r_p, r_r)

    def test_planned_real_slice_matches_cpp(self):
        import sys

        sys.path.insert(0, "/root/repo")
        from bench import build_workload
        from poreover_tpu.native import pair_beam_row_col_cpu
        from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned

        y1, y2, env = build_workload()
        N = 1500
        y1s, y2s = y1[:N], y2[: int(env[N, 1])]
        envs = np.clip(env[:N], 0, len(y2s))
        r_cpu = pair_beam_row_col_cpu(y1s, y2s, envs, beam_width=5)
        r_p = beam_search_2d_planned(y1s, y2s, envs, beam_width=5)
        assert r_cpu == r_p


class TestGridMethod:
    """method='grid' — per-cell beams (reference BeamSearch2.h:33-184)."""

    def test_grid_joint_oracle_toy(self):
        y1 = Y_TOY
        y2 = np.array(
            [[0.7, 0.2, 0.1], [0.2, 0.3, 0.5], [0.7, 0.2, 0.1],
             [0.05, 0.05, 0.9]]
        )
        seq = beam_search_2d(
            np.log(y1), np.log(y2), beam_width=25, alphabet="AB",
            method="grid",
        )
        joint = JointProfile(
            CTCProfile(y1, ("A", "B", "")), CTCProfile(y2, ("A", "B", ""))
        )
        assert seq == joint.top_label()[0]

    def test_grid_envelope_equals_dense_on_full_band(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(6, 5)) * 2
        y = np.exp(x) / np.exp(x).sum(1, keepdims=True)
        ylog = np.log(y)
        env = np.tile(np.array([0, 6]), (6, 1))
        dense = beam_search_2d(ylog, ylog, beam_width=5, method="grid")
        banded = beam_search_2d(
            ylog, ylog, envelope=env, beam_width=5, method="grid"
        )
        assert dense == banded

    def test_grid_cell_guard(self):
        y = np.zeros((4000, 5))
        with pytest.raises(MemoryError):
            beam_search_2d(y, y, beam_width=5, method="grid")


def test_native_plan_walk_matches_python():
    """C++ plan builder (native/plan_walk.cpp) must reproduce the Python
    walk exactly, including degenerate/uncovered envelope shapes."""
    import numpy as np

    from poreover_tpu import native
    from poreover_tpu.ops.beam2d_planned import plan_walk, transpose_envelope

    if native.load() is None:
        import pytest

        pytest.skip("native library unavailable")
    rng = np.random.default_rng(3)
    cases = []
    for U, V in [(40, 55), (80, 30), (64, 64)]:
        lo = np.clip(np.sort(rng.integers(0, V, U)), 0, V - 1)
        hi = np.clip(lo + rng.integers(1, 12, U), 1, V)
        cases.append(np.stack([lo, hi], axis=1).astype(np.int64))
        cases.append(np.tile(np.array([0, V], dtype=np.int64), (U, 1)))
    # degenerate: rows with empty ranges
    e = cases[0].copy()
    e[5:9, 1] = e[5:9, 0]
    cases.append(e)
    for env in cases:
        U = len(env)
        V = int(env[:, 1].max())
        ref = plan_walk(env, transpose_envelope(env, U, V), U, V)
        got = native.plan_walk_native(env, U, V)
        for k in ref:
            np.testing.assert_array_equal(got[k], ref[k], err_msg=k)
