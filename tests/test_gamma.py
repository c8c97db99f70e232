"""Pair gamma DP vs dense replica and joint-profile oracle
(reference tests/test_prefix.py:164-208)."""
import numpy as np
import pytest
from scipy.special import logsumexp as sp_lse

from poreover_tpu.ops.gamma import pair_gamma_log, pair_gamma_log_envelope
from oracles import CTCProfile, JointProfile

LOG_0 = -np.inf


def dense_gamma_replica(y1, y2):
    """Direct numpy port of reference prefix_search.py:35-65 semantics."""
    U, V = len(y1), len(y2)
    g = np.full((U + 1, V + 1), LOG_0)
    ga = np.full((U + 1, V + 1), LOG_0)
    g[U, V] = 0.0
    ga[U, V] = 0.0
    for v in range(V):
        g[U, v] = np.sum(y2[v:, -1])
    for u in range(U):
        g[u, V] = np.sum(y1[u:, -1])
    for u in reversed(range(U)):
        for v in reversed(range(V)):
            g_eps = g[u + 1, v] + y1[u, -1]
            ga_eps = ga[u, v + 1] + y2[v, -1]
            ga_ast = g[u + 1, v + 1] + sp_lse(y1[u, :-1] + y2[v, :-1])
            ga[u, v] = np.logaddexp(ga_eps, ga_ast)
            g[u, v] = np.logaddexp(g_eps, ga[u, v])
    return g


def _rand_profile(rng, T, S):
    y = rng.random((T, S))
    return y / y.sum(axis=1, keepdims=True)


def test_dense_gamma_matches_replica():
    rng = np.random.default_rng(0)
    y1 = np.log(_rand_profile(rng, 6, 3))
    y2 = np.log(_rand_profile(rng, 5, 3))
    got = pair_gamma_log(y1, y2)
    expect = dense_gamma_replica(y1, y2)
    mask = np.isfinite(expect)
    assert np.allclose(got[mask], expect[mask])
    assert np.all(np.isinf(got[~mask]) | np.isclose(got[~mask], expect[~mask]))


def test_gamma00_equals_prob_agree():
    rng = np.random.default_rng(1)
    y1 = _rand_profile(rng, 4, 3)
    y2 = _rand_profile(rng, 4, 3)
    prof1 = CTCProfile(y1, ("A", "B", ""))
    prof2 = CTCProfile(y2, ("A", "B", ""))
    joint = JointProfile(prof1, prof2)
    g = pair_gamma_log(np.log(y1), np.log(y2))
    assert np.isclose(g[0, 0], np.log(joint.prob_agree))


def test_envelope_full_band_matches_dense():
    rng = np.random.default_rng(2)
    y1 = np.log(_rand_profile(rng, 7, 5))
    y2 = np.log(_rand_profile(rng, 6, 5))
    U, V = 7, 6
    dense = pair_gamma_log(y1, y2)
    env = np.tile([0, V], (U + 1, 1))
    band, offs, g00 = pair_gamma_log_envelope(y1, y2, env)
    assert np.isclose(g00, dense[0, 0])
    band = np.asarray(band)
    for u in range(U + 1):
        got = band[u]
        expect = dense[u]
        m = np.isfinite(expect)
        assert np.allclose(got[m], expect[m])


def test_envelope_banded_agrees_on_wide_band():
    """A generous band reproduces the dense gamma inside the band."""
    rng = np.random.default_rng(3)
    y1 = np.log(_rand_profile(rng, 10, 3))
    y2 = np.log(_rand_profile(rng, 10, 3))
    dense = dense_gamma_replica(y1, y2)
    env = np.array([[0, 10]] * 11)
    band, offs, g00 = pair_gamma_log_envelope(y1, y2, env)
    assert np.isclose(g00, dense[0, 0])


def test_u_row_envelope_is_extended():
    rng = np.random.default_rng(4)
    y1 = np.log(_rand_profile(rng, 5, 3))
    y2 = np.log(_rand_profile(rng, 5, 3))
    env_u = np.tile([0, 5], (5, 1))  # U rows, no extra
    band, offs, g00 = pair_gamma_log_envelope(y1, y2, env_u)
    env_full = np.tile([0, 5], (6, 1))
    band2, offs2, g002 = pair_gamma_log_envelope(y1, y2, env_full)
    assert np.isclose(g00, g002)
