"""2D pair prefix search.

Equivalent of the reference's pair_prefix_search_log[_cy]
(poreover/decoding/prefix_search.py:247-385) and the C++ envelope variant
(PairPrefixSearch.cpp:79-229): greedy best-prefix expansion where a prefix's
score is the probability that BOTH reads emit an extension of it,

  P(prefix) = lse_{(u,v) in envelope} alpha*_1(u) + alpha*_2(v)
              + gamma(u+1, v+1)  -  gamma(0,0),

with gamma from ops.gamma (banded). The search stops when the best
extension's prefix probability drops below the best complete label's
probability (prefix_search.py:301).

The per-level forward updates and the envelope reduction are jitted; the
(data-dependent) search loop runs on host — each level is one device call
computing all four extensions at once. The stop rule compares against the
*previous* level's top label, exactly as the reference does
(prefix_search.py:298-308).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0, logsumexp
from .gamma import pair_gamma_log_envelope

_NEG_INF = LOG_0


@partial(jax.jit, static_argnames=("A",))
def _extend_all(y, alpha_prev, level, A: int):
    """alpha [A, T] (label forward) and alpha_ast [A, T] (no-gap forward)
    for all A extension characters (prefix_search.py:67-96)."""
    dtype = y.dtype
    gap_col = y[:, -1]
    first = level == 1
    seed = jnp.where(first, 0.0, _NEG_INF).astype(dtype)
    shifted = jnp.concatenate([seed[None], alpha_prev[:-1]])
    alpha_ast = (shifted[:, None] + y[:, :A]).T  # [A, T]

    fw0 = jnp.where(first, y[0, :A], jnp.full((A,), _NEG_INF, dtype))

    def step(fw, inp):
        y_t, prev_tm1, g = inp
        fw_new = jnp.logaddexp(g + fw, y_t + prev_tm1)
        return fw_new, fw_new

    _, rest = jax.lax.scan(step, fw0, (y[1:, :A], alpha_prev[:-1], gap_col[1:]))
    alpha = jnp.concatenate([fw0[None], rest]).T  # [A, T]
    return alpha, alpha_ast


@partial(jax.jit, static_argnames=("A", "Wb"))
def _level_step(y1, y2, alpha1_prev, alpha2_prev, level, G, env0, gamma00,
                A: int, Wb: int):
    """One search level: returns (alpha1 [A,U], alpha2 [A,V],
    prefix_prob [A], label_prob [A])."""
    U = y1.shape[0]
    V = y2.shape[0]
    alpha1, alpha_ast1 = _extend_all(y1, alpha1_prev, level, A)
    alpha2, alpha_ast2 = _extend_all(y2, alpha2_prev, level, A)

    # envelope reduction per char, bounded memory via lax.map over chars
    w_idx = jnp.arange(Wb)

    def per_char(c):
        a2 = alpha_ast2[c]
        a2_pad = jnp.concatenate([a2, jnp.full((Wb + 1,), _NEG_INF, a2.dtype)])
        idx = env0[:, None] + w_idx[None, :]  # [U, Wb] absolute v
        A2 = a2_pad[jnp.clip(idx, 0, V + Wb)]
        inner = logsumexp(A2 + G, axis=1)  # [U]
        return logsumexp(alpha_ast1[c] + inner)

    prefix_prob = jax.lax.map(per_char, jnp.arange(A)) - gamma00
    label_prob = alpha1[:, -1] + alpha2[:, -1] - gamma00
    return alpha1, alpha2, prefix_prob, label_prob


def pair_prefix_search_log(y1, y2, envelope=None, alphabet: str = "ACGT"):
    """Pair prefix search; returns (label, log joint probability).

    ``envelope``: [U, 2] int rows [start, end); None = dense (full lattice),
    matching the pure-python reference (prefix_search.py:247-310).
    """
    y1 = np.asarray(y1, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    U, V = len(y1), len(y2)
    A = len(alphabet)
    if envelope is None:
        envelope = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
    env = np.asarray(envelope, dtype=np.int64)

    gamma_band, offsets, gamma00 = pair_gamma_log_envelope(y1, y2, env)
    gamma_band = np.asarray(gamma_band)

    # G[u, w] = gamma(u+1, env[u,0]+w+1) for window cells of search row u
    Wb = int(np.max(env[:, 1] - env[:, 0]))
    G = np.full((U, Wb), -np.inf)
    for u in range(U):
        s, e = env[u]
        width = e - s
        # positions v = s..e-1 -> gamma row u+1 at v+1
        src_off = offsets[u + 1]
        lo = s + 1 - src_off
        row = gamma_band[u + 1]
        take = np.arange(lo, lo + width)
        valid = (take >= 0) & (take < row.shape[0])
        vals = np.where(valid, row[np.clip(take, 0, row.shape[0] - 1)], -np.inf)
        G[u, :width] = vals

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    y1j = jnp.asarray(y1, dtype)
    y2j = jnp.asarray(y2, dtype)
    Gj = jnp.asarray(G, dtype)
    env0 = jnp.asarray(env[:, 0])

    gap_prob = float(np.sum(y1[:, -1]) + np.sum(y2[:, -1]))
    # NOTE: the reference's empty-label probability is NOT normalized by
    # gamma(0,0) while every other label's is (prefix_search.py:262-263)
    top_label = ""
    top_prob = gap_prob
    curr = ""
    alpha1_prev = jnp.cumsum(y1j[:, -1])
    alpha2_prev = jnp.cumsum(y2j[:, -1])
    label_probs = {"": gap_prob}

    max_depth = max(U, V)
    while True:
        level = len(curr) + 1
        alpha1, alpha2, prefix_prob, label_prob = _level_step(
            y1j, y2j, alpha1_prev, alpha2_prev, jnp.asarray(level), Gj, env0,
            jnp.asarray(gamma00, dtype), A, Wb,
        )
        prefix_prob = np.asarray(prefix_prob)
        label_prob = np.asarray(label_prob)
        for c in range(A):
            label_probs[curr + alphabet[c]] = float(label_prob[c])

        best_c = int(np.argmax(prefix_prob))
        if prefix_prob[best_c] < label_probs[top_label]:
            break
        # move top to the global best label seen so far (dict-order max)
        top_label = max(label_probs.items(), key=lambda kv: kv[1])[0]
        top_prob = label_probs[top_label]
        curr = curr + alphabet[best_c]
        alpha1_prev = alpha1[best_c]
        alpha2_prev = alpha2[best_c]
        if len(curr) > max_depth:
            break

    return top_label, label_probs[top_label]
