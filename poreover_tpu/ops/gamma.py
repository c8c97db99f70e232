"""Pair gamma DP: log-probability that two reads emit the same sequence.

Equivalent of the reference's gamma kernels — dense python
(poreover/decoding/prefix_search.py:35-65), Cython envelope variants
(decoding_cy.pyx:175-322) and the C++ envelope DP (Gamma.h:15-157).
gamma(0,0) = log P(both reads agree on some label) is the pair-consensus
normalizer; the full (banded) matrix feeds pair prefix search.

Recursions (prefix_search.py:54-63):
  gamma*(u,v) = lse( gamma*(u,v+1) + y2[v,gap],
                     gamma(u+1,v+1) + lse_c(y1[u,c]+y2[v,c]) )
  gamma (u,v) = lse( gamma(u+1,v) + y1[u,gap], gamma*(u,v) )
with boundary gamma(U,v) = suffix gap mass of y2, gamma(u,V) = suffix gap
mass of y1, gamma(U,V) = 0.

TPU design: one ``lax.scan`` over rows u = U-1..0. The within-row gamma*
dependency (right-to-left chain) is solved in closed form: with local gap
prefix sums cG2, gamma*(u,v) = revcumlse(C + cG2) - cG2, computed by a
reverse ``associative_scan`` of logaddexp — so each row is O(W) vector work
with log-depth scan, W = band width. Storage is row-banded [U+1, W] with
per-row offsets, exactly the envelope's sparse layout (SparseMatrix.h), and
cells the reference leaves unwritten read as -inf.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0, logsumexp

_NEG_INF = LOG_0


def _band_width(env: np.ndarray) -> int:
    return int(np.max(env[:, 1] - env[:, 0])) + 1  # inclusive storage cell


@partial(jax.jit, static_argnames=("W", "A"))
def _gamma_scan(y1, y2, env, S1, S2, W: int, A: int):
    """Banded gamma DP.

    y1 [U, A+1], y2 [V, A+1]; env [U+1, 2] rows [start, end) (storage is
    inclusive of ``end``, mirroring SparseMatrix rows); S1 [U+1], S2 [V+1]
    suffix gap masses. Returns gamma_band [U+1, W] (row u stored from
    env[u,0]).
    """
    U = y1.shape[0]
    V = y2.shape[0]
    dtype = y1.dtype
    pad = W + 2

    gap2_pad = jnp.concatenate(
        [jnp.zeros((pad,), dtype), y2[:, -1], jnp.zeros((pad,), dtype)]
    )
    y2_pad = jnp.concatenate(
        [
            jnp.full((pad, A), _NEG_INF, dtype),
            y2[:, :A],
            jnp.full((pad, A), _NEG_INF, dtype),
        ]
    )
    S2_pad = jnp.concatenate(
        [jnp.full((pad,), _NEG_INF, dtype), S2, jnp.full((pad,), _NEG_INF, dtype)]
    )

    w_idx = jnp.arange(W)

    # ---- boundary row U (Gamma.h:33-45): S2 on [start,end]∩[0,V-1], 0 at V
    offU = env[U, 0]
    vU = offU + w_idx
    rowU = jax.lax.dynamic_slice(S2_pad, (offU + pad,), (W,))
    rowU = jnp.where((vU <= env[U, 1]) & (vU < V), rowU, _NEG_INF)
    rowU = jnp.where((vU == V) & (V <= env[U, 1]), 0.0, rowU)

    def row_step(carry, inp):
        g_next, off_next = carry  # gamma row u+1, its offset
        u = inp
        off = env[u, 0]
        end = env[u, 1]
        v = off + w_idx
        in_range = v < end  # compute range [start, end)

        g_next_pad = jnp.concatenate(
            [
                jnp.full((pad,), _NEG_INF, dtype),
                g_next,
                jnp.full((pad,), _NEG_INF, dtype),
            ]
        )
        shift = off - off_next
        g_up = jax.lax.dynamic_slice(g_next_pad, (shift + pad,), (W,))  # gamma(u+1,v)
        g_diag = jax.lax.dynamic_slice(g_next_pad, (shift + 1 + pad,), (W,))

        y2_band = jax.lax.dynamic_slice(y2_pad, (off + pad, 0), (W, A))
        inner = logsumexp(y1[u, :A][None, :] + y2_band, axis=1)  # [W]
        C = jnp.where(in_range, g_diag + inner, _NEG_INF)

        # local (window-relative) gap prefix sums for the gamma* chain
        g2_band = jax.lax.dynamic_slice(gap2_pad, (off + pad,), (W,))
        g2_band = jnp.where(in_range, g2_band, 0.0)
        cG2 = jnp.concatenate([jnp.zeros((1,), dtype), jnp.cumsum(g2_band)[:-1]])

        rev = jax.lax.associative_scan(jnp.logaddexp, C + cG2, reverse=True)
        g_ast = jnp.where(in_range, rev - cG2, _NEG_INF)

        g_row = jnp.where(in_range, jnp.logaddexp(g_up + y1[u, -1], g_ast), _NEG_INF)
        # boundary cell gamma(u,V) = S1[u], stored only if V fits the band
        g_row = jnp.where((v == V) & (V <= end), S1[u], g_row)
        return (g_row, off), g_row

    us = jnp.arange(U - 1, -1, -1)
    (_, _), rows = jax.lax.scan(row_step, (rowU, offU), us)
    # rows come out for u = U-1..0; assemble [U+1, W] in ascending u order
    gamma_band = jnp.concatenate([rows[::-1], rowU[None, :]], axis=0)
    return gamma_band


def pair_gamma_log_envelope(y1, y2, envelope):
    """Banded gamma matrix. ``envelope``: [U+1, 2] or [U, 2] int rows
    [start, end) — a U-row envelope is extended by duplicating its last row
    (the C++ reads one row past a U-row envelope: PairPrefixSearch.cpp:91-94;
    we give that access defined semantics).

    Returns (gamma_band [U+1, W], offsets [U+1], gamma00).
    """
    y1 = np.asarray(y1)
    y2 = np.asarray(y2)
    U, V = len(y1), len(y2)
    env = np.asarray(envelope, dtype=np.int64)
    if env.shape[0] == U:
        env = np.concatenate([env, env[-1:]], axis=0)
    assert env.shape == (U + 1, 2), env.shape

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    y1j = jnp.asarray(y1, dtype)
    y2j = jnp.asarray(y2, dtype)
    # suffix gap masses (Gamma.h:37-55)
    S1 = jnp.concatenate(
        [jnp.cumsum(y1j[::-1, -1])[::-1], jnp.zeros((1,), dtype)]
    )
    S2 = jnp.concatenate(
        [jnp.cumsum(y2j[::-1, -1])[::-1], jnp.zeros((1,), dtype)]
    )
    A = y1.shape[1] - 1
    W = _band_width(env)
    gamma_band = _gamma_scan(y1j, y2j, jnp.asarray(env), S1, S2, W, A)
    offsets = env[:, 0]
    g00 = (
        float(gamma_band[0, -offsets[0]])
        if 0 >= offsets[0] and 0 < offsets[0] + W
        else _NEG_INF
    )
    return gamma_band, offsets, g00


def pair_gamma_log(y1, y2):
    """Dense gamma matrix [U+1, V+1] (reference prefix_search.py:35-65)."""
    U, V = len(y1), len(y2)
    env = np.tile(np.array([0, V], dtype=np.int64), (U + 1, 1))
    gamma_band, offsets, _ = pair_gamma_log_envelope(y1, y2, env)
    return np.asarray(gamma_band)  # W == V+1, offset 0 everywhere
