"""Viterbi path search as jitted JAX scans.

TPU-first replacement for the reference's per-timestep numpy Viterbi loop
(poreover/decoding/transducer.py:35-59). The DP is a ``lax.scan`` over time
with a dense [S] state vector (S=5 or 8 states — VPU-friendly), the pointer
matrix streams out of the scan, and traceback is a second (reversed) scan.

Note on masking: the reference computes ``prev = transition.T + v[t-1]``
where ``transition`` is a 0/1 matrix — i.e. it ADDS the binary mask to the
log-probabilities (+1.0 for allowed, +0.0 for disallowed) rather than
forbidding disallowed transitions with -inf (transducer.py:44). We reproduce
that additive behavior by default for output parity (``mask_mode=
"additive"``), and also offer a proper -inf mask (``mask_mode="hard"``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0


@partial(jax.jit, static_argnames=("mask_mode",))
def _viterbi_masked(y: jax.Array, transition: jax.Array, mask_mode: str = "additive"):
    """Viterbi DP over a [T, S] log-prob table with an [S, S] transition mask.

    Returns (path [T] int32, score).
    """
    if mask_mode == "additive":
        trans = transition.T  # trans[j, i]: score bonus moving i -> j
    else:
        trans = jnp.where(transition.T > 0, 0.0, LOG_0)

    def step(v_prev, y_t):
        scores = trans + v_prev[None, :]  # [S_to, S_from]
        ptr = jnp.argmax(scores, axis=1)
        v = y_t + jnp.max(scores, axis=1)
        return v, ptr

    v_final, ptrs = jax.lax.scan(step, y[0], y[1:])

    last_state = jnp.argmax(v_final)

    def back(state, ptr_t):
        return ptr_t[state], state

    first_state, rest = jax.lax.scan(back, last_state, ptrs, reverse=True)
    path = jnp.concatenate([jnp.array([first_state]), rest])
    return path.astype(jnp.int32), v_final[last_state]


def viterbi_path_masked(y, transition, mask_mode: str = "additive"):
    """Best state path for a [T, S] table under a transition mask."""
    path, _ = _viterbi_masked(jnp.asarray(y), jnp.asarray(transition), mask_mode)
    return path


@partial(jax.jit, static_argnames=("mask_mode",))
def _viterbi_masked_padded(y, t_valid, transition, mask_mode: str = "additive"):
    """Length-masked Viterbi for padded batches: padded steps freeze the
    value vector and write identity back-pointers, so traceback through the
    pad is a no-op and the decoded path equals the unpadded run."""
    S = y.shape[-1]
    if mask_mode == "additive":
        trans = transition.T
    else:
        trans = jnp.where(transition.T > 0, 0.0, LOG_0)
    idx = jnp.arange(S, dtype=jnp.int32)

    def step(v_prev, inp):
        y_t, valid_t = inp
        scores = trans + v_prev[None, :]
        ptr = jnp.where(valid_t, jnp.argmax(scores, axis=1).astype(jnp.int32), idx)
        v = jnp.where(valid_t, y_t + jnp.max(scores, axis=1), v_prev)
        return v, ptr

    v_final, ptrs = jax.lax.scan(step, y[0], (y[1:], t_valid[1:]))
    last_state = jnp.argmax(v_final).astype(jnp.int32)

    def back(state, ptr_t):
        return ptr_t[state], state

    first_state, rest = jax.lax.scan(back, last_state, ptrs, reverse=True)
    path = jnp.concatenate([jnp.array([first_state]), rest])
    return path.astype(jnp.int32), v_final[last_state]


_viterbi_masked_batch = jax.jit(
    jax.vmap(_viterbi_masked_padded, in_axes=(0, 0, None, None)),
    static_argnums=(3,),
)


def viterbi_path_masked_batch(ys, transition, mask_mode: str = "additive"):
    """Batched masked Viterbi over variable-length reads.

    ``ys`` is a list of [T_i, S] tables; they are padded to a shared length
    and decoded in ONE kernel launch. Returns a list of [T_i] paths equal to
    per-read `viterbi_path_masked` output.
    """
    if len(ys) == 0:
        return []
    lengths = [int(np.asarray(y).shape[0]) for y in ys]
    Tpad = max(lengths)
    S = int(np.asarray(ys[0]).shape[1])
    B = len(ys)
    yb = np.zeros((B, Tpad, S), np.float32)
    tv = np.zeros((B, Tpad), bool)
    for i, y in enumerate(ys):
        yb[i, : lengths[i]] = np.asarray(y)
        tv[i, : lengths[i]] = True
    paths, _ = _viterbi_masked_batch(
        jnp.asarray(yb), jnp.asarray(tv), jnp.asarray(transition), mask_mode
    )
    paths = np.asarray(paths)
    return [paths[i, : lengths[i]] for i in range(B)]


@jax.jit
def argmax_path(y: jax.Array) -> jax.Array:
    """Per-step argmax path (Viterbi for unconstrained CTC models)."""
    return jnp.argmax(y, axis=-1).astype(jnp.int32)


@jax.jit
def argmax_path_batch(y: jax.Array) -> jax.Array:
    """[B, T, S] -> [B, T] per-step argmax paths (padded reads decode as a batch)."""
    return jnp.argmax(y, axis=-1).astype(jnp.int32)
