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


@jax.jit
def argmax_path(y: jax.Array) -> jax.Array:
    """Per-step argmax path (Viterbi for unconstrained CTC models)."""
    return jnp.argmax(y, axis=-1).astype(jnp.int32)


@jax.jit
def argmax_path_batch(y: jax.Array) -> jax.Array:
    """[B, T, S] -> [B, T] per-step argmax paths (padded reads decode as a batch)."""
    return jnp.argmax(y, axis=-1).astype(jnp.int32)
