"""Log-space arithmetic with -inf identity semantics.

Matches the conventions of the reference's log math (reference:
poreover/decoding/Log.h:17-23 -- logaddexp(-inf, x) == x) while staying
jit-safe: everything here works on both numpy and jax arrays.

The reference's Cython kernels use LOG_0 = -9999 instead of -inf
(poreover/decoding/decoding_cy.pyx:18); we standardize on -inf, which JAX
handles correctly in max/where-based logaddexp.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

LOG_0 = -np.inf
LOG_1 = 0.0


def logaddexp(a, b):
    """Numerically-stable log(exp(a) + exp(b)) with -inf identities.

    jnp.logaddexp already satisfies logaddexp(-inf, x) == x and
    logaddexp(-inf, -inf) == -inf without NaNs.
    """
    return jnp.logaddexp(a, b)


def logsumexp(x, axis=None, keepdims=False):
    """log(sum(exp(x))) that tolerates all--inf slices (returns -inf)."""
    m = jnp.max(x, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.exp(x - m_safe), axis=axis, keepdims=True)
    out = jnp.where(jnp.isfinite(m), jnp.log(s) + m_safe, m)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis) if axis is not None else jnp.squeeze(out)
    return out
