"""1D prefix search, fully on-device.

Equivalent of the reference's prefix_search_log[_cy]
(poreover/decoding/prefix_search.py:115-238) whose hot primitive is the
single-column CTC forward vector (decoding_cy.pyx:125-156). The reference
drives the search loop from Python, one Cython call per candidate extension;
here the entire search — all four extensions per level, the best-prefix /
top-label bookkeeping, and the stop rule — runs inside one jitted
``lax.while_loop``, so a whole window costs one device dispatch.

Recursions (prefix_search.py:67-96):
  alpha      (label forward)  fw[t] = lse(y[t,gap]+fw[t-1], y[t,c]+prev[t-1])
  alpha_ast  (no-gap forward) = shift(prev) + y[:,c]   (LOG_1 seed at level 1)
Stop rule (prefix_search.py:162): best extension's prefix probability drops
below the best complete label's probability.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0, logsumexp

_NEG_INF = LOG_0


@partial(jax.jit, static_argnames=("A",))
def _prefix_search(y: jax.Array, A: int = 4):
    """Run prefix search over a [T, A+1] window. Returns
    (top_chars [T] int32, top_len, top_prob)."""
    T = y.shape[0]
    dtype = y.dtype
    gap_col = y[:, -1]

    # level-0 forward vector: cumulative gap mass (prefix_search.py:81-96, i==0)
    alpha0 = jnp.cumsum(gap_col)
    gap_prob = alpha0[-1]

    def extensions(alpha_prev, level):
        """alpha [T, A] and alpha_ast [T, A] for all A extensions at once."""
        first = level == 1
        # no-gap forward: shifted previous + emission (prefix_search.py:67-79)
        seed = jnp.where(first, 0.0, _NEG_INF).astype(dtype)
        shifted = jnp.concatenate([seed[None], alpha_prev[:-1]])
        alpha_ast = shifted[:, None] + y[:, :A]

        # label forward via scan over t for all A chars together
        fw0 = jnp.where(first, y[0, :A], jnp.full((A,), _NEG_INF, dtype))

        def step(fw, inp):
            y_t, prev_tm1, g = inp
            fw_new = jnp.logaddexp(g + fw, y_t + prev_tm1)
            return fw_new, fw_new

        _, alpha_rest = jax.lax.scan(
            step, fw0, (y[1:, :A], alpha_prev[:-1], gap_col[1:])
        )
        alpha = jnp.concatenate([fw0[None], alpha_rest])  # [T, A]
        return alpha, alpha_ast

    def cond(state):
        return ~state["stop"]

    def body(state):
        level = state["curr_len"] + 1
        alpha, alpha_ast = extensions(state["alpha_prev"], level)
        prefix_prob = logsumexp(alpha_ast, axis=0)  # [A]
        label_prob = alpha[-1]  # [A]

        best_c = jnp.argmax(prefix_prob)
        best_prefix_prob = prefix_prob[best_c]

        new_label_best = jnp.max(label_prob)
        new_label_c = jnp.argmax(label_prob)
        improves = new_label_best > state["top_prob"]
        top_prob = jnp.where(improves, new_label_best, state["top_prob"])
        # the improving label is curr + new_label_c
        top_chars = jnp.where(
            improves,
            state["curr_chars"].at[state["curr_len"]].set(new_label_c.astype(jnp.int32)),
            state["top_chars"],
        )
        top_len = jnp.where(improves, level, state["top_len"])

        stop = (best_prefix_prob < top_prob) | (level >= T)

        curr_chars = state["curr_chars"].at[state["curr_len"]].set(
            best_c.astype(jnp.int32)
        )
        return dict(
            alpha_prev=jnp.where(stop, state["alpha_prev"], alpha[:, best_c]),
            curr_chars=jnp.where(stop, state["curr_chars"], curr_chars),
            curr_len=jnp.where(stop, state["curr_len"], state["curr_len"] + 1),
            top_chars=top_chars,
            top_len=top_len,
            top_prob=top_prob,
            stop=stop,
        )

    init = dict(
        alpha_prev=alpha0,
        curr_chars=jnp.zeros((T,), jnp.int32),
        curr_len=jnp.asarray(0, jnp.int32),
        top_chars=jnp.zeros((T,), jnp.int32),
        top_len=jnp.asarray(0, jnp.int32),
        top_prob=gap_prob,
        stop=jnp.asarray(False),
    )
    out = jax.lax.while_loop(cond, body, init)
    return out["top_chars"], out["top_len"], out["top_prob"]


def prefix_search_log(y, alphabet: str = "ACGT"):
    """Prefix-search decode one window; returns (label, log_prob)."""
    y = np.asarray(y)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    chars, length, prob = _prefix_search(jnp.asarray(y, dtype), A=len(alphabet))
    chars = np.asarray(chars)[: int(length)]
    return "".join(alphabet[c] for c in chars), float(prob)
