"""Best-first (heap) prefix search with bounded backtracking.

Equivalent of the reference's experimental ``search_backtrack.prefix_search``
(poreover/decoding/search_backtrack.py:28-106): unlike the greedy descent of
``prefix_search_log`` (ops/prefix.py), candidate prefixes live on a global
priority heap, so the search can back up to an earlier shorter prefix; the
``max_backtrack`` parameter prunes heap entries more than that many
characters shorter than the longest prefix explored (the reference filter at
search_backtrack.py:69-70).

The exploration order is data-dependent and inherently sequential, so the
heap lives on the host; the per-extension forward columns — the actual
compute — run as one jitted kernel evaluating all A extensions at once
(same recursions as ops/prefix.py, reference prefix_search.py:67-96).
"""
from __future__ import annotations

from functools import partial
from heapq import heappop, heappush

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0, logsumexp

_NEG_INF = LOG_0


@partial(jax.jit, static_argnames=("A",))
def _extend_all(y: jax.Array, alpha_prev: jax.Array, level: jax.Array,
                A: int = 4):
    """All A one-character extensions of a prefix with forward vector
    ``alpha_prev``. Returns (alpha [T, A], prefix_prob [A], label_prob [A]).
    """
    dtype = y.dtype
    gap_col = y[:, -1]
    first = level == 1
    seed = jnp.where(first, 0.0, _NEG_INF).astype(dtype)
    shifted = jnp.concatenate([seed[None], alpha_prev[:-1]])
    alpha_ast = shifted[:, None] + y[:, :A]

    fw0 = jnp.where(first, y[0, :A], jnp.full((A,), _NEG_INF, dtype))

    def step(fw, inp):
        y_t, prev_tm1, g = inp
        fw_new = jnp.logaddexp(g + fw, y_t + prev_tm1)
        return fw_new, fw_new

    _, alpha_rest = jax.lax.scan(
        step, fw0, (y[1:, :A], alpha_prev[:-1], gap_col[1:])
    )
    alpha = jnp.concatenate([fw0[None], alpha_rest])
    return alpha, logsumexp(alpha_ast, axis=0), alpha[-1]


def prefix_search_backtrack(y, alphabet: str = "ACGT",
                            max_backtrack: int = 0,
                            max_iters: int | None = None):
    """Heap-driven prefix search (reference search_backtrack.py:28).

    Returns (label, log P(label)). ``max_backtrack`` bounds how far back up
    the heap may reach; 0 reproduces the reference default.
    """
    y = np.asarray(y)
    A = len(alphabet)
    T = len(y)
    yd = jnp.asarray(y)

    alpha_prev = np.cumsum(y[:, -1])  # level-0 forward: cumulative gap mass
    gap_prob = float(alpha_prev[-1])
    label_prob = {"": gap_prob}
    top_label = ""
    curr_label = ""
    longest_prefix = 0
    heap: list = []  # entries: (-prefix_prob, prefix, alpha column)
    iters = 0

    while True:
        iters += 1
        level = len(curr_label) + 1
        # prune according to max_backtrack (search_backtrack.py:69-70)
        heap = [e for e in heap
                if len(e[1]) > longest_prefix - max_backtrack]
        if heap:
            heap.sort()  # re-establish heap order after the filter

        alpha, pref_p, lab_p = _extend_all(
            yd, jnp.asarray(alpha_prev), jnp.asarray(level), A=A)
        alpha = np.asarray(alpha)
        pref_p = np.asarray(pref_p)
        lab_p = np.asarray(lab_p)
        for c_i, c in enumerate(alphabet):
            prefix = curr_label + c
            # store the forward column with the heap entry, as the
            # reference does (search_backtrack.py:85)
            heappush(heap, (-float(pref_p[c_i]), prefix, alpha[:, c_i]))
            label_prob[prefix] = float(lab_p[c_i])
            if label_prob[prefix] > label_prob[top_label]:
                top_label = prefix

        neg_best, best_prefix, best_alpha = heappop(heap)
        if -neg_best < label_prob[top_label]:
            break
        if max_iters is not None and iters >= max_iters:
            break
        curr_label = best_prefix
        alpha_prev = best_alpha
        longest_prefix = max(longest_prefix, len(curr_label))

    return top_label, label_prob[top_label]
