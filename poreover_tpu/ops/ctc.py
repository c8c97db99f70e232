"""CTC loss matching tf.compat.v1.nn.ctc_loss semantics.

The reference trains with tf.compat.v1.nn.ctc_loss(inputs=logits, blank
index = num_classes-1 (LAST), preprocess_collapse_repeated=False,
ctc_merge_repeated=<flag, default False>) — reference network.py:97-102 and
__main__.py:27.

- ``merge_repeated=False`` (the reference default): paths map to labels by
  deleting blanks ONLY (repeats preserved) — exactly the "poreover" CTC
  variant. The loss is -log alpha(L, T-1) of the plain forward trellis.
- ``merge_repeated=True``: standard (Graves) CTC with the repeat rule.

Both are dense [B, T, L] trellises advanced by one ``lax.scan`` over time —
VPU-friendly, autodiff gives the backward pass.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.logspace import LOG_0

# finite stand-in for log(0) inside the differentiated trellis: true -inf
# poisons gradients with NaNs (same trick as optax.ctc_loss's log_epsilon)
_NEG_INF = -1e5


def _log_softmax(logits):
    m = jnp.max(logits, axis=-1, keepdims=True)
    s = logits - m
    return s - jnp.log(jnp.sum(jnp.exp(s), axis=-1, keepdims=True))


@partial(jax.jit, static_argnames=("merge_repeated",))
def ctc_loss(logits, labels, label_lengths, logit_lengths=None,
             merge_repeated: bool = False):
    """Batched CTC negative log-likelihood.

    logits        [B, T, A+1] raw scores, blank LAST
    labels        [B, L] int32, padded with any value past label_lengths
    label_lengths [B]
    logit_lengths [B] or None (= full T)
    """
    B, T, _ = logits.shape
    L = labels.shape[1]
    logp = _log_softmax(logits)
    dtype = logp.dtype

    if logit_lengths is None:
        logit_lengths = jnp.full((B,), T, jnp.int32)

    emit = jnp.take_along_axis(
        logp, jnp.broadcast_to(labels[:, None, :], (B, T, L)), axis=2
    )  # [B, T, L] emission of label s at time t
    gap = logp[:, :, -1]  # [B, T]

    s_idx = jnp.arange(L + 1)
    valid_s = s_idx[None, :] <= label_lengths[:, None]  # [B, L+1]

    if not merge_repeated:
        # plain forward: alpha(s,t) = lse(alpha(s-1,t-1)+y[c_s], alpha(s,t-1)+gap)
        alpha0 = jnp.full((B, L + 1), _NEG_INF, dtype).at[:, 0].set(0.0)

        def step(carry, inp):
            alpha, t = carry
            e_t, g_t = inp  # [B, L], [B]
            stay = alpha + g_t[:, None]
            emit_t = alpha[:, :-1] + e_t
            new = jnp.concatenate(
                [stay[:, :1], jnp.logaddexp(emit_t, stay[:, 1:])], axis=1
            )
            new = jnp.where((t < logit_lengths)[:, None], new, alpha)
            return (new, t + 1), None

        (alpha, _), _ = jax.lax.scan(
            step,
            (alpha0, jnp.zeros((), jnp.int32)),
            (jnp.swapaxes(emit, 0, 1), jnp.swapaxes(gap, 0, 1)),
        )
        ll = jnp.take_along_axis(alpha, label_lengths[:, None], axis=1)[:, 0]
        return -ll

    # standard CTC: extended label with interleaved blanks, 2L+1 states
    S = 2 * L + 1
    # ext emission table: even positions blank, odd positions label chars
    def ext_emit(e_t, g_t):
        out = jnp.full((B, S), _NEG_INF, dtype)
        out = out.at[:, 0::2].set(g_t[:, None])
        out = out.at[:, 1::2].set(e_t)
        return out

    same_as_prev = jnp.concatenate(
        [jnp.zeros((B, 1), bool), labels[:, 1:] == labels[:, :-1]], axis=1
    )  # [B, L] label s equals label s-1

    alpha0 = jnp.full((B, S), _NEG_INF, dtype)

    def step2(carry, inp):
        alpha, t = carry
        e_t, g_t = inp
        em = ext_emit(e_t, g_t)
        shift1 = jnp.concatenate(
            [jnp.full((B, 1), _NEG_INF, dtype), alpha[:, :-1]], axis=1
        )
        shift2 = jnp.concatenate(
            [jnp.full((B, 2), _NEG_INF, dtype), alpha[:, :-2]], axis=1
        )
        # skip transition allowed into odd (label) positions whose char
        # differs from the previous label char
        skip_ok = jnp.zeros((B, S), bool).at[:, 1::2].set(~same_as_prev)
        prev = jnp.logaddexp(alpha, shift1)
        prev = jnp.logaddexp(prev, jnp.where(skip_ok, shift2, _NEG_INF))
        new = prev + em
        is_t0 = t == 0
        init = jnp.full((B, S), _NEG_INF, dtype)
        init = init.at[:, 0].set(em[:, 0])
        init = init.at[:, 1].set(em[:, 1])
        new = jnp.where(is_t0, init, new)
        new = jnp.where((t < logit_lengths)[:, None], new, alpha)
        return (new, t + 1), None

    (alpha, _), _ = jax.lax.scan(
        step2,
        (alpha0, jnp.zeros((), jnp.int32)),
        (jnp.swapaxes(emit, 0, 1), jnp.swapaxes(gap, 0, 1)),
    )
    last_blank = jnp.take_along_axis(alpha, (2 * label_lengths)[:, None], axis=1)[:, 0]
    last_char = jnp.take_along_axis(
        alpha, jnp.maximum(2 * label_lengths - 1, 0)[:, None], axis=1
    )[:, 0]
    last_char = jnp.where(label_lengths > 0, last_char, _NEG_INF)
    ll = jnp.logaddexp(last_blank, last_char)
    return -ll
