"""Label forward probability: log P(label | y) per model kind.

TPU-native equivalent of the reference's prefix-tree forward scorer
(poreover/decoding/PrefixTree.h:710-759, dispatched as ``cpp_forward`` in
decoding_cpp.pyx:49-67). Instead of a trie with per-node hashmaps, each model
kind is a dense forward trellis alpha[s] over prefix depths, advanced by a
``lax.scan`` over time — the whole [L+1] state vector updates in one VPU op
per step.

Recursions per kind (matching PrefixTree.h update rules):
- ctc (PoreOver, PrefixTree.h:478-489):
    alpha(s,t) = logaddexp(alpha(s-1,t-1) + y[t,c_s], alpha(s,t-1) + y[t,gap])
    alpha(0,t) = cumulative blank mass.
- ctc_merge_repeats (Bonito, PrefixTree.h:649-663): gap/no-gap split with a
  repeat-dependent emit source; the root contributes only at t==0 (the
  reference's root hashmap holds just t=-1 so restarts after t=0 get -inf).
- ctc_flipflop (PrefixTree.h:548-574): flip/flop split; repeated labels can
  only emit via the opposite phase of the parent.

Labels are padded to a static length for jit; the true length selects the
output entry.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0

_NEG_INF = LOG_0


def _shift_down(x, fill=_NEG_INF):
    """[s] -> value at [s-1], with fill at s=0."""
    return jnp.concatenate([jnp.full((1,), fill, x.dtype), x[:-1]])


@jax.jit
def forward_ctc(y: jax.Array, label: jax.Array, length: jax.Array) -> jax.Array:
    """Plain-CTC label log-probability (no repeat merging).

    y: [T, A+1] log-probs, blank last. label: [Lmax] int32 (padded).
    """
    Lp1 = label.shape[0] + 1
    emit_y = y[:, label]  # [T, Lmax] emission prob of char s at each t
    gap_y = y[:, -1]

    alpha0 = jnp.full((Lp1,), _NEG_INF, y.dtype).at[0].set(0.0)

    def step(alpha, ys):
        e, g = ys  # e: [Lmax], g: scalar
        stay = alpha + g
        emit = alpha[:-1] + e
        new = jnp.concatenate([stay[:1], jnp.logaddexp(emit, stay[1:])])
        return new, None

    alpha, _ = jax.lax.scan(step, alpha0, (emit_y, gap_y))
    return alpha[length]


@jax.jit
def forward_bonito(y: jax.Array, label: jax.Array, length: jax.Array) -> jax.Array:
    """CTC-with-merged-repeats label log-probability."""
    Lmax = label.shape[0]
    emit_y = y[:, label]
    gap_y = y[:, -1]
    # same[s] for depth s>=1 (index s-1 here): label[s-1]==label[s-2]
    same = jnp.concatenate(
        [jnp.zeros((1,), bool), label[1:] == label[:-1]]
    )  # [Lmax]

    gap0 = jnp.full((Lmax + 1,), _NEG_INF, y.dtype).at[0].set(0.0)
    nogap0 = jnp.full((Lmax + 1,), _NEG_INF, y.dtype)

    def step(carry, ys):
        gap_p, nogap_p = carry
        e, g = ys
        total_p = jnp.logaddexp(gap_p, nogap_p)
        gap_new = total_p + g
        src = jnp.where(same, gap_p[:-1], total_p[:-1])
        nogap_new = jnp.logaddexp(src + e, nogap_p[1:] + e)
        # the root (depth 0) is never updated in the reference; after the
        # first step its t-1 entry no longer exists -> -inf
        gap_new = gap_new.at[0].set(_NEG_INF)
        nogap_new = jnp.concatenate([jnp.full((1,), _NEG_INF, y.dtype), nogap_new])
        return (gap_new, nogap_new), None

    (gap, nogap), _ = jax.lax.scan(step, (gap0, nogap0), (emit_y, gap_y))
    return jnp.logaddexp(gap, nogap)[length]


@jax.jit
def forward_flipflop(y: jax.Array, label: jax.Array, length: jax.Array) -> jax.Array:
    """Flip-flop label log-probability. y: [T, 2A] with flop states at A..2A-1."""
    Lmax = label.shape[0]
    A = y.shape[1] // 2
    flip_y = y[:, label]  # [T, Lmax]
    flop_y = y[:, label + A]
    same = jnp.concatenate([jnp.zeros((1,), bool), label[1:] == label[:-1]])

    # t == 0 handled outside the scan: only depth 1 is reachable, and the
    # reference's root special case (PrefixTree.h:554-556) lets it start in
    # EITHER phase: flip = y[0,c], flop = y[0,c+A]. The root contributes
    # nothing afterwards (its hashmap holds only t=-1).
    neg = jnp.full((1,), _NEG_INF, y.dtype)
    rest = jnp.full((Lmax - 1,), _NEG_INF, y.dtype)
    flip0 = jnp.concatenate([neg, flip_y[0, :1], rest])
    flop0 = jnp.concatenate([neg, flop_y[0, :1], rest])

    def step(carry, ys):
        flip_p, flop_p = carry
        fe, fo = ys
        emit_flip = (
            jnp.where(same, flop_p[:-1], jnp.logaddexp(flip_p[:-1], flop_p[:-1])) + fe
        )
        emit_flop = jnp.where(same, flip_p[:-1] + fo, _NEG_INF)
        flip_new = jnp.logaddexp(emit_flip, flip_p[1:] + fe)
        flop_new = jnp.logaddexp(emit_flop, flop_p[1:] + fo)
        pad = jnp.full((1,), _NEG_INF, y.dtype)
        return (
            jnp.concatenate([pad, flip_new]),
            jnp.concatenate([pad, flop_new]),
        ), None

    (flip, flop), _ = jax.lax.scan(step, (flip0, flop0), (flip_y[1:], flop_y[1:]))
    return jnp.logaddexp(flip, flop)[length]


_ALPHABET = "ACGT"


def label_to_ints(label: str, alphabet: str = _ALPHABET) -> np.ndarray:
    lut = {c: i for i, c in enumerate(alphabet)}
    return np.array([lut[c] for c in label], dtype=np.int32)


def forward(y, label: str, alphabet: str = _ALPHABET, model: str = "ctc") -> float:
    """Log-probability that ``y`` emits exactly ``label`` under ``model``.

    Drop-in equivalent of the reference's cpp_forward (decoding_cpp.pyx:49).
    """
    y = jnp.asarray(np.asarray(y, dtype=np.float64))
    ints = jnp.asarray(label_to_ints(label, alphabet))
    length = jnp.asarray(len(label), jnp.int32)
    fn = {
        "ctc": forward_ctc,
        "ctc_merge_repeats": forward_bonito,
        "ctc_flipflop": forward_flipflop,
    }[model]
    return float(fn(y, ints, length))
