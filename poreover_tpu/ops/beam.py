"""Vectorized 1D CTC beam search (TPU-native).

Re-architecture of the reference's trie-based beam search
(poreover/decoding/BeamSearch.h:18-58 with per-model node updates in
PrefixTree.h:478/548/649 and pruning in Beam.h:93-108). The pointer trie +
per-node hashmaps are inherently scalar; here the beam lives in fixed-shape
arrays advanced by a single ``lax.scan`` over time:

- A *candidate table* of C = W*(A+1) slots holds every node updated at the
  previous step: W surviving beam nodes ("stay" slots) + W*A children.
- Prefix identity = two independent 32-bit rolling hashes; the per-step
  dedup (same node reached as both stay-update and child-expansion) and the
  hash-join lookups (parent prob at t-1, prior child prob at t-1) are masked
  equality matrices over the tiny candidate table — pure VPU work.
- Prune = masked top-k over candidate scores.
- The decoded label is reconstructed afterwards from per-step provenance
  (which candidate each beam slot came from), via a reversed scan.

All three reference model kinds run through one parameterized update rule
with a 2-component node state:
  ctc                : (prob, -inf)                  PrefixTree.h:478-489
  ctc_merge_repeats  : (gap, no_gap)                 PrefixTree.h:649-663
  ctc_flipflop       : (flip, flop)                  PrefixTree.h:548-574
Node score for pruning/top is logaddexp(state0, state1) in every kind.

Batching: vmap over reads (padded time with a validity mask makes padded
steps an exact no-op on the carry).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0

_NEG_INF = LOG_0

_M1 = np.uint32(2654435761)  # Knuth multiplicative hash constants
_M2 = np.uint32(40503)
_MODEL_IDS = {"ctc": 0, "ctc_merge_repeats": 1, "ctc_flipflop": 2}


def _child_keys(k1, k2, c):
    """Rolling prefix hash extension by character c (c in [0, A))."""
    cc = (c + 1).astype(jnp.uint32)
    return k1 * _M1 + cc, k2 * _M2 + cc


def _score(state):
    return jnp.logaddexp(state[..., 0], state[..., 1])


def _node_update(model_id: int, state_prev, parent_prev, c, parent_c, y_t, A: int,
                 root_start=False):
    """One node's state update at time t.

    state_prev  [..., 2] : this node's state at t-1 (-inf,-inf if absent)
    parent_prev [..., 2] : parent node's state at t-1
    c, parent_c [...]    : last characters of node and parent
    y_t         [S]      : log-prob row at time t
    root_start  [...]    : parent is the root AND t == 0 — the reference's
        special case (PrefixTree.h:554-556/606-608) which, for flipflop,
        additionally allows a FLOP start: emit_flop = y[0][c+A].
    """
    y_c = y_t[c]
    s0, s1 = state_prev[..., 0], state_prev[..., 1]
    p0, p1 = parent_prev[..., 0], parent_prev[..., 1]
    parent_total = jnp.logaddexp(p0, p1)
    same = c == parent_c

    if model_id == 0:  # ctc: state = (prob, -inf)
    # emit from parent + stay on gap (PrefixTree.h:478-489)
        gap_y = y_t[-1]
        new0 = jnp.logaddexp(parent_total + y_c, s0 + gap_y)
        new1 = jnp.full_like(new0, _NEG_INF)
    elif model_id == 1:  # bonito: state = (gap, no_gap)
        gap_y = y_t[-1]
        new0 = jnp.logaddexp(s0, s1) + gap_y
        src = jnp.where(same, p0, parent_total)
        new1 = jnp.logaddexp(src + y_c, s1 + y_c)
    else:  # flipflop: state = (flip, flop); flop emissions at c+A
        y_cf = y_t[c + A]
        emit_flip = jnp.where(same, p1, parent_total) + y_c
        emit_flop = jnp.where(same, p0 + y_cf, _NEG_INF)
        emit_flop = jnp.where(root_start, y_cf, emit_flop)
        new0 = jnp.logaddexp(emit_flip, s0 + y_c)
        new1 = jnp.logaddexp(emit_flop, s1 + y_cf)
    return jnp.stack([new0, new1], axis=-1)


def _init_candidates(model_id: int, y0, W: int, A: int, dtype):
    """Candidate table after the reference's first iteration (t=0):
    the A root children, placed in the child slots of beam row 0."""
    C = W * (A + 1)
    state = jnp.full((C, 2), _NEG_INF, dtype)
    k1 = jnp.zeros((C,), jnp.uint32)
    k2 = jnp.zeros((C,), jnp.uint32)
    pk1 = jnp.zeros((C,), jnp.uint32)
    pk2 = jnp.zeros((C,), jnp.uint32)
    char = jnp.full((C,), -1, jnp.int32)
    pchar = jnp.full((C,), -1, jnp.int32)
    valid = jnp.zeros((C,), bool)

    cs = jnp.arange(A, dtype=jnp.int32)
    ck1, ck2 = _child_keys(jnp.zeros((A,), jnp.uint32), jnp.zeros((A,), jnp.uint32), cs)
    idx = W + cs  # children of beam slot 0
    if model_id == 0:  # (y0[c], -inf)
        st = jnp.stack([y0[cs], jnp.full((A,), _NEG_INF, dtype)], axis=-1)
    elif model_id == 1:  # (gap=-inf, no_gap=y0[c])
        st = jnp.stack([jnp.full((A,), _NEG_INF, dtype), y0[cs]], axis=-1)
    else:  # (flip=y0[c], flop=y0[c+A])
        st = jnp.stack([y0[cs], y0[cs + A]], axis=-1)

    state = state.at[idx].set(st)
    k1 = k1.at[idx].set(ck1)
    k2 = k2.at[idx].set(ck2)
    char = char.at[idx].set(cs)
    # parent is the root: keys stay 0, pchar stays -1 (never equals a char)
    valid = valid.at[idx].set(True)
    return dict(
        state=state, k1=k1, k2=k2, pk1=pk1, pk2=pk2, char=char, pchar=pchar,
        valid=valid,
    )


def _dedup_mask(k1, k2, valid):
    """True for the first valid occurrence of each key; duplicates False."""
    C = k1.shape[0]
    eq = (k1[:, None] == k1[None, :]) & (k2[:, None] == k2[None, :])
    eq = eq & valid[:, None] & valid[None, :]
    earlier = jnp.tril(jnp.ones((C, C), bool), k=-1)
    dup = jnp.any(eq & earlier, axis=1)
    return valid & ~dup


def _lookup(qk1, qk2, tk1, tk2, tvalid, tstate):
    """Hash-join: for each query key, the state of the matching table row
    (-inf,-inf when absent). Tables are tiny so an equality matrix is fine."""
    eq = (qk1[:, None] == tk1[None, :]) & (qk2[:, None] == tk2[None, :])
    eq = eq & tvalid[None, :]
    # at most one real match; masked max recovers it
    masked = jnp.where(eq[..., None], tstate[None, :, :], _NEG_INF)
    return jnp.max(masked, axis=1)


@partial(jax.jit, static_argnames=("model_id", "W", "A"))
def _beam_search_scan(y, t_valid, root_gap_cum, model_id: int, W: int, A: int):
    """Run the full beam search; returns provenance for traceback.

    y            [T, S] log-probs (S = A+1 or 2A)
    t_valid      [T] bool, False for padded steps (exact no-ops)
    root_gap_cum [T] cumulative blank mass (ctc root prob; zeros otherwise)
    """
    dtype = y.dtype
    C = W * (A + 1)
    cand0 = _init_candidates(model_id, y[0], W, A, dtype)

    def step(cand, inp):
        y_t, valid_t, root_prev = inp

        # ---- dedup + prune to beam of W (Beam.h:93-108) ----
        keep = _dedup_mask(cand["k1"], cand["k2"], cand["valid"])
        scores = jnp.where(keep, _score(cand["state"]), _NEG_INF)
        _, beam_src = jax.lax.top_k(scores, W)  # [W] candidate indices
        bstate = cand["state"][beam_src]
        bk1 = cand["k1"][beam_src]
        bk2 = cand["k2"][beam_src]
        bpk1 = cand["pk1"][beam_src]
        bpk2 = cand["pk2"][beam_src]
        bchar = cand["char"][beam_src]
        bpchar = cand["pchar"][beam_src]
        bvalid = keep[beam_src]

        # ---- stay-update each beam node (BeamSearch.h:36-39) ----
        # lookup table = all candidates updated at t-1 (duplicate keys carry
        # identical state, so matching any of them is equivalent)
        parent_prev = _lookup(bpk1, bpk2, cand["k1"], cand["k2"],
                              cand["valid"], cand["state"])
        if model_id == 0:
            # a depth-1 node's parent is the root, whose prob at t-1 is the
            # cumulative blank mass (PrefixTree.h:467-476)
            is_root_parent = (bpk1 == 0) & (bpk2 == 0) & bvalid
            root_state = jnp.stack(
                [jnp.full((W,), root_prev, dtype), jnp.full((W,), _NEG_INF, dtype)],
                axis=-1,
            )
            parent_prev = jnp.where(is_root_parent[:, None], root_state, parent_prev)
        bchar_safe = jnp.maximum(bchar, 0)
        new_bstate = _node_update(
            model_id, bstate, parent_prev, bchar_safe, bpchar, y_t, A
        )
        new_bstate = jnp.where(bvalid[:, None], new_bstate, _NEG_INF)

        # ---- expand children (BeamSearch.h:41-47) ----
        cs = jnp.arange(A, dtype=jnp.int32)
        cchar = jnp.broadcast_to(cs[None, :], (W, A)).reshape(-1)
        cp1 = jnp.repeat(bk1, A)
        cp2 = jnp.repeat(bk2, A)
        ck1, ck2 = _child_keys(cp1, cp2, cchar)
        cpchar = jnp.repeat(bchar, A)
        child_prev = _lookup(ck1, ck2, cand["k1"], cand["k2"],
                             cand["valid"], cand["state"])
        parent_for_child = jnp.repeat(bstate, A, axis=0)  # parent's t-1 state
        new_cstate = _node_update(
            model_id, child_prev, parent_for_child, cchar, cpchar, y_t, A
        )
        cvalid = jnp.repeat(bvalid, A)
        new_cstate = jnp.where(cvalid[:, None], new_cstate, _NEG_INF)

        new_cand = dict(
            state=jnp.concatenate([new_bstate, new_cstate]),
            k1=jnp.concatenate([bk1, ck1]),
            k2=jnp.concatenate([bk2, ck2]),
            pk1=jnp.concatenate([bpk1, cp1]),
            pk2=jnp.concatenate([bpk2, cp2]),
            char=jnp.concatenate([bchar, cchar]),
            pchar=jnp.concatenate([bpchar, cpchar]),
            valid=jnp.concatenate([bvalid, cvalid]),
        )
        # padded steps leave the candidate table untouched
        out_cand = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(valid_t, (1,) * new.ndim), new, old
            ),
            new_cand,
            cand,
        )
        return out_cand, (beam_src, valid_t)

    root_prev_seq = jnp.concatenate([jnp.zeros((1,), dtype), root_gap_cum[:-1]])
    final, (beam_srcs, advanced) = jax.lax.scan(
        step, cand0, (y[1:], t_valid[1:], root_prev_seq[1:])
    )

    # ---- final top-1 (BeamSearch.h:56-57) ----
    keep = _dedup_mask(final["k1"], final["k2"], final["valid"])
    scores = jnp.where(keep, _score(final["state"]), _NEG_INF)
    top_idx = jnp.argmax(scores)

    # ---- traceback through provenance, newest step first ----
    def back(j, inp):
        src, adv = inp
        is_child = j >= W
        c = jnp.where(is_child, (j - W) % A, -1)
        b = jnp.where(is_child, (j - W) // A, j)
        j_prev = jnp.where(adv, src[b], j)
        c = jnp.where(adv, c, -1)
        return j_prev, c

    j0, chars_rev = jax.lax.scan(back, top_idx, (beam_srcs, advanced), reverse=True)
    # j0 indexes the init table: a root child at W + c
    first_char = jnp.where(j0 >= W, (j0 - W) % A, -1)
    return first_char, chars_rev


_beam_search_scan_batch = jax.jit(
    jax.vmap(_beam_search_scan, in_axes=(0, 0, 0, None, None, None)),
    static_argnums=(3, 4, 5),
)


def _pad_bucket(T: int, granule: int = 512) -> int:
    """Round a read length up to a padded bucket so few kernel shapes serve
    many reads (one compile per bucket)."""
    return max(granule, ((T + granule - 1) // granule) * granule)


def beam_search_batch(
    ys,
    beam_width: int = 25,
    alphabet: str = "ACGT",
    model: str = "ctc",
) -> list[str]:
    """Beam-search decode a batch of reads in one vmapped kernel launch.

    The TPU replacement for the reference's per-read multiprocessing.Pool
    fan-out (poreover/decoding/decode.py:158-162): reads are padded to a
    shared length bucket (padded steps are exact no-ops on the scan carry)
    and decoded as ONE [B, T, S] launch per bucket. Returns sequences in
    input order; identical output to per-read `beam_search`.
    """
    model_id = _MODEL_IDS[model]
    A = len(alphabet)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    if len(ys) == 0:
        return []
    Tpad = _pad_bucket(max(int(np.asarray(y).shape[0]) for y in ys))
    S = int(np.asarray(ys[0]).shape[1])
    B = len(ys)
    yb = np.zeros((B, Tpad, S), np.float64)
    tv = np.zeros((B, Tpad), bool)
    for i, y in enumerate(ys):
        y = np.asarray(y)
        yb[i, : len(y)] = y
        tv[i, : len(y)] = True
    yj = jnp.asarray(yb, dtype)
    tvj = jnp.asarray(tv)
    if model_id == 0:
        # cumulative blank mass; padded tail frozen at the last real value
        # is irrelevant because those steps are masked no-ops
        root_cum = jnp.cumsum(jnp.where(tvj, yj[:, :, -1], 0.0), axis=1)
    else:
        root_cum = jnp.zeros((B, Tpad), dtype)
    first_char, chars_rev = _beam_search_scan_batch(
        yj, tvj, root_cum, model_id, beam_width, A
    )
    first_char = np.asarray(first_char)
    chars_rev = np.asarray(chars_rev)
    out = []
    for i in range(B):
        chars = [int(first_char[i])] + [int(c) for c in chars_rev[i]]
        out.append("".join(alphabet[c] for c in chars if c >= 0))
    return out


def beam_search(
    y,
    beam_width: int = 25,
    alphabet: str = "ACGT",
    model: str = "ctc",
) -> str:
    """Beam-search decode one read. Equivalent of cpp_beam_search
    (decoding_cpp.pyx:88-105)."""
    y = np.asarray(y)
    model_id = _MODEL_IDS[model]
    A = len(alphabet)
    T = y.shape[0]
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    yj = jnp.asarray(y, dtype)
    t_valid = jnp.ones((T,), bool)
    if model_id == 0:
        root_cum = jnp.cumsum(yj[:, -1])
    else:
        root_cum = jnp.zeros((T,), dtype)
    first_char, chars_rev = _beam_search_scan(
        yj, t_valid, root_cum, model_id, beam_width, A
    )
    chars = [int(first_char)] + [int(c) for c in np.asarray(chars_rev)]
    return "".join(alphabet[c] for c in chars if c >= 0)
