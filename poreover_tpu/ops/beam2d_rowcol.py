"""row_col (symmetric) 2D beam search — pair-decode's default traversal.

Equivalent of beam_search_2d_by_row_col (reference BeamSearch.h:262-397):
a diagonal walk over (u, v) guided by the envelope and its transpose.
Each *main* step sweeps every candidate's read-0 state over the envelope
column segment [u, col_end) and read-1 state over the row segment
[v, row_end), resets both maxima, expands children, and prunes on
max0 + max1 (node_greater_max_sym, Beam.h:30-38). When the diagonal
position trails the envelope (v < row_start or u < col_start), *catch-up*
steps advance a single column of the lagging read for the pruned beam only,
without expansion or pruning (BeamSearch.h:311-337).

Built on the layered closed-form sweep engine from beam2d.py; candidates
carry windowed sweeps for BOTH reads plus frozen parent-sweep copies.

The traversal runs as a ``lax.scan`` over at most U+V steps; each step
dynamically selects main / catch-up(read0) / catch-up(read1) / no-op via
``lax.switch``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0
from .beam import _MODEL_IDS, _child_keys, _dedup_mask, _init_candidates, _lookup
from .beam2d import (
    _layered_axis_sweep,
    _lookup_idx,
    _root_ext,
    _shift_window,
)

_NEG_INF = LOG_0


def transpose_envelope(env: np.ndarray, U: int, V: int) -> np.ndarray:
    """Column ranges of the envelope (BeamSearch.h:269-284): env_t[v] =
    [first u covering v, first_u + count); [-1,-1) when uncovered."""
    env_t = np.full((V, 2), -1, dtype=np.int64)
    for u in range(U):
        s, e = int(env[u, 0]), int(env[u, 1])
        s = max(0, s)
        e = min(V, e)
        if e <= s:
            continue
        seg = env_t[s:e]
        fresh = seg[:, 0] < 0
        seg[fresh, 0] = u
        seg[fresh, 1] = u + 1
        seg[~fresh, 1] += 1
        env_t[s:e] = seg
    return env_t


def _catchup_column(model_id, A, Wb, t_col, cand, axis: int, y_pad, cum_pad, pad,
                    W: int):
    """Single-column catch-up update of the pruned beam on one read axis."""
    sweep_key = f"sweep{axis}"
    psweep_key = f"psweep{axis}"
    poff_key = f"poff{axis}"
    off_key = f"off{axis}"

    C = cand["k1"].shape[0]
    dtype = cand[sweep_key].dtype

    # same pruning decision as the next main step (scores unchanged)
    keep = _dedup_mask(cand["k1"], cand["k2"], cand["valid"])
    scores = jnp.where(keep, cand["score"], _NEG_INF)
    _, beam_src = jax.lax.top_k(scores, W)
    # select EVERY slot holding a beam node's key (duplicate slots carry the
    # same node; later first-match lookups must see the updated column)
    bk1 = cand["k1"][beam_src]
    bk2 = cand["k2"][beam_src]
    bvalid = keep[beam_src]
    key_match = (
        (cand["k1"][:, None] == bk1[None, :])
        & (cand["k2"][:, None] == bk2[None, :])
        & bvalid[None, :]
    )
    sel = cand["valid"] & jnp.any(key_match, axis=1)

    prev_off = cand[off_key]
    # window values at t_col-1 for self and (stored) parent
    self_ext = _shift_window(cand[sweep_key], prev_off, t_col, Wb, extra=1)
    self_prev = self_ext[:, :, 0]

    parent_idx = _lookup_idx(cand["pk1"], cand["pk2"], cand["k1"], cand["k2"],
                             cand["valid"])
    is_root_parent = (cand["pk1"] == 0) & (cand["pk2"] == 0)
    parent_stored = jnp.where(
        (parent_idx >= 0)[:, None, None],
        cand[sweep_key][jnp.maximum(parent_idx, 0)],
        jnp.stack([cand[psweep_key][:, 0], cand[psweep_key][:, 1]], axis=1),
    )
    parent_off = jnp.where(parent_idx >= 0,
                           jnp.full_like(cand[poff_key], 1) * prev_off,
                           cand[poff_key])
    parent_ext = jax.vmap(
        lambda vv, po: _shift_window(vv, po, t_col, Wb, extra=1)
    )(parent_stored, parent_off)
    parent_prev = parent_ext[:, :, 0]

    root_vec = _root_ext(model_id, t_col, Wb, cum_pad, pad=pad, dtype=dtype)
    parent_prev = jnp.where(
        is_root_parent[:, None], root_vec[None, :, 0], parent_prev
    )

    from .beam import _node_update

    y_t = jax.lax.dynamic_slice(y_pad, (t_col + pad, 0), (1, y_pad.shape[1]))[0]
    nchar_safe = jnp.maximum(cand["char"], 0)
    root_start = is_root_parent & (t_col == 0)
    new_col = _node_update(model_id, self_prev, parent_prev, nchar_safe,
                           cand["pchar"], y_t, A, root_start=root_start)

    # keep windows in place when the column fits; shift minimally otherwise
    # (shifting always would destroy stored values beyond the column)
    new_off = jnp.where(t_col >= prev_off + Wb, t_col - Wb + 1, prev_off)
    shifted = _shift_window(cand[sweep_key], prev_off, new_off, Wb, extra=0)
    wpos = t_col - new_off
    in_window = (wpos >= 0) & (wpos < Wb)
    wpos_safe = jnp.clip(wpos, 0, Wb - 1)
    col_vals = shifted[:, :, wpos_safe]
    shifted = shifted.at[:, :, wpos_safe].set(
        jnp.where(sel[:, None] & in_window, new_col, col_vals)
    )
    out = dict(cand)
    out[sweep_key] = shifted
    out[off_key] = jnp.full_like(prev_off, 1) * new_off
    return out


def _main_step(model_id, W, A, Wb0, Wb1, cand, u, v, col_e, row_e, consts):
    """One main row_col iteration (BeamSearch.h:341-383)."""
    (y1_pad, y2_pad, cum1_pad, cum2_pad, pad) = consts
    C = W * (A + 1)

    keep = _dedup_mask(cand["k1"], cand["k2"], cand["valid"])
    scores = jnp.where(keep, cand["score"], _NEG_INF)
    _, beam_src = jax.lax.top_k(scores, W)
    g = lambda name: cand[name][beam_src]
    bk1, bk2, bpk1, bpk2 = g("k1"), g("k2"), g("pk1"), g("pk2")
    bchar, bpchar = g("char"), g("pchar")
    bvalid = keep[beam_src]

    cs = jnp.arange(A, dtype=jnp.int32)
    cchar = jnp.broadcast_to(cs[None, :], (W, A)).reshape(-1)
    cp1 = jnp.repeat(bk1, A)
    cp2 = jnp.repeat(bk2, A)
    ck1, ck2 = _child_keys(cp1, cp2, cchar)
    cpchar = jnp.repeat(bchar, A)
    cvalid = jnp.repeat(bvalid, A)

    nk1 = jnp.concatenate([bk1, ck1])
    nk2 = jnp.concatenate([bk2, ck2])
    npk1 = jnp.concatenate([bpk1, cp1])
    npk2 = jnp.concatenate([bpk2, cp2])
    nchar = jnp.concatenate([bchar, cchar])
    npchar = jnp.concatenate([bpchar, cpchar])
    nvalid = jnp.concatenate([bvalid, cvalid])

    def gather_axis(axis, Wb):
        sweep = cand[f"sweep{axis}"]
        bsweep = sweep[beam_src]
        child_idx = _lookup_idx(ck1, ck2, cand["k1"], cand["k2"], cand["valid"])
        child_stale = jnp.where(
            (child_idx >= 0)[:, None, None],
            sweep[jnp.maximum(child_idx, 0)],
            _NEG_INF,
        )
        stale = jnp.concatenate([bsweep, child_stale])
        psweep = jnp.concatenate(
            [cand[f"psweep{axis}"][beam_src], jnp.repeat(bsweep, A, axis=0)]
        )
        poff = jnp.concatenate(
            [cand[f"poff{axis}"][beam_src],
             jnp.full((W * A,), 1, cand[f"poff{axis}"].dtype) * cand[f"off{axis}"]]
        )
        return stale, psweep, poff

    stale0, psweep0, poff0 = gather_axis(0, Wb0)
    stale1, psweep1, poff1 = gather_axis(1, Wb1)

    new_sweep0, new_psweep0, new_poff0, max0 = _layered_axis_sweep(
        model_id, A, Wb0, u, col_e,
        nk1, nk2, npk1, npk2, nchar, npchar, nvalid,
        stale0, cand["off0"], psweep0, poff0, y1_pad, cum1_pad, pad,
    )
    new_sweep1, new_psweep1, new_poff1, max1 = _layered_axis_sweep(
        model_id, A, Wb1, v, row_e,
        nk1, nk2, npk1, npk2, nchar, npchar, nvalid,
        stale1, cand["off1"], psweep1, poff1, y2_pad, cum2_pad, pad,
    )

    nscore = jnp.where(nvalid, max0 + max1, _NEG_INF)
    new_cand = dict(
        k1=nk1, k2=nk2, pk1=npk1, pk2=npk2, char=nchar, pchar=npchar,
        valid=nvalid, score=nscore,
        sweep0=new_sweep0, psweep0=new_psweep0, poff0=new_poff0, off0=u,
        sweep1=new_sweep1, psweep1=new_psweep1, poff1=new_poff1, off1=v,
    )
    return new_cand, beam_src


@partial(jax.jit, static_argnames=("model_id", "W", "A", "Wb0", "Wb1", "n_steps"))
def _rowcol_scan(y1, y2, env, env_t, model_id: int, W: int, A: int,
                 Wb0: int, Wb1: int, n_steps: int):
    U = y1.shape[0]
    V = y2.shape[0]
    C = W * (A + 1)
    dtype = y1.dtype
    pad = max(Wb0, Wb1) + 2

    def padmat(y):
        return jnp.concatenate(
            [jnp.full((pad, y.shape[1]), _NEG_INF, dtype), y,
             jnp.full((pad, y.shape[1]), _NEG_INF, dtype)]
        )

    y1_pad = padmat(y1)
    y2_pad = padmat(y2)
    cum1_pad = jnp.concatenate([jnp.zeros((pad,), dtype), jnp.cumsum(y1[:, -1]),
                                jnp.full((pad,), _NEG_INF, dtype)])
    cum2_pad = jnp.concatenate([jnp.zeros((pad,), dtype), jnp.cumsum(y2[:, -1]),
                                jnp.full((pad,), _NEG_INF, dtype)])
    consts = (y1_pad, y2_pad, cum1_pad, cum2_pad, pad)

    init0 = _init_candidates(model_id, y1[0], W, A, dtype)
    init1 = _init_candidates(model_id, y2[0], W, A, dtype)
    sweep0 = jnp.full((C, 2, Wb0), _NEG_INF, dtype)
    sweep0 = sweep0.at[:, :, 0].set(init0["state"])
    sweep1 = jnp.full((C, 2, Wb1), _NEG_INF, dtype)
    sweep1 = sweep1.at[:, :, 0].set(init1["state"])
    itype = env.dtype
    izero = jnp.asarray(0, itype)
    cand0 = dict(
        k1=init0["k1"], k2=init0["k2"], pk1=init0["pk1"], pk2=init0["pk2"],
        char=init0["char"], pchar=init0["pchar"], valid=init0["valid"],
        score=jnp.where(init0["valid"], 0.0, _NEG_INF).astype(dtype),
        sweep0=sweep0, psweep0=jnp.full((C, 2, Wb0), _NEG_INF, dtype),
        poff0=jnp.zeros((C,), itype), off0=izero,
        sweep1=sweep1, psweep1=jnp.full((C, 2, Wb1), _NEG_INF, dtype),
        poff1=jnp.zeros((C,), itype), off1=izero,
    )

    def step(carry, _):
        u, v, done, prev_rs, prev_re, prev_cs, prev_ce, cand = carry
        u_ok = u <= U - 1
        v_ok = v <= V - 1
        active = ~done & u_ok & v_ok

        row_s = env[jnp.clip(u, 0, U - 1), 0]
        row_e = env[jnp.clip(u, 0, U - 1), 1]
        col_s = env_t[jnp.clip(v, 0, V - 1), 0]
        col_e = env_t[jnp.clip(v, 0, V - 1), 1]

        in_row = (v >= row_s) & (v < row_e)
        catch1 = v < row_s
        in_col = (col_s >= 0) & (u >= col_s) & (u < col_e)
        catch0 = (col_s >= 0) & (u < col_s) & ~catch1

        do_main = active & ~catch1 & ~catch0
        do_catch1 = active & catch1
        do_catch0 = active & catch0

        # bounds persist across iterations when a check falls through (the
        # C++ leaves them unassigned — de-facto stale reuse, see module doc)
        rs_eff = jnp.where(in_row, v, prev_rs)
        re_eff = jnp.where(in_row, row_e, prev_re)
        cs_eff = jnp.where(in_col, u, prev_cs)
        ce_eff = jnp.where(in_col, col_e, prev_ce)

        def main_branch(cand):
            new_cand, beam_src = _main_step(
                model_id, W, A, Wb0, Wb1, cand, cs_eff, rs_eff, ce_eff, re_eff,
                consts
            )
            return new_cand, beam_src

        def catch0_branch(cand):
            out = _catchup_column(model_id, A, Wb0, u, cand, 0, y1_pad,
                                  cum1_pad, pad, W)
            return out, jnp.zeros((W,), jnp.int32)

        def catch1_branch(cand):
            out = _catchup_column(model_id, A, Wb1, v, cand, 1, y2_pad,
                                  cum2_pad, pad, W)
            return out, jnp.zeros((W,), jnp.int32)

        def noop_branch(cand):
            return cand, jnp.zeros((W,), jnp.int32)

        branch = jnp.where(do_main, 0,
                           jnp.where(do_catch1, 1, jnp.where(do_catch0, 2, 3)))
        new_cand, beam_src = jax.lax.switch(
            branch, [main_branch, catch1_branch, catch0_branch, noop_branch],
            cand,
        )

        u_next = jnp.where(do_main | do_catch0, u + 1, u)
        v_next = jnp.where(do_main | do_catch1, v + 1, v)
        done_next = done | ~u_ok | ~v_ok
        # bound updates: row bounds stick on any non-catch1 step; col bounds
        # only on main steps that were in-envelope
        keep_row = active & ~catch1 & in_row
        nrs = jnp.where(keep_row, v, prev_rs)
        nre = jnp.where(keep_row, row_e, prev_re)
        keep_col = do_main & in_col
        ncs = jnp.where(keep_col, u, prev_cs)
        nce = jnp.where(keep_col, col_e, prev_ce)
        # a no-op (done) step must not modify the candidate table
        out_cand = jax.tree.map(
            lambda new, old: jnp.where(
                jnp.reshape(active, (1,) * new.ndim), new, old
            ),
            new_cand,
            cand,
        )
        is_main = do_main
        return (
            (u_next, v_next, done_next, nrs, nre, ncs, nce, out_cand),
            (beam_src, is_main),
        )

    carry0 = (izero, izero, jnp.asarray(False), izero, izero, izero, izero, cand0)
    (*_, final), (beam_srcs, is_main) = jax.lax.scan(
        step, carry0, None, length=n_steps
    )

    keep = _dedup_mask(final["k1"], final["k2"], final["valid"])
    scores = jnp.where(keep, final["score"], _NEG_INF)
    top_idx = jnp.argmax(scores)

    def back(j, inp):
        src, adv = inp
        is_child = j >= W
        c = jnp.where(is_child & adv, (j - W) % A, -1)
        b = jnp.where(is_child, (j - W) // A, j)
        j_prev = jnp.where(adv, src[b].astype(j.dtype), j)
        return j_prev, c

    j0, chars = jax.lax.scan(back, top_idx, (beam_srcs, is_main), reverse=True)
    first_char = jnp.where(j0 >= W, (j0 - W) % A, -1)
    return first_char, chars


def beam_search_2d_row_col(y1, y2, envelope, beam_width, alphabet, model) -> str:
    y1 = np.asarray(y1)
    y2 = np.asarray(y2)
    U, V = len(y1), len(y2)
    A = len(alphabet)
    model_id = _MODEL_IDS[model]
    if envelope is None:
        envelope = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
    env = np.asarray(envelope, dtype=np.int64)[:U]
    env_t = transpose_envelope(env, U, V)

    # window widths: main sweeps start at the diagonal position inside the
    # segment, so the segment length bounds the width
    Wb1 = max(int(np.max(env[:, 1] - env[:, 0])), 1)
    cov = env_t[env_t[:, 0] >= 0]
    Wb0 = max(int(np.max(cov[:, 1] - cov[:, 0])) if len(cov) else 1, 1)
    n_steps = U + V

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    first_char, chars = _rowcol_scan(
        jnp.asarray(y1, dtype), jnp.asarray(y2, dtype),
        jnp.asarray(env), jnp.asarray(env_t),
        model_id, beam_width, A, Wb0, Wb1, n_steps,
    )
    out = [int(first_char)] + [int(c) for c in np.asarray(chars)]
    return "".join(alphabet[c] for c in out if c >= 0)
