"""Plan-driven row_col 2D beam search (fast path).

Same semantics as ops/beam2d_rowcol.py (which emulates the reference's
BeamSearch.h:262-397 walk step by step on device), but the (u, v) walk is
**precomputed on the host** — it depends only on the envelope — and lowered
to a compact step plan:

  - ``main`` steps (prune + expand + two windowed sweeps), and
  - merged catch-up *runs*: a maximal run of consecutive single-column
    catch-ups on one axis becomes ONE windowed sweep restricted to the
    current beam (no expansion, no prune, scores untouched).

This cuts the device-side sequential step count ~2.6x on real reads and
removes all control-flow divergence from the scan. Sweeps are *chunked*
(CHUNK columns at a time, dynamic trip count) so per-step vector work
scales with the actual envelope width (p50 ~13 columns) instead of the
worst-case row (~1400 columns after envelope degeneracies).

Storage: each candidate keeps a windowed history of its per-axis sweep
values ([C, 2, Wst]); computed windows merge into storage with
minimal-shift anchoring, preserving older columns the reference would still
have in its hashmaps.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0
from .beam import _MODEL_IDS, _child_keys, _dedup_mask, _init_candidates
from .beam2d import _lookup_idx, _shift_window
from .beam2d_rowcol import transpose_envelope

_NEG_INF = LOG_0

CHUNK = 128

MAIN, C0RUN, C1RUN = 0, 1, 2


def build_plan(env: np.ndarray, U: int, V: int):
    """Plan for an envelope: C++ fast path (native/plan_walk.cpp, ~2 ms)
    with the pure-Python walk as fallback (~0.7 s on real reads)."""
    from .. import native

    plan = native.plan_walk_native(np.asarray(env, dtype=np.int64)[:U], U, V)
    if plan is not None:
        return plan
    env = np.asarray(env, dtype=np.int64)[:U]
    return plan_walk(env, transpose_envelope(env, U, V), U, V)


def plan_walk(env: np.ndarray, env_t: np.ndarray, U: int, V: int):
    """Simulate the reference walk on host; emit the merged step plan.

    Returns dict of int32 numpy arrays (length N): type, a_lo, a_hi
    (axis-0 sweep bounds), b_lo, b_hi (axis-1 bounds). For runs only the
    run axis bounds are meaningful.
    """
    steps = []
    u = v = 0
    prs = pre = pcs = pce = 0
    run_type = None
    run_start = 0
    run_len = 0

    def flush_run():
        nonlocal run_type, run_len
        if run_type == "c0":
            steps.append((C0RUN, run_start, run_start + run_len, 0, 0))
        elif run_type == "c1":
            steps.append((C1RUN, 0, 0, run_start, run_start + run_len))
        run_type = None
        run_len = 0

    while u <= U - 1 and v <= V - 1:
        rs, re = env[u]
        cs, ce = env_t[v]
        in_row = rs <= v < re
        if v < rs:
            if run_type != "c1":
                flush_run()
                run_type, run_start = "c1", v
            run_len += 1
            v += 1
            continue
        rs_e, re_e = (v, re) if in_row else (prs, pre)
        in_col = cs >= 0 and cs <= u < ce
        if cs >= 0 and u < cs:
            if run_type != "c0":
                flush_run()
                run_type, run_start = "c0", u
            prs, pre = rs_e, re_e
            run_len += 1
            u += 1
            continue
        flush_run()
        cs_e, ce_e = (u, ce) if in_col else (pcs, pce)
        steps.append((MAIN, cs_e, ce_e, rs_e, re_e))
        prs, pre, pcs, pce = rs_e, re_e, cs_e, ce_e
        u += 1
        v += 1
    flush_run()

    arr = np.asarray(steps, dtype=np.int32)
    return dict(
        type=arr[:, 0], a_lo=arr[:, 1], a_hi=arr[:, 2],
        b_lo=arr[:, 3], b_hi=arr[:, 4],
    )


# --------------------------------------------------------------------------
# chunked layered sweep
# --------------------------------------------------------------------------

def _chunked_sweep(model_id, A, lo, hi, y_pad, cum_pad, pad,
                   nk1, nk2, npk1, npk2, nchar, npchar, sweep_mask,
                   storage, st_off, psweep, poff, Wst: int,
                   n_layers: int | None = None):
    """Sweep candidates' states across window [lo, hi) in CHUNK-column
    pieces, updating ``storage`` in place (merged, min-shift anchored).

    sweep_mask [C]: which candidates are swept (main: all valid; catch-run:
    the selected beam only). Unswept candidates keep storage (re-anchored).
    Returns (new_storage, new_st_off, window_max [C]).
    """
    C = nk1.shape[0]
    dtype = storage.dtype
    width = hi - lo

    # storage anchor: keep if the window fits, else minimal right shift;
    # must cover the seed column lo-1 AND the full window [lo, hi)
    # (caller guarantees Wst >= max window width + 1)
    new_st_off = jnp.where(hi > st_off + Wst, hi - Wst, st_off)
    new_st_off = jnp.minimum(new_st_off, lo - 1)
    new_st_off = jnp.where(hi > new_st_off + Wst, hi - Wst, new_st_off)
    storage = _shift_window(storage, st_off, new_st_off, Wst, extra=0)

    same = nchar == npchar
    is_root_parent = (npk1 == 0) & (npk2 == 0)
    parent_slot = _lookup_idx(npk1, npk2, nk1, nk2, sweep_mask)
    parent_slot = jnp.where(is_root_parent, -1, parent_slot)
    parent_swept = parent_slot >= 0
    pslot = jnp.maximum(parent_slot, 0)

    # frozen parent values, re-windowed per chunk on demand below
    # (psweep window: [poff, poff+Wst))

    n_chunks = (width + CHUNK - 1) // CHUNK

    def chunk_body(k, carry):
        storage, seeds = carry
        # seeds [C, 2]: own value at chunk start - 1
        c_lo = lo + k * CHUNK
        w_idx = jnp.arange(CHUNK)
        t_abs = c_lo + w_idx
        in_rng = (t_abs < hi)
        in_range = in_rng[None, :] & sweep_mask[:, None]

        zero = (c_lo * 0).astype(c_lo.dtype)
        y_w = jax.lax.dynamic_slice(
            y_pad, (c_lo + pad, zero), (CHUNK, y_pad.shape[1])
        )
        gap_w = jnp.where(in_rng, y_w[:, -1], 0.0)
        nchar_safe = jnp.maximum(nchar, 0)
        c_emit = y_w.T[nchar_safe]
        c_emit2 = y_w.T[nchar_safe + A] if model_id == 2 else jnp.zeros_like(c_emit)

        # external parent values at t-1 over the chunk: root or frozen copy
        if model_id == 0:
            root_vals = jax.lax.dynamic_slice(cum_pad, (c_lo - 1 + pad,), (CHUNK,))
            root_ext = jnp.stack(
                [root_vals, jnp.full((CHUNK,), _NEG_INF, dtype)]
            )  # [2, CHUNK]
        else:
            at_m1 = (t_abs - 1) == -1
            if model_id == 1:
                root_ext = jnp.stack([
                    jnp.where(at_m1, 0.0, _NEG_INF).astype(dtype),
                    jnp.full((CHUNK,), _NEG_INF, dtype),
                ])
            else:
                lh = jnp.asarray(np.log(0.5), dtype)
                r0 = jnp.where(at_m1, lh, _NEG_INF).astype(dtype)
                root_ext = jnp.stack([r0, r0])
        # frozen parent values at t-1 for the chunk; dynamic_slice clamps, so
        # mask positions outside the frozen window [poff, poff+Wst) to -inf
        def fro_slice(vv, po):
            padded = jnp.concatenate([
                jnp.full(vv.shape[:-1] + (CHUNK + 2,), _NEG_INF, dtype),
                vv,
                jnp.full(vv.shape[:-1] + (CHUNK + 2,), _NEG_INF, dtype),
            ], axis=-1)
            # padded length = Wst + 2*(CHUNK+2); max valid slice start keeps
            # the CHUNK-wide slice in bounds
            start = jnp.clip(c_lo - 1 - po + CHUNK + 2, 0, Wst + CHUNK + 4)
            return jax.lax.dynamic_slice_in_dim(padded, start, CHUNK, axis=-1)

        pfro = jax.vmap(fro_slice)(psweep, poff)  # [C, 2, CHUNK]
        tm1 = t_abs - 1
        fro_ok = (tm1[None, :] >= poff[:, None]) & (
            tm1[None, :] < poff[:, None] + Wst
        )
        pfro = jnp.where(fro_ok[:, None, :], pfro, _NEG_INF)
        parent_ext_ext = jnp.where(
            is_root_parent[:, None, None], root_ext[None], pfro
        )

        root_start_w = is_root_parent[:, None] & (t_abs == 0)[None, :]

        def layer_cond(st):
            done, _, _ = st
            return ~jnp.all(done | ~sweep_mask)

        def layer_body(st):
            done, cur, cur_last = st
            # cur [C, 2, CHUNK] current chunk values; cur_last [C,2] value at
            # chunk start - 1 (seed) per candidate
            pd = jnp.where(parent_swept, done[pslot], True)
            ready = ~done & pd & sweep_mask
            # parent values at t-1 across chunk: shift parent's cur by 1 with
            # its seed in front
            par_cur = cur[pslot]
            par_seed = seeds[pslot]
            par_shift = jnp.concatenate(
                [par_seed[:, :, None], par_cur[:, :, :-1]], axis=2
            )
            par_vals = jnp.where(
                parent_swept[:, None, None], par_shift, parent_ext_ext
            )
            p0 = par_vals[:, 0, :]
            p1 = par_vals[:, 1, :]
            p_tot = jnp.logaddexp(p0, p1)
            from .beam2d import _cumlse_chain

            s_own = seeds  # [C, 2]
            if model_id == 0:
                E = jnp.where(in_range, p_tot + c_emit, _NEG_INF)
                o0 = _cumlse_chain(E, jnp.where(in_rng, gap_w, 0.0)[None, :],
                                   s_own[:, 0])
                o1 = jnp.full_like(o0, _NEG_INF)
            elif model_id == 1:
                src = jnp.where(same[:, None], p0, p_tot)
                ce_ = jnp.where(in_range, c_emit, 0.0)
                ong = _cumlse_chain(jnp.where(in_range, src + ce_, _NEG_INF),
                                    ce_, s_own[:, 1])
                seed_tot = jnp.logaddexp(s_own[:, 0], s_own[:, 1])
                tot = _cumlse_chain(jnp.where(in_range, ong, _NEG_INF),
                                    jnp.where(in_range, gap_w[None, :], 0.0),
                                    seed_tot)
                tot_prev = jnp.concatenate(
                    [seed_tot[:, None], tot[:, :-1]], axis=-1
                )
                o0 = jnp.where(in_range, tot_prev + gap_w[None, :], _NEG_INF)
                o1 = ong
            else:
                ce_ = jnp.where(in_range, c_emit, 0.0)
                cf_ = jnp.where(in_range, c_emit2, 0.0)
                ef = jnp.where(same[:, None], p1, p_tot) + ce_
                eo = jnp.where(same[:, None], p0 + cf_, _NEG_INF)
                eo = jnp.where(root_start_w, cf_, eo)
                o0 = _cumlse_chain(jnp.where(in_range, ef, _NEG_INF), ce_,
                                   s_own[:, 0])
                o1 = _cumlse_chain(jnp.where(in_range, eo, _NEG_INF), cf_,
                                   s_own[:, 1])
            out = jnp.stack([o0, o1], axis=1)
            out = jnp.where(in_range[:, None, :], out, _NEG_INF)
            new_cur = jnp.where(ready[:, None, None], out, cur)
            return done | ready, new_cur, cur_last

        done0 = jnp.zeros((C,), bool)
        cur0 = jnp.full((C, 2, CHUNK), _NEG_INF, dtype)
        if n_layers is not None:
            # static unroll: chain depth is bounded by W+1, and straight-line
            # code avoids per-iteration While overhead on TPU
            st = (done0, cur0, seeds)
            for _ in range(n_layers):
                st = layer_body(st)
            done_f, cur_f, _ = st
        else:
            done_f, cur_f, _ = jax.lax.while_loop(
                layer_cond, layer_body, (done0, cur0, seeds)
            )

        # merge chunk into storage (only swept candidates, in-range columns)
        pos = c_lo - new_st_off  # chunk start within storage
        stor_pad = jnp.concatenate([
            storage,
            jnp.full((C, 2, CHUNK + 2), _NEG_INF, dtype),
        ], axis=-1)
        old_vals = jax.lax.dynamic_slice_in_dim(stor_pad, pos, CHUNK, axis=-1)
        merged = jnp.where(
            in_rng[None, None, :] & sweep_mask[:, None, None], cur_f, old_vals
        )
        stor_pad = jax.lax.dynamic_update_slice_in_dim(
            stor_pad, merged, pos, axis=-1
        )
        storage = stor_pad[:, :, :Wst]

        # next chunk seeds: value at (chunk end - 1); if hi falls inside this
        # chunk the loop ends anyway, so the plain last column is correct
        last_col = cur_f[:, :, -1]
        new_seeds = jnp.where(sweep_mask[:, None], last_col, seeds)
        return storage, new_seeds

    # initial seeds: own value at lo-1 from (re-anchored) storage
    seed_pos = lo - 1 - new_st_off  # in [-1, Wst-1] by anchor construction
    stor_pad0 = jnp.concatenate([
        jnp.full((C, 2, 1), _NEG_INF, dtype), storage
    ], axis=-1)
    seeds0 = jax.lax.dynamic_slice_in_dim(
        stor_pad0, jnp.clip(seed_pos + 1, 0, Wst), 1, axis=-1
    )[:, :, 0]

    storage, _ = jax.lax.fori_loop(
        0, n_chunks, chunk_body, (storage, seeds0)
    )

    # window max for scoring: max over [lo, hi) columns of storage
    w_idx = jnp.arange(Wst)
    t_abs = new_st_off + w_idx
    in_win = (t_abs >= lo) & (t_abs < hi)
    tot = jnp.logaddexp(storage[:, 0, :], storage[:, 1, :])
    window_max = jnp.max(
        jnp.where(in_win[None, :] & sweep_mask[:, None], tot, _NEG_INF), axis=1
    )
    return storage, new_st_off, window_max


# --------------------------------------------------------------------------
# plan-driven scan
# --------------------------------------------------------------------------

def _expand_skeleton(cand, W, A):
    """Prune + expand: returns (beam_src, new key/char/valid arrays)."""
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
    fields = dict(
        k1=jnp.concatenate([bk1, ck1]),
        k2=jnp.concatenate([bk2, ck2]),
        pk1=jnp.concatenate([bpk1, cp1]),
        pk2=jnp.concatenate([bpk2, cp2]),
        char=jnp.concatenate([bchar, cchar]),
        pchar=jnp.concatenate([bpchar, jnp.repeat(bchar, A)]),
        valid=jnp.concatenate([bvalid, jnp.repeat(bvalid, A)]),
    )
    return beam_src, fields


def _gather_axis_storage(cand, axis, beam_src, fields, W, A):
    """Stale storage rows + frozen parent copies for the new candidate set."""
    sweep = cand[f"sweep{axis}"]
    bsweep = sweep[beam_src]
    ck1 = fields["k1"][W:]
    ck2 = fields["k2"][W:]
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


def _refresh_psweep(fields_or_cand, storage, st_off, psweep, poff):
    """Frozen parent copies := parent's current storage where the parent is
    present in the table (last-known-values semantics)."""
    idx = _lookup_idx(
        fields_or_cand["pk1"], fields_or_cand["pk2"],
        fields_or_cand["k1"], fields_or_cand["k2"], fields_or_cand["valid"],
    )
    present = idx >= 0
    new_psweep = jnp.where(
        present[:, None, None], storage[jnp.maximum(idx, 0)], psweep
    )
    new_poff = jnp.where(present, jnp.full_like(poff, 1) * st_off, poff)
    return new_psweep, new_poff


@partial(jax.jit, static_argnames=("model_id", "W", "A", "Wst0", "Wst1",
                                   "return_state", "G", "grace",
                                   "return_prov"))
def _planned_scan(y1, y2, plan_type, a_lo, a_hi, b_lo, b_hi,
                  model_id: int, W: int, A: int, Wst0: int, Wst1: int,
                  return_state: bool = False, G: int = 0, grace: int = 1,
                  return_prov: bool = False, cand_in=None):
    """G > 0 enables the eviction *graveyard* (reference-exact mode): a
    node that falls out of the candidate table keeps its live memo for up
    to ``grace - 1`` further prunes, and a re-discovered child resumes it
    instead of restarting from -inf — the semantics of the reference's
    unbounded per-node hashmaps (PrefixTree.h:74-148) up to the measured
    graveyard depth (docs/EXACTNESS.md: grace=18 reproduces the trie on
    the bundled pairs; capacity overflow evicts the oldest first).
    Differentially pinned against native.pair_beam_row_col_cpu_emul_grace.
    """
    C = W * (A + 1)
    dtype = y1.dtype
    pad = CHUNK + 2
    NL = None  # adaptive while-loop layering measures faster than static unroll

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

    init0 = _init_candidates(model_id, y1[0], W, A, dtype)
    init1 = _init_candidates(model_id, y2[0], W, A, dtype)
    itype = plan_type.dtype
    sweep0 = jnp.full((C, 2, Wst0), _NEG_INF, dtype).at[:, :, 0].set(init0["state"])
    sweep1 = jnp.full((C, 2, Wst1), _NEG_INF, dtype).at[:, :, 0].set(init1["state"])
    cand0 = dict(
        k1=init0["k1"], k2=init0["k2"], pk1=init0["pk1"], pk2=init0["pk2"],
        char=init0["char"], pchar=init0["pchar"], valid=init0["valid"],
        score=jnp.where(init0["valid"], 0.0, _NEG_INF).astype(dtype),
        sweep0=sweep0, psweep0=jnp.full((C, 2, Wst0), _NEG_INF, dtype),
        poff0=jnp.zeros((C,), itype), off0=jnp.asarray(0, itype),
        sweep1=sweep1, psweep1=jnp.full((C, 2, Wst1), _NEG_INF, dtype),
        poff1=jnp.zeros((C,), itype), off1=jnp.asarray(0, itype),
    )
    if G > 0:
        cand0.update(
            gk1=jnp.zeros((G,), jnp.uint32),
            gk2=jnp.zeros((G,), jnp.uint32),
            gage=jnp.zeros((G,), jnp.int32),
            gvalid=jnp.zeros((G,), bool),
            gsweep0=jnp.full((G, 2, Wst0), _NEG_INF, dtype),
            gsweep1=jnp.full((G, 2, Wst1), _NEG_INF, dtype),
        )

    def _gy_pad(fields_arr, fill=0):
        """Pad per-candidate field arrays with G inert graveyard rows for
        the shared-storage sweep (their sweep_mask rows are False)."""
        pad_row = jnp.full((G,) + fields_arr.shape[1:], fill,
                           fields_arr.dtype)
        return jnp.concatenate([fields_arr, pad_row])

    def _gy_select(cand, fields):
        """Graveyard maintenance at a MAIN step: pool = old-table rows that
        fell out of the NEW table (absent=1) + old graveyard rows aged one
        more prune; keep up to G youngest (eviction at age >= grace, and a
        full graveyard evicts oldest first). Returns gathered rows."""
        old_first = _dedup_mask(cand["k1"], cand["k2"], cand["valid"])

        def in_new(k1, k2):
            return _lookup_idx(
                k1, k2, fields["k1"], fields["k2"], fields["valid"]) >= 0

        cand_elig = old_first & ~in_new(cand["k1"], cand["k2"])
        gy_age = cand["gage"] + 1
        gy_elig = (cand["gvalid"] & ~in_new(cand["gk1"], cand["gk2"])
                   & (gy_age < grace))
        if grace <= 1:
            cand_elig = cand_elig & False
        pk1 = jnp.concatenate([cand["k1"], cand["gk1"]])
        pk2 = jnp.concatenate([cand["k2"], cand["gk2"]])
        page = jnp.concatenate(
            [jnp.ones((C,), jnp.int32), gy_age])
        pelig = jnp.concatenate([cand_elig, gy_elig])
        skey = jnp.where(pelig, page, jnp.int32(1 << 30))
        sel = jnp.argsort(skey)[:G]
        sel_ok = skey[sel] < (1 << 30)
        pool0 = jnp.concatenate([cand["sweep0"], cand["gsweep0"]])
        pool1 = jnp.concatenate([cand["sweep1"], cand["gsweep1"]])
        return dict(
            gk1=jnp.where(sel_ok, pk1[sel], 0),
            gk2=jnp.where(sel_ok, pk2[sel], 0),
            gage=jnp.where(sel_ok, page[sel], 0),
            gvalid=sel_ok,
            gsweep0=jnp.where(sel_ok[:, None, None], pool0[sel], _NEG_INF),
            gsweep1=jnp.where(sel_ok[:, None, None], pool1[sel], _NEG_INF),
        )

    def _gather_axis_storage_gy(cand, axis, beam_src, fields):
        """_gather_axis_storage with the graveyard included in the
        re-discovered-child memo lookup (live-memo resume semantics)."""
        sweep = cand[f"sweep{axis}"]
        gsweep = cand[f"gsweep{axis}"]
        pool = jnp.concatenate([sweep, gsweep])
        bsweep = sweep[beam_src]
        ck1 = fields["k1"][W:]
        ck2 = fields["k2"][W:]
        child_idx = _lookup_idx(
            ck1, ck2,
            jnp.concatenate([cand["k1"], cand["gk1"]]),
            jnp.concatenate([cand["k2"], cand["gk2"]]),
            jnp.concatenate([cand["valid"], cand["gvalid"]]))
        child_stale = jnp.where(
            (child_idx >= 0)[:, None, None],
            pool[jnp.maximum(child_idx, 0)],
            _NEG_INF,
        )
        stale = jnp.concatenate([bsweep, child_stale])
        psweep = jnp.concatenate(
            [cand[f"psweep{axis}"][beam_src], jnp.repeat(bsweep, A, axis=0)]
        )
        poff = jnp.concatenate(
            [cand[f"poff{axis}"][beam_src],
             jnp.full((W * A,), 1, cand[f"poff{axis}"].dtype)
             * cand[f"off{axis}"]]
        )
        return stale, psweep, poff

    def main_branch(cand, alo, ahi, blo, bhi):
        beam_src, fields = _expand_skeleton(cand, W, A)
        if G > 0:
            stale0, psweep0, poff0 = _gather_axis_storage_gy(
                cand, 0, beam_src, fields)
            stale1, psweep1, poff1 = _gather_axis_storage_gy(
                cand, 1, beam_src, fields)
            gy = _gy_select(cand, fields)
            stale0 = jnp.concatenate([stale0, gy["gsweep0"]])
            stale1 = jnp.concatenate([stale1, gy["gsweep1"]])
        else:
            stale0, psweep0, poff0 = _gather_axis_storage(
                cand, 0, beam_src, fields, W, A)
            stale1, psweep1, poff1 = _gather_axis_storage(
                cand, 1, beam_src, fields, W, A)

        def fargs(name, fill=0):
            arr = fields[name]
            return _gy_pad(arr, fill) if G > 0 else arr

        sweep_mask = fargs("valid", False)
        st0, off0, max0 = _chunked_sweep(
            model_id, A, alo, ahi, y1_pad, cum1_pad, pad,
            fargs("k1"), fargs("k2"), fargs("pk1"), fargs("pk2"),
            fargs("char"), fargs("pchar"), sweep_mask,
            stale0, cand["off0"],
            _gy_pad(psweep0, _NEG_INF) if G > 0 else psweep0,
            _gy_pad(poff0) if G > 0 else poff0, Wst0, n_layers=NL,
        )
        st1, off1, max1 = _chunked_sweep(
            model_id, A, blo, bhi, y2_pad, cum2_pad, pad,
            fargs("k1"), fargs("k2"), fargs("pk1"), fargs("pk2"),
            fargs("char"), fargs("pchar"), sweep_mask,
            stale1, cand["off1"],
            _gy_pad(psweep1, _NEG_INF) if G > 0 else psweep1,
            _gy_pad(poff1) if G > 0 else poff1, Wst1, n_layers=NL,
        )
        if G > 0:
            gy["gsweep0"] = jnp.where(
                gy["gvalid"][:, None, None], st0[C:], _NEG_INF)
            gy["gsweep1"] = jnp.where(
                gy["gvalid"][:, None, None], st1[C:], _NEG_INF)
            st0, st1 = st0[:C], st1[:C]
            max0, max1 = max0[:C], max1[:C]
        psweep0, poff0 = _refresh_psweep(fields, st0, off0, psweep0, poff0)
        psweep1, poff1 = _refresh_psweep(fields, st1, off1, psweep1, poff1)
        score = jnp.where(fields["valid"], max0 + max1, _NEG_INF)
        new_cand = dict(
            fields,
            score=score,
            sweep0=st0, psweep0=psweep0, poff0=poff0, off0=off0,
            sweep1=st1, psweep1=psweep1, poff1=poff1, off1=off1,
        )
        if G > 0:
            new_cand.update(gy)
        return new_cand, beam_src

    def run_branch(cand, axis, lo, hi):
        keep = _dedup_mask(cand["k1"], cand["k2"], cand["valid"])
        scores = jnp.where(keep, cand["score"], _NEG_INF)
        _, beam_src = jax.lax.top_k(scores, W)
        bk1 = cand["k1"][beam_src]
        bk2 = cand["k2"][beam_src]
        bvalid = keep[beam_src]
        key_match = (
            (cand["k1"][:, None] == bk1[None, :])
            & (cand["k2"][:, None] == bk2[None, :])
            & bvalid[None, :]
        )
        sel = cand["valid"] & jnp.any(key_match, axis=1)

        y_pad, cum_pad = (y1_pad, cum1_pad) if axis == 0 else (y2_pad, cum2_pad)
        Wst = Wst0 if axis == 0 else Wst1

        def carg(name, fill=0):
            arr = cand[name]
            return _gy_pad(arr, fill) if G > 0 else arr

        storage = cand[f"sweep{axis}"]
        if G > 0:
            storage = jnp.concatenate([storage, cand[f"gsweep{axis}"]])
        st, off, _mx = _chunked_sweep(
            model_id, A, lo, hi, y_pad, cum_pad, pad,
            carg("k1"), carg("k2"), carg("pk1"), carg("pk2"),
            carg("char"), carg("pchar"),
            _gy_pad(sel, False) if G > 0 else sel,
            storage, cand[f"off{axis}"],
            (_gy_pad(cand[f"psweep{axis}"], _NEG_INF)
             if G > 0 else cand[f"psweep{axis}"]),
            _gy_pad(cand[f"poff{axis}"]) if G > 0 else cand[f"poff{axis}"],
            Wst, n_layers=NL,
        )
        new_cand = dict(cand)
        if G > 0:
            new_cand[f"gsweep{axis}"] = jnp.where(
                cand["gvalid"][:, None, None], st[C:], _NEG_INF)
            st = st[:C]
        psweep, poff = _refresh_psweep(
            cand, st, off, cand[f"psweep{axis}"], cand[f"poff{axis}"]
        )
        new_cand[f"sweep{axis}"] = st
        new_cand[f"off{axis}"] = off
        new_cand[f"psweep{axis}"] = psweep
        new_cand[f"poff{axis}"] = poff
        return new_cand, jnp.zeros((W,), jnp.int32)

    def step(cand, inp):
        stype, alo, ahi, blo, bhi = inp

        branches = [
            lambda c: main_branch(c, alo, ahi, blo, bhi),
            lambda c: run_branch(c, 0, alo, ahi),
            lambda c: run_branch(c, 1, blo, bhi),
        ]
        new_cand, beam_src = jax.lax.switch(stype, branches, cand)
        return new_cand, (beam_src, stype == MAIN)

    final, (beam_srcs, is_main) = jax.lax.scan(
        step, cand0 if cand_in is None else cand_in,
        (plan_type, a_lo, a_hi, b_lo, b_hi)
    )

    if return_prov:
        # segmented exact mode: the caller chains segments (carrying the
        # candidate state) and runs one traceback over the concatenated
        # provenance — shorter scans keep the per-launch program below
        # whatever resource limit faults the batched full-length exact
        # scan on the axon TPU runtime (VERDICT r4 item 5)
        return final, beam_srcs, is_main
    if return_state:
        return final

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


def debug_state_after(y1, y2, envelope, n_steps=None, beam_width=5,
                      alphabet="ACGT", model="ctc"):
    """Run the planned scan truncated to the first n_steps plan steps and
    return the final candidate table (numpy dict) — differential-test hook."""
    y1 = np.asarray(y1)
    y2 = np.asarray(y2)
    U, V = len(y1), len(y2)
    A = len(alphabet)
    model_id = _MODEL_IDS[model]
    env = np.asarray(envelope, dtype=np.int64)[:U]
    plan = build_plan(env, U, V)
    # Wst config from the full plan; truncation pads back to full length with
    # zero-width catch-runs (score/key no-ops) so one compile serves every n
    w0 = np.where(plan["type"] != C1RUN, plan["a_hi"] - plan["a_lo"], 0)
    w1 = np.where(plan["type"] != C0RUN, plan["b_hi"] - plan["b_lo"], 0)
    Wst0 = int(max(w0.max(), 1)) + 2
    Wst1 = int(max(w1.max(), 1)) + 2
    if n_steps is not None:
        N_full = len(plan["type"])
        plan = {k: v[:n_steps] for k, v in plan.items()}
        npad = N_full - len(plan["type"])
        fills = dict(type=C0RUN, a_lo=0, a_hi=0, b_lo=0, b_hi=0)
        plan = {
            k: np.concatenate([v, np.full(npad, fills[k], v.dtype)])
            for k, v in plan.items()
        }
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    final = _planned_scan(
        jnp.asarray(y1, dtype), jnp.asarray(y2, dtype),
        jnp.asarray(plan["type"]), jnp.asarray(plan["a_lo"]),
        jnp.asarray(plan["a_hi"]), jnp.asarray(plan["b_lo"]),
        jnp.asarray(plan["b_hi"]),
        model_id, beam_width, A, Wst0, Wst1, return_state=True,
    )
    return {k: np.asarray(v) for k, v in final.items()}


@partial(jax.jit, static_argnames=("model_id", "W", "A", "Wst0", "Wst1",
                                   "G", "grace"))
def _planned_scan_batch(y1, y2, plan_type, a_lo, a_hi, b_lo, b_hi,
                        model_id: int, W: int, A: int, Wst0: int, Wst1: int,
                        G: int = 0, grace: int = 1):
    """vmap of _planned_scan over a leading batch axis (reads/s throughput
    path: many pairs per chip, the TPU equivalent of the reference's
    per-pair multiprocessing Pool — reference pair_decode.py:292-297)."""
    return jax.vmap(
        lambda a, b, c, d, e, f, g: _planned_scan(
            a, b, c, d, e, f, g, model_id=model_id, W=W, A=A,
            Wst0=Wst0, Wst1=Wst1, G=G, grace=grace,
        )
    )(y1, y2, plan_type, a_lo, a_hi, b_lo, b_hi)


def beam_search_2d_planned_batch(pairs, beam_width=5, alphabet="ACGT",
                                 model="ctc", exact: bool = False,
                                 mesh=None) -> list[str]:
    """Batched plan-driven row_col pair beam search.

    pairs: list of (y1, y2, envelope). Pads plans (zero-width catch-runs),
    trace lengths, and window-storage widths to shared shapes, then decodes
    every pair in one vmapped scan.

    mesh: optional jax.sharding.Mesh with a "data" axis — the batch dim is
    sharded across its devices (SPMD data parallelism; per-pair math is
    device-local, so outputs are byte-identical to the unsharded run).
    The batch pads to a device-count multiple with a copy of pair 0.
    """
    A = len(alphabet)
    model_id = _MODEL_IDS[model]
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    n_real_pairs = len(pairs)
    if mesh is not None:
        nd = mesh.devices.size
        pad = (-len(pairs)) % nd
        pairs = list(pairs) + [pairs[0]] * pad

    plans = []
    for y1, y2, envelope in pairs:
        y1 = np.asarray(y1)
        y2 = np.asarray(y2)
        U, V = len(y1), len(y2)
        if envelope is None:
            envelope = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
        env = np.asarray(envelope, dtype=np.int64)[:U]
        plans.append(build_plan(env, U, V))

    N_max = max(len(p["type"]) for p in plans)
    T1 = max(len(p[0]) for p in pairs)
    T2 = max(len(p[1]) for p in pairs)
    w0 = max(
        int(np.where(p["type"] != C1RUN, p["a_hi"] - p["a_lo"], 0).max())
        for p in plans
    )
    w1 = max(
        int(np.where(p["type"] != C0RUN, p["b_hi"] - p["b_lo"], 0).max())
        for p in plans
    )
    Wst0 = max(w0, 1) + 2
    Wst1 = max(w1, 1) + 2

    fills = dict(type=C0RUN, a_lo=0, a_hi=0, b_lo=0, b_hi=0)

    def padp(p):
        n = N_max - len(p["type"])
        return {
            k: np.concatenate([v, np.full(n, fills[k], v.dtype)])
            for k, v in p.items()
        }

    def pady(y, T):
        y = np.asarray(y, np.float64)
        return np.pad(y, ((0, T - len(y)), (0, 0)), constant_values=LOG_0)

    plans = [padp(p) for p in plans]
    if mesh is None:
        put = jnp.asarray
    else:
        from jax.sharding import NamedSharding, PartitionSpec

        sh = NamedSharding(mesh, PartitionSpec("data"))

        def put(x, dtype=None):
            return jax.device_put(jnp.asarray(x, dtype), sh)

    y1b = put(np.stack([pady(p[0], T1) for p in pairs]), dtype)
    y2b = put(np.stack([pady(p[1], T2) for p in pairs]), dtype)
    stack = lambda k: put(np.stack([p[k] for p in plans]))

    G, grace = (EXACT_G, EXACT_GRACE) if exact else (0, 1)
    first_char, chars = _planned_scan_batch(
        y1b, y2b, stack("type"), stack("a_lo"), stack("a_hi"),
        stack("b_lo"), stack("b_hi"),
        model_id, beam_width, A, Wst0, Wst1, G=G, grace=grace,
    )
    first_char = np.asarray(first_char)
    chars = np.asarray(chars)
    out = []
    for b in range(n_real_pairs):
        cs = [int(first_char[b])] + [int(c) for c in chars[b]]
        out.append("".join(alphabet[c] for c in cs if c >= 0))
    return out


# reference-exact mode defaults: docs/EXACTNESS.md measured grace=18 /
# ~100 graveyard nodes recovering the unbounded-trie output on the bundled
# pairs; 20/128 adds safety margin
EXACT_GRACE = 20
EXACT_G = 128


def beam_search_2d_planned(y1, y2, envelope, beam_width=5, alphabet="ACGT",
                           model="ctc", exact: bool = False) -> str:
    """Plan-driven row_col pair beam search (fast path).

    ``exact=True`` enables the eviction graveyard (reference unbounded-memo
    semantics up to the measured grace depth) at ~G/C extra state."""
    y1 = np.asarray(y1)
    y2 = np.asarray(y2)
    U, V = len(y1), len(y2)
    A = len(alphabet)
    model_id = _MODEL_IDS[model]
    if envelope is None:
        envelope = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
    env = np.asarray(envelope, dtype=np.int64)[:U]
    plan = build_plan(env, U, V)
    if len(plan["type"]) == 0:
        return ""

    w0 = np.where(plan["type"] != C1RUN, plan["a_hi"] - plan["a_lo"], 0)
    w1 = np.where(plan["type"] != C0RUN, plan["b_hi"] - plan["b_lo"], 0)
    Wst0 = int(max(w0.max(), 1)) + 2
    Wst1 = int(max(w1.max(), 1)) + 2

    G, grace = (EXACT_G, EXACT_GRACE) if exact else (0, 1)
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    first_char, chars = _planned_scan(
        jnp.asarray(y1, dtype), jnp.asarray(y2, dtype),
        jnp.asarray(plan["type"]), jnp.asarray(plan["a_lo"]),
        jnp.asarray(plan["a_hi"]), jnp.asarray(plan["b_lo"]),
        jnp.asarray(plan["b_hi"]),
        model_id, beam_width, A, Wst0, Wst1, G=G, grace=grace,
    )
    out = [int(first_char)] + [int(c) for c in np.asarray(chars)]
    return "".join(alphabet[c] for c in out if c >= 0)

# --------------------------------------------------------------------------
# segmented exact-mode batch: bounded-length scan launches, carried state
# --------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("model_id", "W", "A", "Wst0", "Wst1",
                                   "G", "grace"))
def _planned_scan_batch_seg0(y1, y2, pt, alo, ahi, blo, bhi,
                             model_id, W, A, Wst0, Wst1, G, grace):
    return jax.vmap(
        lambda a, b, c, d, e, f, g: _planned_scan(
            a, b, c, d, e, f, g, model_id=model_id, W=W, A=A,
            Wst0=Wst0, Wst1=Wst1, G=G, grace=grace, return_prov=True,
        )
    )(y1, y2, pt, alo, ahi, blo, bhi)


@partial(jax.jit, static_argnames=("model_id", "W", "A", "Wst0", "Wst1",
                                   "G", "grace"))
def _planned_scan_batch_segN(y1, y2, pt, alo, ahi, blo, bhi, cand,
                             model_id, W, A, Wst0, Wst1, G, grace):
    return jax.vmap(
        lambda a, b, c, d, e, f, g, ci: _planned_scan(
            a, b, c, d, e, f, g, model_id=model_id, W=W, A=A,
            Wst0=Wst0, Wst1=Wst1, G=G, grace=grace, return_prov=True,
            cand_in=ci,
        )
    )(y1, y2, pt, alo, ahi, blo, bhi, cand)


@partial(jax.jit, static_argnames=("W", "A"))
def _traceback_prov_batch(final, beam_srcs, is_main, W: int, A: int):
    """Final top-1 + reverse provenance walk (the tail of _planned_scan),
    vmapped over the batch — run once over concatenated segment prov."""

    def one(fin, srcs, mains):
        keep = _dedup_mask(fin["k1"], fin["k2"], fin["valid"])
        scores = jnp.where(keep, fin["score"], _NEG_INF)
        top_idx = jnp.argmax(scores)

        def back(j, inp):
            src, adv = inp
            is_child = j >= W
            c = jnp.where(is_child & adv, (j - W) % A, -1)
            b = jnp.where(is_child, (j - W) // A, j)
            j_prev = jnp.where(adv, src[b].astype(j.dtype), j)
            return j_prev, c

        j0, chars = jax.lax.scan(back, top_idx, (srcs, mains),
                                 reverse=True)
        first_char = jnp.where(j0 >= W, (j0 - W) % A, -1)
        return first_char, chars

    return jax.vmap(one)(final, beam_srcs, is_main)


def beam_search_2d_planned_batch_seg(pairs, beam_width=5, alphabet="ACGT",
                                     model="ctc", exact: bool = True,
                                     seg: int = 4096) -> list[str]:
    """Batched plan-driven search in bounded-length scan segments.

    Identical math to beam_search_2d_planned_batch — the candidate state
    (including the exact-mode graveyard) carries across segment launches,
    and segment boundaries fall on whole plan steps, so outputs are
    bit-identical. Purpose: the full-length batched exact scan (N ~ 68k
    steps x B pairs x graveyard state) reproducibly faults the axon TPU
    runtime worker (docs/EXACTNESS.md); per-launch scans of ``seg`` steps
    stay under whatever per-program resource limit is involved while
    keeping the per-launch dispatch overhead amortized.
    """
    A = len(alphabet)
    model_id = _MODEL_IDS[model]
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    plans = []
    for y1, y2, envelope in pairs:
        y1 = np.asarray(y1)
        y2 = np.asarray(y2)
        U, V = len(y1), len(y2)
        if envelope is None:
            envelope = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
        env = np.asarray(envelope, dtype=np.int64)[:U]
        plans.append(build_plan(env, U, V))

    N_max = max(len(p["type"]) for p in plans)
    N_pad = ((N_max + seg - 1) // seg) * seg
    T1 = max(len(p[0]) for p in pairs)
    T2 = max(len(p[1]) for p in pairs)
    w0 = max(
        int(np.where(p["type"] != C1RUN, p["a_hi"] - p["a_lo"], 0).max())
        for p in plans
    )
    w1 = max(
        int(np.where(p["type"] != C0RUN, p["b_hi"] - p["b_lo"], 0).max())
        for p in plans
    )
    Wst0 = max(w0, 1) + 2
    Wst1 = max(w1, 1) + 2

    fills = dict(type=C0RUN, a_lo=0, a_hi=0, b_lo=0, b_hi=0)

    def padp(p):
        n = N_pad - len(p["type"])
        return {
            k: np.concatenate([v, np.full(n, fills[k], v.dtype)])
            for k, v in p.items()
        }

    def pady(y, T):
        y = np.asarray(y, np.float64)
        return np.pad(y, ((0, T - len(y)), (0, 0)), constant_values=LOG_0)

    plans = [padp(p) for p in plans]
    y1b = jnp.asarray(np.stack([pady(p[0], T1) for p in pairs]), dtype)
    y2b = jnp.asarray(np.stack([pady(p[1], T2) for p in pairs]), dtype)
    stacked = {k: jnp.asarray(np.stack([p[k] for p in plans]))
               for k in ("type", "a_lo", "a_hi", "b_lo", "b_hi")}

    G, grace = (EXACT_G, EXACT_GRACE) if exact else (0, 1)
    cand = None
    provs, mains = [], []
    for s0 in range(0, N_pad, seg):
        sl = slice(s0, s0 + seg)
        segargs = (y1b, y2b, stacked["type"][:, sl],
                   stacked["a_lo"][:, sl], stacked["a_hi"][:, sl],
                   stacked["b_lo"][:, sl], stacked["b_hi"][:, sl])
        if cand is None:
            cand, bs, im = _planned_scan_batch_seg0(
                *segargs, model_id, beam_width, A, Wst0, Wst1, G, grace)
        else:
            cand, bs, im = _planned_scan_batch_segN(
                *segargs, cand, model_id, beam_width, A, Wst0, Wst1, G,
                grace)
        provs.append(bs)
        mains.append(im)

    first_char, chars = _traceback_prov_batch(
        cand, jnp.concatenate(provs, axis=1),
        jnp.concatenate(mains, axis=1), beam_width, A)
    first_char = np.asarray(first_char)
    chars = np.asarray(chars)
    out = []
    for b in range(len(pairs)):
        cs = [int(first_char[b])] + [int(c) for c in chars[b]]
        out.append("".join(alphabet[c] for c in cs if c >= 0))
    return out
