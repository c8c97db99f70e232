"""Pallas TPU mega-kernel for plan-driven row_col pair beam search (CTC).

The entire consensus search — ~50k sequential plan steps of prune / expand /
windowed CTC sweeps — runs as ONE `pallas_call` with a sequential 1D grid
over plan steps. All search state lives in VMEM/SMEM scratch, which persists
across grid steps on TPU, eliminating the per-step dispatch/While overhead
that dominates the lax.scan implementation (ops/beam2d_planned.py — same
step semantics; differential-tested against it).

Layout:
- y planes [8, 1+T]: rows A,C,G,T, gap, cumulative-gap, pad, pad; one
  leading pad column so lane t+1 holds time t and lane 0 holds t = -1
  (cum(-1) = 0; -inf elsewhere).
- Candidate bookkeeping (prefix-hash keys, chars, validity, scores) is
  scalar SMEM work unrolled over the C = W*(A+1) slots.
- Sweep compute is [32 candidates x 128 window columns] VPU tiles; the
  within-window stay chain is a closed-form cumulative logsumexp
  (Hillis-Steele lane scan); parent values are gathered across candidates
  with one-hot [32,32] MXU matmuls. Parent chains converge by recomputing
  W+1 fixed layers (a depth-d node is correct after layer d).
- Candidate-table reordering at prune (winner slots + child slots) is a
  pair of one-hot matmuls permuting the storage/frozen-copy planes.
- Per-step provenance (step type + W winner slots) streams to HBM; the
  label is reconstructed by a host walk identical to the XLA engine's.

Supported model: plain CTC ("poreover") — the pair-decode flagship
configuration. W (beam width) and A = 4 are static.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = np.float32(-1e30)

MAIN, C0RUN, C1RUN = 0, 1, 2

_M1 = np.uint32(2654435761)
_M2 = np.uint32(40503)



def _dotx(a, b, preferred_element_type=jnp.float32):
    """Exact f32 matmul: default TPU dot truncates inputs to bf16, which
    corrupts one-hot gathers/permutes of log-prob planes (probe-confirmed
    error ~1.0 at magnitude ~200); HIGHEST precision is bit-exact."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=preferred_element_type,
    )

def _build_kernel(W: int, A: int, Wst0: int, Wst1: int, CH: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = W * (A + 1)
    CP = 32
    assert C <= CP
    LAYERS = W + 1
    # storage lanes: aligned shifting + aligned chunk writes need margins;
    # the usable (history) window is S - CH lanes
    S0 = ((Wst0 + 3 * CH + 127) // 128) * 128
    S1 = ((Wst1 + 3 * CH + 127) // 128) * 128
    WF0 = S0 - CH
    WF1 = S1 - CH

    def kernel(y1_ref, y2_ref, plan_ref,
               prov_ref, fin_ref, fini_ref,
               st0, ps0, st1, ps1,
               k1, k2, pk1, pk2, chs, pchs, valid, score,
               so_s,
               chvec, swmask, rootmask, psmask, pswept,
               onehot, onehot2,
               mx, seeds, tmp):
        i = pl.program_id(0)
        # plan scalars: aligned block load + masked-reduce extraction
        # (dynamic-lane scalar VMEM loads are not supported by Mosaic)
        _pb = pl.multiple_of((i // 128) * 128, 128)
        _pcol = i - _pb
        _pmat = plan_ref[0:8, pl.ds(_pb, 128)]
        _psel = (
            jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1) == _pcol
        )
        _pvals = jnp.sum(jnp.where(_psel, _pmat, 0), axis=1)
        stype = _pvals[0]
        alo_i = _pvals[1]
        ahi_i = _pvals[2]
        blo_i = _pvals[3]
        bhi_i = _pvals[4]

        # ------------------------------------------------------------------
        @pl.when(i == 0)
        def _init():
            so_s[0] = -128
            so_s[1] = -128
            st0[:, :] = jnp.full((CP, S0), _NEG, jnp.float32)
            ps0[:, :] = jnp.full((CP, S0), _NEG, jnp.float32)
            st1[:, :] = jnp.full((CP, S1), _NEG, jnp.float32)
            ps1[:, :] = jnp.full((CP, S1), _NEG, jnp.float32)
            for s in range(CP):
                k1[s] = 0
                k2[s] = 0
                pk1[s] = 0
                pk2[s] = 0
                chs[s] = 0
                pchs[s] = -1
                valid[s] = 0
                score[s] = _NEG
            for c in range(A):
                k1[c] = jnp.int32(np.int32(np.uint32(c + 1)))
                k2[c] = jnp.int32(np.int32(np.uint32(c + 1)))
                chs[c] = c
                valid[c] = 1
                score[c] = 0.0
            # init values at t=0 (reference init at (0,0),(1,0)); vector
            # writes since Mosaic forbids scalar stores to VMEM.
            # storage lane l holds time so + l with so = -128, so t=0 is
            # lane 128 and t=-1 is lane 127.
            li0 = jax.lax.broadcasted_iota(jnp.int32, (CP, S0), 1)
            ro0 = jax.lax.broadcasted_iota(jnp.int32, (CP, S0), 0)
            acc0 = st0[:, :]
            li1 = jax.lax.broadcasted_iota(jnp.int32, (CP, S1), 1)
            ro1 = jax.lax.broadcasted_iota(jnp.int32, (CP, S1), 0)
            acc1 = st1[:, :]
            for c in range(A):
                acc0 = jnp.where((ro0 == c) & (li0 == 128), y1_ref[c, 0], acc0)
                acc1 = jnp.where((ro1 == c) & (li1 == 128), y2_ref[c, 0], acc1)
            st0[:, :] = acc0
            st1[:, :] = acc1

        # ==================================================================
        # scalar helpers (python-unrolled over C slots)
        # ==================================================================
        def gather_i32(arr, idx):
            out = arr[0]
            for s in range(1, C):
                out = jnp.where(idx == s, arr[s], out)
            return out

        row1 = jax.lax.broadcasted_iota(jnp.int32, (CP, 1), 0)
        rCC = jax.lax.broadcasted_iota(jnp.int32, (CP, CP), 0)
        cCC = jax.lax.broadcasted_iota(jnp.int32, (CP, CP), 1)

        def vec_col(scalars, default):
            # [CP,1] f32 built from C traced scalars (no scalar VMEM stores)
            v = jnp.full((CP, 1), default, jnp.float32)
            for s, x in enumerate(scalars):
                v = jnp.where(row1 == s, x, v)
            return v

        def onehot_rows(row_col_have):
            # [(row:int, col:traced, have:traced bool)] -> [CP,CP] one-hot
            m = jnp.zeros((CP, CP), jnp.float32)
            for r, col, have in row_col_have:
                m = jnp.where((rCC == r) & (cCC == col) & have, 1.0, m)
            return m

        def select_winners():
            """Top-W valid slots by score with key dedup.
            Returns (winner_slots [W], winner_ok [W]) traced scalars."""
            avail = [valid[s] > 0 for s in range(C)]
            winners = []
            winner_ok = []
            for _w in range(W):
                best_s = jnp.int32(0)
                best_v = jnp.float32(_NEG)
                has = jnp.bool_(False)
                for s in range(C):
                    cond = avail[s] & ((score[s] > best_v) | ~has)
                    best_v = jnp.where(cond, score[s], best_v)
                    best_s = jnp.where(cond, s, best_s)
                    has = has | avail[s]
                bk1 = gather_i32(k1, best_s)
                bk2 = gather_i32(k2, best_s)
                avail = [
                    avail[s] & ~((k1[s] == bk1) & (k2[s] == bk2))
                    for s in range(C)
                ]
                winners.append(jnp.where(has, best_s, -1))
                winner_ok.append(has)
            return winners, winner_ok

        def extend_key(kk1, kk2, c):
            nk1 = (kk1.astype(jnp.uint32) * _M1 + np.uint32(c + 1)).astype(
                jnp.int32)
            nk2 = (kk2.astype(jnp.uint32) * _M2 + np.uint32(c + 1)).astype(
                jnp.int32)
            return nk1, nk2

        def build_parent_onehots(swept_pred):
            """onehot[i, j] = 1 iff j is the first slot with i's parent key
            AND swept_pred(j); pswept[i] marks having such a parent.
            onehot2/psmask: same with presence (valid) instead of swept."""
            oh1 = []
            oh2 = []
            psw = []
            psm = []
            rtm = []
            chv = []
            for s in range(C):
                is_root = (pk1[s] == 0) & (pk2[s] == 0)
                psl = jnp.int32(-1)
                psl2 = jnp.int32(-1)
                for t in range(C - 1, -1, -1):
                    key_eq = (k1[t] == pk1[s]) & (k2[t] == pk2[s])
                    psl = jnp.where(key_eq & swept_pred[t], t, psl)
                    psl2 = jnp.where(key_eq & (valid[t] > 0), t, psl2)
                have = (psl >= 0) & ~is_root
                have2 = (psl2 >= 0) & ~is_root
                oh1.append((s, jnp.maximum(psl, 0), have))
                oh2.append((s, jnp.maximum(psl2, 0), have2))
                psw.append(jnp.where(have, 1.0, 0.0))
                psm.append(jnp.where(have2, 1.0, 0.0))
                rtm.append(jnp.where(is_root & (valid[s] > 0), 1.0, 0.0))
                chv.append(chs[s].astype(jnp.float32))
            onehot[:, :] = onehot_rows(oh1)
            onehot2[:, :] = onehot_rows(oh2)
            pswept[:, :] = vec_col(psw, 0.0)
            psmask[:, :] = vec_col(psm, 0.0)
            rootmask[:, :] = vec_col(rtm, 0.0)
            chvec[:, :] = vec_col(chv, 0.0)

        # ==================================================================
        # vectorized sweep over one axis
        # ==================================================================
        def sweep_axis(st, ps, so_idx, y_ref, lo, hi, Wst, S):
            """Aligned sweep: storage lane l <-> time so + l with so always a
            multiple of 128; all dynamic lane offsets are 128-aligned.
            ``Wst`` here is the usable history width (S - CH)."""
            so = so_s[so_idx]
            # anchor: keep if window fits, else minimal aligned right shift
            need = hi - Wst  # new_so must be >= need
            cand = ((need + 127) // 128) * 128  # align_up (need <= 0 safe)
            new_so = pl.multiple_of(jnp.maximum(so, cand), 128)
            d = pl.multiple_of(new_so - so, 128)  # >= 0

            @pl.when(d != 0)
            def _shift():
                # left-shift storage/frozen planes by d (multiple of 128)
                # via block copies through tmp (dynamic roll on scratch
                # miscompiles on hardware)
                nblk = S // CH
                for ref in (st, ps):
                    for j in range(nblk):
                        src = pl.multiple_of(j * CH + d, 128)

                        @pl.when(src <= S - CH)
                        def _cp(j=j, src=src, ref=ref):
                            tmp[:, j * CH:(j + 1) * CH] = ref[:, pl.ds(src, CH)]

                        @pl.when(src > S - CH)
                        def _fill(j=j, ref=ref):
                            tmp[:, j * CH:(j + 1) * CH] = jnp.full(
                                (CP, CH), _NEG, jnp.float32)
                    ref[:, :] = tmp[:, pl.ds(0, S)]

            so_s[so_idx] = new_so

            ac0 = pl.multiple_of((lo // 128) * 128, 128)  # aligned origin
            width_al = hi - ac0
            n_chunks = (width_al + CH - 1) // CH

            # seeds: own value at lo-1, extracted from the two aligned
            # 128-lane slices around it
            pos0 = pl.multiple_of(jnp.maximum(ac0 - new_so, 0), 128)
            pos_prev = pl.multiple_of(jnp.maximum(pos0 - CH, 0), 128)
            catA = st[:, pl.ds(pos_prev, CH)]
            catB = st[:, pl.ds(pos0, CH)]
            cat = jnp.concatenate([catA, catB], axis=1)  # [CP, 2CH]
            li2 = jax.lax.broadcasted_iota(jnp.int32, (CP, 2 * CH), 1)
            tA = new_so + pos_prev
            tcat = jnp.where(li2 < CH, tA + li2, new_so + pos0 + (li2 - CH))
            seeds[:, :] = jnp.max(
                jnp.where(tcat == lo - 1, cat, _NEG), axis=1, keepdims=True)
            seeds[:, :] = jnp.where(swmask[:, :] > 0, seeds[:, :], _NEG)
            mx[:, :] = jnp.full((CP, 1), _NEG, jnp.float32)

            def chunk(kc, carry):
                c_lo = pl.multiple_of(ac0 + kc * CH, 128)
                li = jax.lax.broadcasted_iota(jnp.int32, (CP, CH), 1)
                t_abs = c_lo + li
                in_m = jnp.where(
                    (t_abs >= lo) & (t_abs < hi) & (swmask[:, :] > 0),
                    1.0, 0.0)

                # emission rows by char (A-way select); y lane t <-> time t
                em = jnp.full((CP, CH), _NEG, jnp.float32)
                for c in range(A):
                    row = y_ref[c:c + 1, pl.ds(c_lo, CH)]
                    em = jnp.where(chvec[:, :] == float(c), row, em)
                gap = y_ref[A:A + 1, pl.ds(c_lo, CH)]
                rootv = y_ref[A + 1:A + 2, pl.ds(c_lo, CH)]  # cum at t-1

                # frozen parent values at t-1: two aligned slices, static
                # re-slice at offset CH-1
                pos = pl.multiple_of(c_lo - new_so, 128)
                posp = pl.multiple_of(jnp.maximum(pos - CH, 0), 128)
                fA = ps[:, pl.ds(posp, CH)]
                fB = ps[:, pl.ds(pos, CH)]
                fcat = jnp.concatenate([fA, fB], axis=1)
                fro = jax.lax.slice_in_dim(fcat, CH - 1, 2 * CH - 1, axis=1)
                fro_pos = (c_lo - 1 - new_so) + li
                fro = jnp.where((fro_pos >= 0) & (fro_pos < Wst), fro, _NEG)
                ext = jnp.where(rootmask[:, :] > 0, rootv, fro)

                gapm = jnp.where(in_m > 0, gap, 0.0)
                cg = gapm
                sh = 1
                while sh < CH:
                    cg = cg + jnp.where(li >= sh, pltpu.roll(cg, sh, 1), 0.0)
                    sh *= 2

                m = jnp.full((CP, CH), _NEG, jnp.float32)
                for _layer in range(LAYERS):
                    if _layer == 0:
                        # layer-0 m is the _NEG splat: the one-hot gather
                        # result is known analytically (parent row -> _NEG,
                        # no parent -> 0); skips a matmul and avoids splat
                        # slicing (see pallas_pair_beam_batch.py).
                        par = jnp.broadcast_to(
                            jnp.where(pswept[:, :] > 0, _NEG, 0.0), (CP, CH))
                    else:
                        par = _dotx(onehot[:, :], m,
                                    preferred_element_type=jnp.float32)
                    pseed = _dotx(onehot[:, :], seeds[:, :],
                                    preferred_element_type=jnp.float32)
                    parsh = pltpu.roll(par, 1, 1)
                    # lane 0: value carried from the previous chunk; the
                    # window's first in-range lane (t == lo) needs the
                    # parent's stored value at lo-1 (aligned chunks may
                    # start before lo)
                    parsh = jnp.where(li == 0, pseed, parsh)
                    parsh = jnp.where(t_abs == lo, pseed, parsh)
                    pv = jnp.where(pswept[:, :] > 0, parsh, ext)
                    E = jnp.where(in_m > 0, pv + em, _NEG)
                    X = E - cg
                    run = X
                    sh = 1
                    while sh < CH:
                        prev = jnp.where(li >= sh, pltpu.roll(run, sh, 1), _NEG)
                        run = jnp.logaddexp(run, prev)
                        sh *= 2
                    pfull = cg + jnp.logaddexp(run, seeds[:, :])
                    m = jnp.where(in_m > 0, pfull, _NEG)

                old = st[:, pl.ds(pos, CH)]
                st[:, pl.ds(pos, CH)] = jnp.where(in_m > 0, m, old)

                mx[:, :] = jnp.maximum(
                    mx[:, :],
                    jnp.max(jnp.where(in_m > 0, m, _NEG), axis=1,
                            keepdims=True))
                # next-chunk seed: own value at the chunk's last column; keep
                # the previous seed where that column was out of window
                last_t = c_lo + CH - 1
                new_seed = m[:, CH - 1:CH]
                take = (swmask[:, :] > 0) & (last_t >= lo) & (last_t < hi)
                seeds[:, :] = jnp.where(take, new_seed, seeds[:, :])
                return carry

            jax.lax.fori_loop(0, n_chunks, chunk, 0)

            # frozen-copy refresh for present parents
            pp = _dotx(onehot2[:, :], st[:, :],
                         preferred_element_type=jnp.float32)
            ps[:, :] = jnp.where(psmask[:, :] > 0, pp, ps[:, :])

        # ==================================================================
        # MAIN step
        # ==================================================================
        @pl.when(stype == MAIN)
        def _main():
            winners, winner_ok = select_winners()

            # ---- gather winner fields ----
            wk1 = [gather_i32(k1, winners[w]) for w in range(W)]
            wk2 = [gather_i32(k2, winners[w]) for w in range(W)]
            wpk1 = [gather_i32(pk1, winners[w]) for w in range(W)]
            wpk2 = [gather_i32(pk2, winners[w]) for w in range(W)]
            wch = [gather_i32(chs, winners[w]) for w in range(W)]
            wpch = [gather_i32(pchs, winners[w]) for w in range(W)]

            # ---- new table fields ----
            nk1 = [None] * C
            nk2 = [None] * C
            npk1 = [None] * C
            npk2 = [None] * C
            nch = [None] * C
            npch = [None] * C
            nval = [None] * C
            for w in range(W):
                nk1[w], nk2[w] = wk1[w], wk2[w]
                npk1[w], npk2[w] = wpk1[w], wpk2[w]
                nch[w], npch[w] = wch[w], wpch[w]
                nval[w] = winner_ok[w]
            for b in range(W):
                for c in range(A):
                    s = W + b * A + c
                    ck1, ck2 = extend_key(wk1[b], wk2[b], c)
                    nk1[s], nk2[s] = ck1, ck2
                    npk1[s], npk2[s] = wk1[b], wk2[b]
                    nch[s] = jnp.int32(c)
                    npch[s] = wch[b]
                    nval[s] = winner_ok[b]

            # ---- permutation sources ----
            # beam rows (and their frozen rows) come from winner slots; child
            # rows come from the old slot holding the same key (if any), and
            # their frozen rows from the parent's (winner's) old storage row.
            src_slot = [None] * C
            src_has = [None] * C
            for w in range(W):
                src_slot[w] = jnp.maximum(winners[w], 0)
                src_has[w] = winner_ok[w]
            for b in range(W):
                for c in range(A):
                    s = W + b * A + c
                    psl = jnp.int32(-1)
                    for t in range(C - 1, -1, -1):
                        hit = (k1[t] == nk1[s]) & (k2[t] == nk2[s]) & (
                            valid[t] > 0)
                        psl = jnp.where(hit, t, psl)
                    src_slot[s] = jnp.maximum(psl, 0)
                    src_has[s] = (psl >= 0) & winner_ok[b]

            # build one-hot permutation matrices (vectorized writes)
            onehot[:, :] = onehot_rows(
                [(s, src_slot[s], src_has[s]) for s in range(C)])
            beam_map = onehot_rows(
                [(w, jnp.maximum(winners[w], 0), winner_ok[w])
                 for w in range(W)])
            child_map = onehot_rows(
                [(W + b * A + c, jnp.maximum(winners[b], 0), winner_ok[b])
                 for b in range(W) for c in range(A)])
            onehot2[:, :] = beam_map
            # child frozen rows gather the parent's old *storage* row
            is_child_row = jnp.where(row1 >= W, 1.0, 0.0)
            pswept[:, :] = is_child_row

            def permute(st, ps, S):
                # storage permute
                tmp[:, pl.ds(0, S)] = _dotx(
                    onehot[:, :], st[:, pl.ds(0, S)],
                    preferred_element_type=jnp.float32)
                # frozen rows: beam rows from old frozen, child rows from
                # parent's old storage
                fr_beam = _dotx(beam_map, ps[:, pl.ds(0, S)],
                                  preferred_element_type=jnp.float32)
                fr_child = _dotx(child_map, st[:, pl.ds(0, S)],
                                   preferred_element_type=jnp.float32)
                newfr = jnp.where(pswept[:, :] > 0, fr_child, fr_beam)
                st[:, pl.ds(0, S)] = jnp.where(
                    has_src_mask > 0, tmp[:, pl.ds(0, S)], _NEG)
                ps[:, pl.ds(0, S)] = jnp.where(
                    valid_row_mask > 0, newfr, _NEG)

            # masks for permute
            has_src_mask = vec_col(
                [jnp.where(src_has[s], 1.0, 0.0) for s in range(C)], 0.0)
            valid_row_mask = vec_col(
                [jnp.where(nval[s], 1.0, 0.0) for s in range(C)], 0.0)
            permute(st0, ps0, S0)
            permute(st1, ps1, S1)

            # ---- commit new scalar fields ----
            for s in range(C):
                k1[s] = nk1[s]
                k2[s] = nk2[s]
                pk1[s] = npk1[s]
                pk2[s] = npk2[s]
                chs[s] = nch[s]
                pchs[s] = npch[s]
                valid[s] = jnp.where(nval[s], 1, 0)

            # ---- sweep masks: all valid swept ----
            swmask[:, :] = vec_col(
                [jnp.where(valid[s] > 0, 1.0, 0.0) for s in range(C)], 0.0)
            swept_pred = [valid[t] > 0 for t in range(C)]
            build_parent_onehots(swept_pred)

            sweep_axis(st0, ps0, 0, y1_ref, alo_i, ahi_i, WF0, S0)
            for s in range(C):
                score[s] = jnp.where(valid[s] > 0, mx[s, 0], _NEG)
            sweep_axis(st1, ps1, 1, y2_ref, blo_i, bhi_i, WF1, S1)
            for s in range(C):
                score[s] = jnp.where(valid[s] > 0, score[s] + mx[s, 0], _NEG)

            # ---- provenance (masked vector write into the 8-row block) ----
            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            newrow = jnp.where(c8 == 0, stype, -1)
            for w in range(W):
                newrow = jnp.where(c8 == 1 + w, winners[w], newrow)
            prov_ref[:, :] = jnp.where(r8 == (i % 8), newrow, prov_ref[:, :])

        # ==================================================================
        # CATCH-RUN steps
        # ==================================================================
        @pl.when(stype != MAIN)
        def _run():
            winners, winner_ok = select_winners()
            # swept = any slot whose key matches a winner key
            wk1 = [gather_i32(k1, winners[w]) for w in range(W)]
            wk2 = [gather_i32(k2, winners[w]) for w in range(W)]
            swl = []
            for s in range(C):
                seld = jnp.bool_(False)
                for w in range(W):
                    seld = seld | (
                        winner_ok[w] & (k1[s] == wk1[w]) & (k2[s] == wk2[w]))
                seld = seld & (valid[s] > 0)
                swl.append(seld)
            swmask[:, :] = vec_col(
                [jnp.where(x, 1.0, 0.0) for x in swl], 0.0)
            build_parent_onehots(swl)

            @pl.when(stype == C0RUN)
            def _r0():
                sweep_axis(st0, ps0, 0, y1_ref, alo_i, ahi_i, WF0, S0)

            @pl.when(stype == C1RUN)
            def _r1():
                sweep_axis(st1, ps1, 1, y2_ref, blo_i, bhi_i, WF1, S1)

            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            newrow = jnp.where(c8 == 0, stype, -1)
            prov_ref[:, :] = jnp.where(r8 == (i % 8), newrow, prov_ref[:, :])

        # ---- final outputs ----
        @pl.when(i == pl.num_programs(0) - 1)
        def _fin():
            r8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
            c8 = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
            out = jnp.full((8, 128), _NEG, jnp.float32)
            outi = jnp.zeros((8, 128), jnp.int32)
            for s in range(C):
                out = jnp.where((r8 == 0) & (c8 == s), score[s], out)
                out = jnp.where(
                    (r8 == 1) & (c8 == s), valid[s].astype(jnp.float32), out)
                outi = jnp.where((r8 == 0) & (c8 == s), k1[s], outi)
                outi = jnp.where((r8 == 1) & (c8 == s), k2[s], outi)
                outi = jnp.where((r8 == 2) & (c8 == s), pk1[s], outi)
                outi = jnp.where((r8 == 3) & (c8 == s), pk2[s], outi)
                outi = jnp.where((r8 == 4) & (c8 == s), chs[s], outi)
                outi = jnp.where((r8 == 5) & (c8 == s), pchs[s], outi)
                outi = jnp.where((r8 == 6) & (c8 == s), valid[s], outi)
            fin_ref[:, :] = out
            fini_ref[:, :] = outi

    return kernel, C, CP, LAYERS, S0, S1


# --------------------------------------------------------------------------
# host driver
# --------------------------------------------------------------------------

def _pack_plane(y: np.ndarray, CH: int = 128) -> np.ndarray:
    """[T, A+1] log-probs -> [8, L] plane: rows 0..A-1 emissions at lane t,
    row A gap at lane t, row A+1 cumulative gap at t-1 (lane t holds
    cum(t-1); lane 0 = cum(-1) = 0). Trailing pad keeps aligned chunk
    slices in bounds; L is a lane multiple."""
    T, S = y.shape
    L = ((T + CH + 8 + 127) // 128) * 128
    plane = np.full((8, L), _NEG, np.float32)
    plane[:S, :T] = y.T.astype(np.float32)
    cum = np.cumsum(y[:, -1]).astype(np.float32)
    plane[S, 0] = 0.0
    plane[S, 1:T + 1] = cum
    return plane


@partial(jax.jit, static_argnames=("W", "A", "Wst0", "Wst1", "CH", "interpret"))
def _run_kernel(y1p, y2p, ptype, alo, ahi, blo, bhi,
                W: int, A: int, Wst0: int, Wst1: int, CH: int,
                interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    kernel, C, CP, LAYERS, S0, S1 = _build_kernel(W, A, Wst0, Wst1, CH)
    N = ptype.shape[0]

    # plan packed into a VMEM input (the SMEM scalar-prefetch space is only
    # ~1MB and full-read plans exceed it)
    Lp = ((N + 127) // 128) * 128
    plan_mat = jnp.zeros((8, Lp), jnp.int32)
    plan_mat = plan_mat.at[0, :N].set(ptype)
    plan_mat = plan_mat.at[1, :N].set(alo)
    plan_mat = plan_mat.at[2, :N].set(ahi)
    plan_mat = plan_mat.at[3, :N].set(blo)
    plan_mat = plan_mat.at[4, :N].set(bhi)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((8, 128), lambda i: (i // 8, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
            pl.BlockSpec((8, 128), lambda i: (0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((CP, S0), jnp.float32),  # st0
            pltpu.VMEM((CP, S0), jnp.float32),  # ps0
            pltpu.VMEM((CP, S1), jnp.float32),  # st1
            pltpu.VMEM((CP, S1), jnp.float32),  # ps1
            pltpu.SMEM((CP,), jnp.int32),       # k1
            pltpu.SMEM((CP,), jnp.int32),       # k2
            pltpu.SMEM((CP,), jnp.int32),       # pk1
            pltpu.SMEM((CP,), jnp.int32),       # pk2
            pltpu.SMEM((CP,), jnp.int32),       # chs
            pltpu.SMEM((CP,), jnp.int32),       # pchs
            pltpu.SMEM((CP,), jnp.int32),       # valid
            pltpu.SMEM((CP,), jnp.float32),     # score
            pltpu.SMEM((4,), jnp.int32),        # so_s
            pltpu.VMEM((CP, 1), jnp.float32),   # chvec
            pltpu.VMEM((CP, 1), jnp.float32),   # swmask
            pltpu.VMEM((CP, 1), jnp.float32),   # rootmask
            pltpu.VMEM((CP, 1), jnp.float32),   # psmask
            pltpu.VMEM((CP, 1), jnp.float32),   # pswept
            pltpu.VMEM((CP, CP), jnp.float32),  # onehot
            pltpu.VMEM((CP, CP), jnp.float32),  # onehot2
            pltpu.VMEM((CP, 1), jnp.float32),   # mx
            pltpu.VMEM((CP, 1), jnp.float32),   # seeds
            pltpu.VMEM((CP, max(S0, S1)), jnp.float32),  # tmp
        ],
    )
    prov, fin, fini = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((((N + 7) // 8) * 8, 128), jnp.int32),
            jax.ShapeDtypeStruct((8, 128), jnp.float32),
            jax.ShapeDtypeStruct((8, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ) if not interpret else None,
    )(y1p, y2p, plan_mat)
    return prov, fin, fini


def _traceback(prov: np.ndarray, fin: np.ndarray, W: int, A: int,
               alphabet: str) -> str:
    """Host walk over provenance (same scheme as the XLA engines)."""
    C = W * (A + 1)
    scores = fin[0, :C]
    valid = fin[1, :C] > 0
    scores = np.where(valid, scores, -np.inf)
    j = int(np.argmax(scores))
    chars = []
    for t in range(len(prov) - 1, -1, -1):
        stype = prov[t, 0]
        if stype != MAIN:
            continue
        winners = prov[t, 1:1 + W]
        if j >= W:
            b = (j - W) // A
            c = (j - W) % A
            chars.append(c)
            j = b
        j = int(winners[j])
        if j < 0:
            break
    # j now indexes the init table: root children at slots 0..A-1
    if j >= 0 and prov.shape[0] > 0:
        chars.append(j if j < A else None)
    out = [c for c in reversed(chars) if c is not None]
    return "".join(alphabet[c] for c in out)


def pair_beam_pallas(y1, y2, envelope, beam_width: int = 5,
                     alphabet: str = "ACGT", interpret: bool = False,
                     n_steps: int | None = None,
                     return_state: bool = False) -> str:
    """Pallas-kernel row_col pair beam search (plain CTC).

    Single-pair entry point. The default path delegates to the batched
    mega-kernel at B=1 (ops/pallas_pair_beam_batch.py), which carries the
    HBM-output + packed-provenance perf fixes; this module's legacy kernel
    remains directly reachable for debugging (`n_steps`/`return_state`/
    `interpret`) and as an independent implementation for differential
    tests."""
    if not (interpret or n_steps is not None or return_state):
        from .pallas_pair_beam_batch import pair_beam_pallas_batch

        return pair_beam_pallas_batch(
            [(y1, y2, envelope)], beam_width=beam_width, alphabet=alphabet
        )[0]
    return pair_beam_pallas_legacy(
        y1, y2, envelope, beam_width=beam_width, alphabet=alphabet,
        interpret=interpret, n_steps=n_steps, return_state=return_state,
    )


def pair_beam_pallas_legacy(y1, y2, envelope, beam_width: int = 5,
                            alphabet: str = "ACGT", interpret: bool = False,
                            n_steps: int | None = None,
                            return_state: bool = False) -> str:
    """Round-1 single-pair mega-kernel (per-step windowed VMEM outputs)."""
    from .beam2d_planned import C0RUN as PC0, C1RUN as PC1, build_plan

    y1 = np.asarray(y1)
    y2 = np.asarray(y2)
    U, V = len(y1), len(y2)
    A = len(alphabet)
    W = beam_width
    env = np.asarray(envelope, dtype=np.int64)[:U]
    plan = build_plan(env, U, V)
    if len(plan["type"]) == 0:
        return ""

    # Wst / padding config always from the FULL plan so a truncated debug
    # run (n_steps) reuses the same compiled kernel
    w0 = np.where(plan["type"] != PC1, plan["a_hi"] - plan["a_lo"], 0)
    w1 = np.where(plan["type"] != PC0, plan["b_hi"] - plan["b_lo"], 0)
    # bucket static config so one compilation serves many problem sizes
    def bucket(x, buckets=(384, 768, 1536, 3072)):
        for b in buckets:
            if x <= b:
                return b
        return ((x + 1023) // 1024) * 1024

    Wst0 = bucket(int(max(w0.max(), 1)) + 2)
    Wst1 = bucket(int(max(w1.max(), 1)) + 2)

    N_pad = ((len(plan["type"]) + 511) // 512) * 512
    if n_steps is not None:
        plan = {k: v[:n_steps] for k, v in plan.items()}
    N = len(plan["type"])
    def padp(a, fill):
        return np.concatenate([a, np.full(N_pad - N, fill, a.dtype)])
    ptype = padp(plan["type"], PC0)      # zero-width catch-run = no-op
    alo = padp(plan["a_lo"], 0)
    ahi = padp(plan["a_hi"], 0)
    blo = padp(plan["b_lo"], 0)
    bhi = padp(plan["b_hi"], 0)

    y1p = jnp.asarray(_pack_plane(y1))
    y2p = jnp.asarray(_pack_plane(y2))
    prov, fin, fini = _run_kernel(
        y1p, y2p,
        jnp.asarray(ptype), jnp.asarray(alo),
        jnp.asarray(ahi), jnp.asarray(blo),
        jnp.asarray(bhi),
        W, A, Wst0, Wst1, 128, interpret,
    )
    if return_state:
        fini = np.asarray(fini)
        fin = np.asarray(fin)
        C = W * (A + 1)
        return dict(
            score=fin[0, :C], k1=fini[0, :C], k2=fini[1, :C],
            pk1=fini[2, :C], pk2=fini[3, :C], char=fini[4, :C],
            pchar=fini[5, :C], valid=fini[6, :C] > 0,
        )
    prov = np.asarray(prov)[: len(plan["type"])]
    return _traceback(prov, np.asarray(fin), W, A, alphabet)
