"""Segmented box-batch Pallas kernel: many anchor-box consensus decodes
per launch, several boxes per lane, fully pair-vectorized.

This is the throughput engine behind the anchored (``--skip_matches``)
pair-decode mode (reference pair_decode.py:412-452 splits the lattice at
match anchors and stitches the box decodes) AND the full-envelope
saturation engine (``pair_beam_box_batch``: whole pairs, one per lane).

Differences from ops/pallas_pair_beam_batch.py (the general lockstep
kernel, same step semantics):

- **No per-pair scalar control anywhere.** The general kernel unrolls
  ``for b in range(B)`` host loops for plan scalars, chunk origins, ring
  DMAs and eviction shifts; its per-step cost grows ~linearly in B
  (measured ~9 us/pair/step) and compile time explodes (100 s at B=32).
  Here every per-pair quantity lives in [B, 1] vectors extracted from a
  VMEM plan block with masked reduces; storage eviction is a vectorized
  chunk-select shift; emission alignment is a per-block chunk-select
  re-base. Per-step instruction count — and compile time — is
  independent of B.
- **Lazy candidate-row permutation (r5).** The candidate-table rebuild
  logically permutes every storage column each MAIN step, but only the
  current window (p99 ~180 columns on real reads) is ever *read* before
  the next permute. Columns outside the hot window keep their frozen
  payload plus a per-chunk *ancestor map* (one small int per candidate
  row per 128-column chunk, [BC, 128] lanes-as-chunks): each step the
  maps compose through the same one-hot gathers with a 128-column
  payload instead of a 6*span-column one. When the window reaches a cold
  chunk, its pending composition is applied in one exact gather. This
  removes every span-wide per-step op (the old 2560-wide permute /
  refresh / seed-scan and the global span-bucket ladder), making
  per-step cost scale with the *window*, not the live span — the
  flat-in-B property docs/ROOFLINE.md §4 requires. Exactness: ancestor
  maps compose integer row indices; applying a k-step composition in one
  one-hot gather selects bit-identical f32 values to k eager permutes.
- **Segmented lanes.** A lane's plan is the concatenation of its boxes'
  plans, each padded to a 128-step block; plan row 7 flags a reset at
  the first column of a box (rows 5/6 of that column carry the new
  storage origins). Resets re-init the lane's candidate planes and
  storage exactly like the t=0 init, masked per pair.
- **FIN steps instead of score outputs.** Each box plan ends with one
  zero-width MAIN step: its winner-0 provenance slot IS the argmax
  candidate of the final table, so the traceback needs only the packed
  provenance words — no SCO/VAL device->host fetch.
- **Static geometry.** Storage is a fixed per-axis strip [BC, S0/S1];
  the hot window is a static HOTW0/HOTW1 slice whose per-step extent the
  host verifies from the plan (exact lockstep simulation). Boxes whose
  planned span exceeds the strip are returned to the caller to route
  through the general kernel.

Bit-exactness: chunk boundaries sit on absolute 128-column grids in
both kernels (storage origins and box emission bases are 128-aligned),
so the f32 logaddexp chain association order — and therefore the output
— matches the general kernel and the XLA planned engine exactly.

Reference semantics: BeamSearch.h:262-397 row_col walk over
PrefixTree.h:492-540 2D CTC nodes, windowed-memo table semantics (see
native/pair_beam_cpu.cpp emulate mode). Plain CTC ("poreover") only.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .pallas_pair_beam_batch import (
    _NEG, _M1, _M2, MAIN, C0RUN, C1RUN, CONT0, CONT1, RSHIFT,
    _split3, _dotb, _dotx, _gather, _plan_anchors, _plan_spans,
    _split_wide,
)

CH = 128
S = 768            # default storage strip width per axis (6 chunks)
SMAX = S - 2 * CH  # max planned live span a box may need (default strip)
NB = S // CH

# perf-triage ablation switches (comma list in BOXBEAM_ABLATE): disable
# kernel sections to localize per-step cost. WRONG RESULTS when set —
# timing experiments only, never production.
import os as _os

_ABL = frozenset(
    x for x in _os.environ.get("BOXBEAM_ABLATE", "").split(",") if x)


def _build_kernel(B: int, W: int, A: int, L1: int, L2: int, K: int,
                  NTOT: int, S0: int = S, S1: int = S,
                  HOTW0: int = S, HOTW1: int = S,
                  STRIP_DMA: bool = False):
    # S0/S1: storage-strip width per axis (768 for anchor boxes; sized to
    # the planned live span when whole pairs ride the segmented kernel).
    # HOTW0/HOTW1: static hot-window widths — the only columns that see
    # per-step permute/seed/refresh work; host-verified from the plan.
    # STRIP_DMA: refresh the emission strips with per-lane DMAs from the
    # (long) packed planes instead of the chunk-select chain, whose cost
    # is O(NB * L/CH) selects per block start — prohibitive at L ~ 45k.
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = W * (A + 1)
    CP = 32
    assert C <= CP and B % 8 == 0
    assert S0 % CH == 0 and S1 % CH == 0
    assert HOTW0 % CH == 0 and HOTW1 % CH == 0
    assert HOTW0 <= S0 and HOTW1 <= S1
    NB0 = S0 // CH
    NB1 = S1 // CH
    PB = B
    BC = B * CP
    LAYERS = W + 1
    LN = 128

    def kernel(y1_ref, y2_ref, plan_ref, prov_ref,
               st0, ps0, st1, ps1,
               K1, K2, PK1, PK2, CHR, PCH, VAL, SCO,
               ohP, ohFro, ohG, ohG2,
               Ast0, Aps0, Ast1, Aps1,
               seeds, mx0s, mx, mx1s,
               so0_v, so1_v,
               es0, es1, yr0, yr1,
               esL0, esL1,
               plan_v, pv_s, dma_sem):
        for _k in range(K):
            _step_body(pl.program_id(0) * K + _k,
                       y1_ref, y2_ref, plan_ref, prov_ref,
                       st0, ps0, st1, ps1,
                       K1, K2, PK1, PK2, CHR, PCH, VAL, SCO,
                       ohP, ohFro, ohG, ohG2,
                       Ast0, Aps0, Ast1, Aps1,
                       seeds, mx0s, mx, mx1s,
                       so0_v, so1_v,
                       es0, es1, yr0, yr1,
                       esL0, esL1,
                       plan_v, pv_s, dma_sem)

    def _step_body(i, y1_ref, y2_ref, plan_ref, prov_ref,
                   st0, ps0, st1, ps1,
                   K1, K2, PK1, PK2, CHR, PCH, VAL, SCO,
                   ohP, ohFro, ohG, ohG2,
                   Ast0, Aps0, Ast1, Aps1,
                   seeds, mx0s, mx, mx1s,
                   so0_v, so1_v,
                   es0, es1, yr0, yr1,
                   esL0, esL1,
                   plan_v, pv_s, dma_sem):

        lane = jax.lax.broadcasted_iota(jnp.int32, (PB, LN), 1)
        laneS = jax.lax.broadcasted_iota(jnp.int32, (B, LN), 1)
        rr = jax.lax.broadcasted_iota(jnp.int32, (BC, 1), 0)
        rblk = rr // CP
        rslot = rr - rblk * CP
        ccol = jax.lax.broadcasted_iota(jnp.int32, (BC, 128), 1)
        crow = jax.lax.broadcasted_iota(jnp.int32, (BC, 128), 0)
        cloc = (crow % 128) // CP * CP
        laneB = jax.lax.broadcasted_iota(jnp.int32, (BC, LN), 1)
        rslotF = jnp.broadcast_to(rslot.astype(jnp.float32), (BC, 128))

        def vrows(x):
            # [B, 1] -> [BC, 1]
            return jnp.repeat(x, CP, axis=0)

        def vlan(x):
            # [B, 1] -> [PB, LN]
            return jnp.broadcast_to(x, (PB, LN))

        pb = pl.multiple_of((i // 128) * 128, 128)
        pcol = i - pb

        @pl.when(pcol == 0)
        def _load_plan():
            cp = pltpu.make_async_copy(
                plan_ref.at[:, pl.ds(pb, 128)], plan_v, dma_sem.at[0])
            cp.start()
            cp.wait()

        if not STRIP_DMA:
            @pl.when(i == 0)
            def _load_rings():
                cp0 = pltpu.make_async_copy(y1_ref, yr0, dma_sem.at[1])
                cp1 = pltpu.make_async_copy(y2_ref, yr1, dma_sem.at[2])
                cp0.start()
                cp1.start()
                cp0.wait()
                cp1.wait()

        def pv(p):
            return jnp.sum(
                jnp.where(laneS == pcol, plan_v[p * B:(p + 1) * B, :], 0),
                axis=1, keepdims=True)

        stype_v = pv(0)
        alo_v = pv(1)
        ahi_v = pv(2)
        blo_v = pv(3)
        bhi_v = pv(4)
        pso0_v = pv(5)
        pso1_v = pv(6)

        # ------------------------------------------------------------------
        # block start: segmented resets + emission strip re-base
        # ------------------------------------------------------------------
        def _strip_refresh(es, yr, so_v, R, esL, Sx):
            NBx = Sx // CH
            if STRIP_DMA:
                # Whole-read planes are lane-major ([8B, R], 8 rows per
                # lane: 6 planes + 2 pad) so each lane refreshes with ONE
                # 8-row-aligned DMA at its own offset; an exact f32
                # one-hot permute then rearranges the staging strip into
                # the plane-major layout the chunk loop reads
                # ([6B, S], rows c*B+b). Requires so_b >= 0 and
                # so_b + S <= R — the host bases the packed planes at
                # +128 so reset origins (base - 128) are never negative,
                # and sizes R past max(anchor) + S.
                cps = []
                for b in range(B):
                    so_b = pl.multiple_of(
                        jnp.clip(so_v[b, 0], 0, R - Sx), 128)
                    cps.append(pltpu.make_async_copy(
                        yr.at[pl.ds(8 * b, 8), pl.ds(so_b, Sx)],
                        esL.at[pl.ds(8 * b, 8), :], dma_sem.at[3]))
                for cp in cps:
                    cp.start()
                for cp in cps:
                    cp.wait()
                colL = jax.lax.broadcasted_iota(jnp.int32, (128, 8 * B), 1)
                for g0 in range(0, 6 * B, 128):
                    gsz = min(128, 6 * B - g0)
                    gr = g0 + jax.lax.broadcasted_iota(
                        jnp.int32, (128, 8 * B), 0)
                    src = 8 * (gr % B) + gr // B  # es row c*B+b <- 8b+c
                    P = jnp.where(colL == src, 1.0, 0.0)
                    es[g0:g0 + gsz, :] = jax.lax.dot_general(
                        P[0:gsz], esL[:, :], (((1,), (0,)), ((), ())),
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
                return
            # es[:, j] := yr[:, so + j]; so is a multiple of 128 and may be
            # negative (box start: so = base - 128) — chunks with no ring
            # source fill _NEG (always masked by the window tests).
            sd = jnp.concatenate([so_v // 128] * 6, axis=0)  # [6B, 1]
            for c in range(NBx):
                acc = jnp.full((6 * B, CH), _NEG, jnp.float32)
                for k in range(R // CH):
                    acc = jnp.where(sd + c == k,
                                    yr[:, k * CH:(k + 1) * CH], acc)
                es[:, c * CH:(c + 1) * CH] = acc

        @pl.when(pcol == 0)
        def _block_start():
            reset_v = pv(7)
            rs_r = vrows(reset_v) > 0
            rs_l = vlan(reset_v) > 0
            rs_rB = jnp.broadcast_to(rs_r, (BC, 128))
            nso0 = jnp.where(reset_v > 0, pso0_v, so0_v[:, :])
            nso1 = jnp.where(reset_v > 0, pso1_v, so1_v[:, :])
            so0_v[:, :] = nso0
            so1_v[:, :] = nso1
            if "noes" not in _ABL:
                _strip_refresh(es0, y1_ref if STRIP_DMA else yr0, nso0,
                               L1, esL0, S0)
                _strip_refresh(es1, y2_ref if STRIP_DMA else yr1, nso1,
                               L2, esL1, S1)
            # storage wipe + t=0 seed column (strip col 128 == box t0)
            for stx, psx, esx in ((st0, ps0, es0), (st1, ps1, es1)):
                y0 = jnp.full((BC, 1), _NEG, jnp.float32)
                for c in range(A):
                    y0 = jnp.where(
                        rslot == c,
                        vrows(esx[c * B:(c + 1) * B, CH:CH + 1]), y0)
                wiped = jnp.where(rs_r, _NEG, stx[:, :])
                stx[:, :] = wiped
                stx[:, CH:CH + 1] = jnp.where(
                    rs_r & (rslot < A), y0, wiped[:, CH:CH + 1])
                psx[:, :] = jnp.where(rs_r, _NEG, psx[:, :])
            # ancestor maps reset to identity (strips are now current)
            for Am in (Ast0, Aps0, Ast1, Aps1):
                Am[:, :] = jnp.where(rs_rB, rslotF, Am[:, :])
            slot_ok = lane < A
            K1[:, :] = jnp.where(rs_l, jnp.where(slot_ok, lane + 1, 0),
                                 K1[:, :])
            K2[:, :] = jnp.where(rs_l, jnp.where(slot_ok, lane + 1, 0),
                                 K2[:, :])
            PK1[:, :] = jnp.where(rs_l, 0, PK1[:, :])
            PK2[:, :] = jnp.where(rs_l, 0, PK2[:, :])
            CHR[:, :] = jnp.where(rs_l, jnp.where(slot_ok, lane, 0),
                                  CHR[:, :])
            PCH[:, :] = jnp.where(rs_l, -1, PCH[:, :])
            VAL[:, :] = jnp.where(rs_l, jnp.where(slot_ok, 1.0, 0.0),
                                  VAL[:, :])
            SCO[:, :] = jnp.where(rs_l, jnp.where(slot_ok, 0.0, _NEG),
                                  SCO[:, :])
            mx0s[:, :] = jnp.where(rs_r, _NEG, mx0s[:, :])
            mx1s[:, :] = jnp.where(rs_r, _NEG, mx1s[:, :])

        is_main = vlan(jnp.where(stype_v == MAIN, 1.0, 0.0))
        is_swall = vlan(jnp.where((stype_v == MAIN) | (stype_v >= CONT0),
                                  1.0, 0.0))
        is_main_r = vrows(jnp.where(stype_v == MAIN, 1.0, 0.0))
        c0cont_r = vrows(jnp.where(stype_v == CONT0, 1.0, 0.0))
        c1cont_r = vrows(jnp.where(stype_v == CONT1, 1.0, 0.0))

        # ==================================================================
        # winner selection (identical to the general kernel)
        # ==================================================================
        k1 = K1[:, :]
        k2 = K2[:, :]
        pk1 = PK1[:, :]
        pk2 = PK2[:, :]
        chs = CHR[:, :]
        pchs = PCH[:, :]
        val = VAL[:, :]
        sco = SCO[:, :]

        avail = val > 0
        wmatch = jnp.zeros((PB, LN), jnp.float32)
        BIG = jnp.int32(LN + 1)
        chpack = chs | ((pchs + 1) << 8)
        firsts, hass, kw1s, kw2s, pk1s, pk2s, cps = (
            [], [], [], [], [], [], [])
        for w in range(W):
            s_m = jnp.where(avail, sco, _NEG)
            has = jnp.max(jnp.where(avail, 1.0, 0.0), axis=1,
                          keepdims=True) > 0
            m = jnp.max(s_m, axis=1, keepdims=True)
            at_m = avail & (s_m == m)
            first = jnp.min(jnp.where(at_m, lane, BIG), axis=1,
                            keepdims=True)
            oh_w = lane == first

            def pick(x):
                return jnp.sum(jnp.where(oh_w, x, 0), axis=1, keepdims=True)

            kw1 = pick(k1)
            kw2 = pick(k2)
            keq = (k1 == kw1) & (k2 == kw2)
            wmatch = jnp.where(keq & (val > 0) & has, 1.0, wmatch)
            avail = avail & ~keq
            firsts.append(first)
            hass.append(has)
            kw1s.append(kw1)
            kw2s.append(kw2)
            pk1s.append(pick(pk1))
            pk2s.append(pick(pk2))
            cps.append(pick(chpack))

        # ==================================================================
        # MAIN new table (lane layout)
        # ==================================================================
        wofj = jnp.where(lane >= W, (lane - W) // A, lane)
        cofj = jnp.where((lane >= W) & (lane < C), (lane - W) % A, 0)
        is_stay = lane < W
        is_child = (lane >= W) & (lane < C)

        pw_k1 = jnp.zeros((PB, LN), jnp.int32)
        pw_k2 = jnp.zeros((PB, LN), jnp.int32)
        pw_pk1 = jnp.zeros((PB, LN), jnp.int32)
        pw_pk2 = jnp.zeros((PB, LN), jnp.int32)
        pw_cp = jnp.zeros((PB, LN), jnp.int32)
        pw_oki = jnp.zeros((PB, LN), jnp.int32)
        pw_src = jnp.zeros((PB, LN), jnp.int32)
        for w in range(W):
            sel = wofj == w
            selok = sel & hass[w]
            pw_k1 = jnp.where(sel, kw1s[w], pw_k1)
            pw_k2 = jnp.where(sel, kw2s[w], pw_k2)
            pw_pk1 = jnp.where(sel, pk1s[w], pw_pk1)
            pw_pk2 = jnp.where(sel, pk2s[w], pw_pk2)
            pw_cp = jnp.where(sel, cps[w], pw_cp)
            pw_oki = jnp.where(selok, 1, pw_oki)
            pw_src = jnp.where(selok, firsts[w], pw_src)
        pw_ch = pw_cp & 255
        pw_pch = (pw_cp >> 8) - 1
        pw_ok = pw_oki > 0

        ck1 = pw_k1 * _M1 + (cofj + 1)
        ck2 = pw_k2 * _M2 + (cofj + 1)

        nk1 = jnp.where(is_stay, pw_k1, jnp.where(is_child, ck1, 0))
        nk2 = jnp.where(is_stay, pw_k2, jnp.where(is_child, ck2, 0))
        npk1 = jnp.where(is_stay, pw_pk1, jnp.where(is_child, pw_k1, 0))
        npk2 = jnp.where(is_stay, pw_pk2, jnp.where(is_child, pw_k2, 0))
        nch = jnp.where(is_stay, pw_ch, jnp.where(is_child, cofj, 0))
        npch = jnp.where(is_stay, pw_pch, jnp.where(is_child, pw_ch, -1))
        nval = jnp.where((is_stay | is_child) & pw_ok, 1.0, 0.0)

        im = is_main > 0
        fk1 = jnp.where(im, nk1, k1)
        fk2 = jnp.where(im, nk2, k2)
        fpk1 = jnp.where(im, npk1, pk1)
        fpk2 = jnp.where(im, npk2, pk2)
        fch = jnp.where(im, nch, chs)
        fpch = jnp.where(im, npch, pchs)
        fval = jnp.where(im, nval, val)
        K1[:, :] = fk1
        K2[:, :] = fk2
        PK1[:, :] = fpk1
        PK2[:, :] = fpk2
        CHR[:, :] = fch
        PCH[:, :] = fpch
        VAL[:, :] = fval

        sa = is_swall > 0
        swept_f = jnp.where(sa, fval, wmatch * jnp.where(val > 0, 1.0, 0.0))
        swept = swept_f > 0

        BIGL = jnp.int32(LN + 1)

        def rep_rows(x):
            return jnp.repeat(x[:B], CP, axis=0)

        def to_rows(x, default=0):
            return jnp.sum(
                jnp.where(laneB == rslot, rep_rows(x), default),
                axis=1, keepdims=True)

        im_r = is_main_r > 0
        stay_r = rslot < W
        child_r = (rslot >= W) & (rslot < C)
        pw_src_r = to_rows(pw_src)
        pw_ok_r = to_rows(pw_oki)

        m_old = ((rep_rows(k1) == to_rows(nk1))
                 & (rep_rows(k2) == to_rows(nk2))
                 & (rep_rows(val) > 0))
        old_hit_r = jnp.min(jnp.where(m_old, laneB, BIGL), axis=1,
                            keepdims=True)
        oldhit_ok_i = jnp.where(old_hit_r < BIGL, 1, 0)
        nval_i = jnp.where(stay_r | child_r, pw_ok_r, 0)
        hsm_i = jnp.where(stay_r, pw_ok_r, oldhit_ok_i * pw_ok_r)
        src_main_r = jnp.where(
            stay_r, pw_src_r, jnp.minimum(old_hit_r, BIGL - 2))
        src_r = jnp.where(
            im_r, jnp.where((hsm_i > 0) & (nval_i > 0), src_main_r, -1),
            rslot)
        fro_src_r = jnp.where(im_r & child_r & (pw_ok_r > 0), pw_src_r, -1)

        fpk1_r = to_rows(fpk1)
        fpk2_r = to_rows(fpk2)
        mk = (rep_rows(fk1) == fpk1_r) & (rep_rows(fk2) == fpk2_r)
        sweptB = rep_rows(jnp.where(swept, 1, 0))
        fvalB = rep_rows(jnp.where(fval > 0, 1, 0))
        pr = jnp.min(jnp.where(mk & (sweptB > 0), laneB, BIGL), axis=1,
                     keepdims=True)
        pr2 = jnp.min(jnp.where(mk & (fvalB > 0), laneB, BIGL), axis=1,
                      keepdims=True)
        is_root_r = (fpk1_r == 0) & (fpk2_r == 0)
        par_r = jnp.where((pr >= BIGL) | is_root_r, -1, pr)
        par2_r = jnp.where((pr2 >= BIGL) | is_root_r, -1, pr2)

        val_r = to_rows(jnp.where(fval > 0, 1, 0)).astype(jnp.float32)
        sw_r = to_rows(jnp.where(swept, 1, 0)).astype(jnp.float32)
        ch_r = to_rows(fch).astype(jnp.float32)
        root_r = jnp.where(is_root_r, 1.0, 0.0)
        pswept_r = jnp.where(par_r >= 0, 1.0, 0.0)
        psmask_r = jnp.where(par2_r >= 0, 1.0, 0.0)
        is_child_rr = im_r & child_r

        ohP[:, :] = jnp.where((ccol == cloc + src_r) & (src_r >= 0),
                              1.0, 0.0)
        ohFro[:, :] = jnp.where(
            (ccol == cloc + fro_src_r) & (fro_src_r >= 0), 1.0, 0.0)
        # wide (512-row-group) parent one-hot for the hot chunk-loop
        # gathers: 4x fewer MXU launches than 128-groups, and the small
        # payloads ([BC, CH] sweep layers, [BC, 1] seeds) are launch-bound,
        # not FLOP-bound
        GW = 512
        ccolW = jax.lax.broadcasted_iota(jnp.int32, (BC, GW), 1)
        clocW = (rr % GW) // CP * CP
        ohG[:, :] = jnp.where((ccolW == clocW + par_r) & (par_r >= 0),
                              1.0, 0.0)
        ohG2[:, :] = jnp.where((ccol == cloc + par2_r) & (par2_r >= 0),
                               1.0, 0.0)

        def _gatherW(terms):
            hi, mid, lo = terms
            SP = hi.shape[1]
            outs = []
            for g0 in range(0, BC, GW):
                g1 = min(g0 + GW, BC)
                ohg = ohG[g0:g1, 0:g1 - g0].astype(jnp.bfloat16)
                cat = jnp.concatenate(
                    [hi[g0:g1], mid[g0:g1], lo[g0:g1]], axis=1)
                r = _dotb(ohg, cat)
                outs.append((r[:, 0:SP] + r[:, SP:2 * SP])
                            + r[:, 2 * SP:3 * SP])
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)

        def _gather_f32W(x):
            outs = []
            for g0 in range(0, BC, GW):
                g1 = min(g0 + GW, BC)
                outs.append(jax.lax.dot_general(
                    ohG[g0:g1, 0:g1 - g0], x[g0:g1],
                    (((1,), (0,)), ((), ())),
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)

        # ==================================================================
        # hot-window bounds per axis (strip-space chunk indices)
        # ==================================================================
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (BC, 128), 1)

        def hot_bounds(lo_v, hi_v, so_v, NBx):
            wid_v = hi_v - lo_v                           # [B, 1]
            sw_b = wid_v > 0
            hlo_v = jnp.maximum(lo_v - 1 - so_v[:, :], 0) // CH
            hhi_v = jnp.maximum(hi_v - 1 - so_v[:, :], 0) // CH
            c_lo = jnp.minimum(
                jnp.min(jnp.where(sw_b, hlo_v, NBx)), NBx)
            c_hi = jnp.minimum(
                jnp.max(jnp.where(sw_b, hhi_v + 1, 0)), NBx)
            hlo_r = vrows(hlo_v)
            hhi_r = vrows(hhi_v)
            sw_ax_r = vrows(jnp.where(sw_b, 1, 0))
            # per-(row, chunk) hot mask over the 128 map lanes
            hm = ((lane128 >= hlo_r) & (lane128 <= hhi_r)
                  & (sw_ax_r > 0))
            return hlo_r, hhi_r, sw_ax_r, c_lo, c_hi, hm

        hlo0_r, hhi0_r, swax0_r, c_lo0, c_hi0, hm0 = hot_bounds(
            alo_v, ahi_v, so0_v, NB0)
        hlo1_r, hhi1_r, swax1_r, c_lo1, c_hi1, hm1 = hot_bounds(
            blo_v, bhi_v, so1_v, NB1)

        # ==================================================================
        # stage-1 ancestor-map compose (cold chunks only). One gather per
        # 128-row group moves every map's 128-chunk payload through this
        # step's src permute; a second carries the child-creation (ohFro)
        # lineage. Map values are small ints (-1 dead, 0..31 same-array
        # row, 64+r st-sourced row) — exact in bf16.
        # ==================================================================
        any_main = jnp.max(is_main_r) > 0

        @pl.when(any_main if "nomaps" not in _ABL else (i < 0))
        def _compose():
            G = 128
            srcs, fros = [], []
            for g0 in range(0, BC, G):
                g1 = g0 + G
                OH = jnp.concatenate(
                    [ohP[g0:g1, :].astype(jnp.bfloat16),
                     ohFro[g0:g1, :].astype(jnp.bfloat16)], axis=0)
                X = jnp.concatenate(
                    [Ast0[g0:g1, :], Aps0[g0:g1, :],
                     Ast1[g0:g1, :], Aps1[g0:g1, :]],
                    axis=1).astype(jnp.bfloat16)
                R = _dotb(OH, X)
                srcs.append(R[0:G])
                fros.append(R[G:2 * G])

            def _cat(parts):
                return parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=0)

            Rsrc = _cat(srcs)
            Rfro = _cat(fros)
            for ax, (Ast, Aps, hm) in enumerate(
                    ((Ast0, Aps0, hm0), (Ast1, Aps1, hm1))):
                s_Ast = Rsrc[:, 256 * ax:256 * ax + 128]
                s_Aps = Rsrc[:, 256 * ax + 128:256 * ax + 256]
                f_Ast = Rfro[:, 256 * ax:256 * ax + 128]
                nAst = jnp.where(src_r >= 0, s_Ast, -1.0)
                fr_anc = jnp.where(f_Ast < 0, -1.0, f_Ast + 64.0)
                mid = jnp.where(
                    val_r > 0,
                    jnp.where(is_child_rr, fr_anc, s_Aps), -1.0)
                Ast[:, :] = jnp.where(hm, Ast[:, :], nAst)
                Aps[:, :] = jnp.where(hm, Aps[:, :], mid)

        # ==================================================================
        # per-axis sweep: pending-map apply, shared hot permute, seeds,
        # windowed chunk loop, hot ps refresh
        # ==================================================================
        liC = jax.lax.broadcasted_iota(jnp.int32, (BC, CH), 1)

        def sweep_axis(st, ps, es, Ast, Aps, lo_v, hi_v, so_v,
                       hlo_r, hhi_r, swax_r, c_lo, c_hi, hm,
                       Sx, HOTW):
            NBx = Sx // CH
            so = so_v[:, :]
            lo_r = vrows(lo_v)
            hi_r = vrows(hi_v)
            so_r = vrows(so)
            # static extent-bucket ladder: the per-step hot union extent is
            # tiny almost always (p99 = 4 chunks on real pairs with split
            # windows) but spikes when one lane crosses a degenerate
            # transposed-envelope region — so the narrow slice code runs
            # ~99% of steps and the wide slices are compiled-but-rare
            ladder = tuple(sorted({min(512, HOTW), min(1024, HOTW), HOTW}))
            ext_ch = (c_hi - jnp.minimum(c_lo, c_hi)) * CH

            def for_buckets(site):
                for bi, Wb in enumerate(ladder):
                    pred = ext_ch <= Wb
                    if bi > 0:
                        pred = pred & (ext_ch > ladder[bi - 1])

                    @pl.when(pred)
                    def _s(Wb=Wb):
                        c_off = pl.multiple_of(
                            jnp.minimum(c_lo * CH, Sx - Wb), 128)
                        liH = jax.lax.broadcasted_iota(
                            jnp.int32, (BC, Wb), 1)
                        chH = c_off // CH + liH // CH
                        hmW = ((chH >= hlo_r) & (chH <= hhi_r)
                               & (swax_r > 0))
                        site(Wb, c_off, liH, hmW)

            # ---- pending-map apply for chunks entering the hot window.
            # Rare (windows advance a chunk every ~200 steps/lane), so the
            # gathers sit under a pl.when on an any-pending scalar.
            def prep_chunk(kc, carry):
                kk = pl.multiple_of(jnp.minimum(kc * CH, Sx - CH), 128)
                hotk = ((kc >= hlo_r) & (kc <= hhi_r) & (swax_r > 0))
                a_st = jnp.sum(
                    jnp.where(lane128 == kc, Ast[:, :], 0.0),
                    axis=1, keepdims=True)
                a_ps = jnp.sum(
                    jnp.where(lane128 == kc, Aps[:, :], 0.0),
                    axis=1, keepdims=True)
                pend = hotk & ((a_st != rslot.astype(jnp.float32))
                               | (a_ps != rslot.astype(jnp.float32)))

                @pl.when(jnp.max(jnp.where(pend, 1, 0)) > 0)
                def _apply():
                    st_old = st[:, pl.ds(kk, CH)]
                    ps_old = ps[:, pl.ds(kk, CH)]
                    ai_st = a_st.astype(jnp.int32)
                    ai_ps = a_ps.astype(jnp.int32)
                    oh_a = jnp.where(
                        (ccol == cloc + ai_st) & (ai_st >= 0), 1.0, 0.0)
                    new_st = _gather(oh_a, _split3(st_old), BC)
                    oh_pp = jnp.where(
                        (ccol == cloc + ai_ps) & (ai_ps >= 0)
                        & (ai_ps < 64), 1.0, 0.0)
                    oh_pt = jnp.where(
                        (ccol == cloc + (ai_ps - 64)) & (ai_ps >= 64),
                        1.0, 0.0)
                    v_ps = _gather(oh_pp, _split3(ps_old), BC)
                    v_st = _gather(oh_pt, _split3(st_old), BC)
                    new_ps = jnp.where(ai_ps >= 64, v_st, v_ps)
                    st[:, pl.ds(kk, CH)] = jnp.where(
                        hotk, jnp.where(ai_st >= 0, new_st, _NEG), st_old)
                    ps[:, pl.ds(kk, CH)] = jnp.where(
                        hotk, jnp.where(ai_ps >= 0, new_ps, _NEG), ps_old)
                return carry

            if "nomaps" not in _ABL:
                jax.lax.fori_loop(c_lo, c_hi, prep_chunk, 0)
            # hot chunks are now physically current: maps -> identity
            Ast[:, :] = jnp.where(hm, rslotF, Ast[:, :])
            Aps[:, :] = jnp.where(hm, rslotF, Aps[:, :])

            # ---- shared hot permute (this step's src, all hot chunks) ----
            def _permute_site(Wb, c_off, liH, hmW):
                @pl.when(any_main)
                def _permute_hot():
                    stv = st[:, pl.ds(c_off, Wb)]
                    psv = ps[:, pl.ds(c_off, Wb)]
                    st_t = _split3(stv)
                    ps_t = _split3(psv)
                    G = 128
                    pst_l, pps_l, fst_l = [], [], []
                    for g0 in range(0, BC, G):
                        g1 = min(g0 + G, BC)
                        gsz = g1 - g0
                        OH = jnp.concatenate(
                            [ohP[g0:g1, 0:gsz].astype(jnp.bfloat16),
                             ohFro[g0:g1, 0:gsz].astype(jnp.bfloat16)],
                            axis=0)
                        X = jnp.concatenate(
                            [t[g0:g1] for t in st_t]
                            + [t[g0:g1] for t in ps_t],
                            axis=1)
                        R = _dotb(OH, X)

                        def s3(rows, c0):
                            return ((rows[:, c0:c0 + Wb]
                                     + rows[:, c0 + Wb:c0 + 2 * Wb])
                                    + rows[:, c0 + 2 * Wb:c0 + 3 * Wb])

                        pst_l.append(s3(R[0:gsz], 0))
                        pps_l.append(s3(R[0:gsz], 3 * Wb))
                        fst_l.append(s3(R[gsz:2 * gsz], 0))

                    def _cat(parts):
                        return parts[0] if len(parts) == 1 else (
                            jnp.concatenate(parts, axis=0))

                    fr_beam = _cat(pps_l)
                    fr_child = _cat(fst_l)
                    newfr = jnp.where(is_child_rr, fr_child, fr_beam)
                    new_st = jnp.where(src_r >= 0, _cat(pst_l), _NEG)
                    new_ps = jnp.where(val_r > 0, newfr, _NEG)
                    st[:, pl.ds(c_off, Wb)] = jnp.where(hmW, new_st, stv)
                    ps[:, pl.ds(c_off, Wb)] = jnp.where(hmW, new_ps, psv)

            if "noperm" not in _ABL:
                for_buckets(_permute_site)

            # ---- seeds: own storage value at lo-1 (hot slice only) ----
            def _seed_site(Wb, c_off, liH, hmW):
                tposH = so_r + c_off + liH
                seeds[:, :] = jnp.max(
                    jnp.where(tposH == lo_r - 1, st[:, pl.ds(c_off, Wb)],
                              _NEG),
                    axis=1, keepdims=True)

            for_buckets(_seed_site)
            seeds[:, :] = jnp.where(sw_r > 0, seeds[:, :], _NEG)
            mx[:, :] = jnp.full((BC, 1), _NEG, jnp.float32)

            def chunk(kc, carry):
                kk = pl.multiple_of(jnp.minimum(kc * CH, Sx - CH), 128)
                kkp = pl.multiple_of(jnp.maximum(kk - CH, 0), 128)

                em = jnp.full((BC, CH), _NEG, jnp.float32)
                for c in range(A):
                    emc = jnp.repeat(
                        es[c * B:(c + 1) * B, pl.ds(kk, CH)], CP, axis=0)
                    em = jnp.where(ch_r == float(c), emc, em)
                gap = jnp.repeat(
                    es[A * B:(A + 1) * B, pl.ds(kk, CH)], CP, axis=0)
                rootv = jnp.repeat(
                    es[(A + 1) * B:(A + 2) * B, pl.ds(kk, CH)], CP, axis=0)

                fA = ps[:, pl.ds(kkp, CH)]
                fB = ps[:, pl.ds(kk, CH)]
                fcat = jnp.concatenate([fA, fB], axis=1)
                fro = jax.lax.slice_in_dim(fcat, CH - 1, 2 * CH - 1, axis=1)
                old = st[:, pl.ds(kk, CH)]
                t_abs = so_r + kk + liC

                in_m = jnp.where(
                    (t_abs >= lo_r) & (t_abs < hi_r) & (sw_r > 0), 1.0, 0.0)
                fro_pos = t_abs - 1 - so_r
                fro = jnp.where((fro_pos >= 0) & (fro_pos < Sx - CH),
                                fro, _NEG)
                ext = jnp.where(root_r > 0, rootv, fro)

                gapm = jnp.where(in_m > 0, gap, 0.0)
                cg = gapm
                sh = 1
                while sh < CH:
                    cg = cg + jnp.where(liC >= sh, pltpu.roll(cg, sh, 1),
                                        0.0)
                    sh *= 2

                sd = seeds[:, :]
                pseed = _gather_f32W(sd)

                def layer(par):
                    parsh = pltpu.roll(par, 1, 1)
                    parsh = jnp.where(liC == 0, pseed, parsh)
                    parsh = jnp.where(t_abs == lo_r, pseed, parsh)
                    pvv = jnp.where(pswept_r > 0, parsh, ext)
                    E = jnp.where(in_m > 0, pvv + em, _NEG)
                    X = E - cg
                    run = X
                    sh = 1
                    while sh < CH:
                        prev = jnp.where(liC >= sh,
                                         pltpu.roll(run, sh, 1), _NEG)
                        run = jnp.logaddexp(run, prev)
                        sh *= 2
                    pfull = cg + jnp.logaddexp(run, sd)
                    return jnp.where(in_m > 0, pfull, _NEG)

                m = layer(jnp.broadcast_to(
                    jnp.where(pswept_r > 0, _NEG, 0.0), (BC, CH)))

                def layer_body(_l, mm):
                    return layer(_gatherW(_split3(mm)))

                m = jax.lax.fori_loop(1, n_layers, layer_body, m)

                merged = jnp.where(in_m > 0, m, old)
                st[:, pl.ds(kk, CH)] = merged

                mx[:, :] = jnp.maximum(
                    mx[:, :], jnp.max(jnp.where(in_m > 0, m, _NEG), axis=1,
                                      keepdims=True))
                last_t_r = so_r + kk + CH - 1
                last_ok = (sw_r > 0) & (last_t_r >= lo_r) & (last_t_r < hi_r)
                seeds[:, :] = jnp.where(last_ok, m[:, CH - 1:CH],
                                        seeds[:, :])
                return carry

            jax.lax.fori_loop(c_lo, c_hi, chunk, 0)

            # ---- hot ps refresh (cold chunks ride the stage-2 maps) ----
            def _refresh_site(Wb, c_off, liH, hmW):
                pp = _gather(ohG2, _split3(st[:, pl.ds(c_off, Wb)]), BC)
                ps[:, pl.ds(c_off, Wb)] = jnp.where(
                    hmW & (psmask_r > 0), pp, ps[:, pl.ds(c_off, Wb)])

            if "norefresh" not in _ABL:
                for_buckets(_refresh_site)

        # ---- dynamic layer count: exact row-space parent-chain depth ----
        # Same computation as the general kernel (pallas_pair_beam_batch
        # :751-757): iterate the sweep's own parent one-hot (ohG) so a
        # swept row whose parent key is held only by a *child* row (prefix
        # s = w+c+d: parent(s) is the child (w, c), not a winner) still
        # counts its full chain. Depth values <= W+1 are exact in bf16.
        dvec = jnp.ones((BC, 1), jnp.float32)
        for _ in range(LAYERS - 1):
            pdl = []
            for g0 in range(0, BC, GW):
                g1 = min(g0 + GW, BC)
                pdl.append(_dotb(ohG[g0:g1, 0:g1 - g0].astype(jnp.bfloat16),
                                 dvec[g0:g1].astype(jnp.bfloat16)))
            pd = pdl[0] if len(pdl) == 1 else jnp.concatenate(pdl, 0)
            dvec = jnp.where(pswept_r > 0, 1.0 + pd, 1.0)
        dvec = jnp.where(sw_r > 0, dvec, 0.0)
        n_layers = jnp.minimum(
            jnp.max(dvec).astype(jnp.int32), LAYERS)
        if "nolayers" in _ABL:
            n_layers = 1

        if "nosweep" not in _ABL:
            sweep_axis(st0, ps0, es0, Ast0, Aps0, alo_v, ahi_v, so0_v,
                       hlo0_r, hhi0_r, swax0_r, c_lo0, c_hi0, hm0, S0,
                       HOTW0)
        # per-axis window maxes persist across CONT parts (general-kernel
        # semantics): MAIN resets, CONT0/CONT1 accumulate their axis
        mx0s[:, :] = jnp.where(
            is_main_r > 0, mx[:, :],
            jnp.where(c0cont_r > 0, jnp.maximum(mx0s[:, :], mx[:, :]),
                      mx0s[:, :]))
        if "nosweep" not in _ABL:
            sweep_axis(st1, ps1, es1, Ast1, Aps1, blo_v, bhi_v, so1_v,
                       hlo1_r, hhi1_r, swax1_r, c_lo1, c_hi1, hm1, S1,
                       HOTW1)
        mx1s[:, :] = jnp.where(
            is_main_r > 0, mx[:, :],
            jnp.where(c1cont_r > 0, jnp.maximum(mx1s[:, :], mx[:, :]),
                      mx1s[:, :]))

        # ---- stage-2 cold ps-map refresh compose: eager `_rf` semantics
        # (ps[r] <- st[par2(r)] wherever the parent key is alive) carried
        # into the ancestor maps for every non-hot chunk. One gather of
        # both axes' st-maps by the parent one-hot.
        G = 128
        t_l = []
        for g0 in (() if "nomaps" in _ABL else range(0, BC, G)):
            g1 = g0 + G
            Xc = jnp.concatenate(
                [Ast0[g0:g1, :], Ast1[g0:g1, :]],
                axis=1).astype(jnp.bfloat16)
            t_l.append(_dotb(ohG2[g0:g1, :].astype(jnp.bfloat16), Xc))
        Tg = (jnp.zeros((BC, 256), jnp.float32) if not t_l else
              t_l[0] if len(t_l) == 1 else jnp.concatenate(t_l, axis=0))
        for ax, (Aps, hm) in (
                () if "nomaps" in _ABL else
                enumerate(((Aps0, hm0), (Aps1, hm1)))):
            ta = Tg[:, 128 * ax:128 * ax + 128]
            tagged = jnp.where(ta < 0, -1.0, ta + 64.0)
            Aps[:, :] = jnp.where(
                (~hm) & (psmask_r > 0), tagged, Aps[:, :])

        # ---- block-end storage eviction: vectorized chunk-select shift
        # (ancestor maps shift chunk-for-chunk with the strips; shifted-in
        # chunks are freshly _NEG so identity maps are correct for them)
        @pl.when((pcol == 127) if "noshift" not in _ABL else (i < 0))
        def _shift():
            for stx, psx, Astx, Apsx, so_v, pso_v, Sx in (
                    (st0, ps0, Ast0, Aps0, so0_v, pso0_v, S0),
                    (st1, ps1, Ast1, Aps1, so1_v, pso1_v, S1)):
                NBx = Sx // CH
                ns = jnp.maximum(so_v[:, :], pso_v)
                d_v = (ns - so_v[:, :]) // 128
                d_r = vrows(d_v)
                for ref in (stx, psx):
                    for j in range(NBx):
                        acc = jnp.full((BC, CH), _NEG, jnp.float32)
                        for k in range(NBx - j):
                            acc = jnp.where(
                                d_r == k,
                                ref[:, (j + k) * CH:(j + k + 1) * CH], acc)
                        ref[:, j * CH:(j + 1) * CH] = acc
                for Am in (Astx, Apsx):
                    acc = rslotF
                    for k in range(NBx):
                        rolled = pltpu.roll(Am[:, :], (128 - k) % 128, 1)
                        rolled = jnp.where(lane128 < NBx - k, rolled,
                                           rslotF)
                        acc = jnp.where(d_r == k, rolled, acc)
                    Am[:, :] = acc
                so_v[:, :] = so_v[:, :] + d_v * 128

        # ---- scores: [BC,1] -> [PB,LN] block-ones matmul. The mask has
        # exactly one nonzero source per (pair, lane) column, and HIGHEST
        # f32 splits the payload exactly, so this is an exact relayout.
        tot_r = mx0s[:, :] + mx1s[:, :]
        X = jnp.where(laneB == rslot, jnp.broadcast_to(tot_r, (BC, LN)),
                      0.0)
        outs = []
        GS = 512
        PG = GS // CP  # pairs per group
        for g0 in range(0, BC, GS):
            g1 = min(g0 + GS, BC)
            M = jnp.where(
                (jax.lax.broadcasted_iota(jnp.int32, (PG, GS), 1) // CP)
                == jax.lax.broadcasted_iota(jnp.int32, (PG, GS), 0),
                1.0, 0.0)[:, 0:g1 - g0]
            outs.append(_dotx(M[0:(g1 - g0) // CP], X[g0:g1]))
        sc_lanes = outs[0] if len(outs) == 1 else jnp.concatenate(
            outs, axis=0)
        new_sco = jnp.where((fval > 0) & (lane < C), sc_lanes, _NEG)
        SCO[:, :] = jnp.where(sa, new_sco, sco)

        # ---- provenance (verbatim packing) ----
        packed = vlan(jnp.minimum(stype_v, 3))
        for w in range(W):
            wv = jnp.where(hass[w], firsts[w], -1)
            packed = packed | ((wv + 1) << (2 + 6 * w))
        pv_s[:, :] = jnp.where(lane == i % 128, packed, pv_s[:, :])

        @pl.when((i % 128 == 127) | (i == NTOT - 1))
        def _flush_prov():
            cp = pltpu.make_async_copy(
                pv_s, prov_ref.at[pl.ds((i // 128) * PB, PB), :],
                dma_sem.at[3])
            cp.start()
            cp.wait()

    return kernel, C, CP, PB, BC


@partial(jax.jit,
         static_argnames=("B", "W", "A", "L1", "L2", "K", "N", "S0", "S1",
                          "HOTW0", "HOTW1", "STRIP_DMA"))
def _run_kernel(y1p, y2p, plan_mat, B: int, W: int, A: int,
                L1: int, L2: int, K: int, N: int, S0: int = S, S1: int = S,
                HOTW0: int = S, HOTW1: int = S,
                STRIP_DMA: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # grid=(N // K): a non-dividing K would silently drop the last
    # N % K steps — a tail box's FIN step (ADVICE r3)
    assert N % K == 0, f"steps_per_grid {K} must divide padded plan {N}"
    kernel, C, CP, PB, BC = _build_kernel(
        B, W, A, L1, L2, K, N, S0=S0, S1=S1, HOTW0=HOTW0, HOTW1=HOTW1,
        STRIP_DMA=STRIP_DMA)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // K,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((BC, S0), jnp.float32),   # st0
            pltpu.VMEM((BC, S0), jnp.float32),   # ps0
            pltpu.VMEM((BC, S1), jnp.float32),   # st1
            pltpu.VMEM((BC, S1), jnp.float32),   # ps1
            pltpu.VMEM((PB, 128), jnp.int32),    # K1
            pltpu.VMEM((PB, 128), jnp.int32),    # K2
            pltpu.VMEM((PB, 128), jnp.int32),    # PK1
            pltpu.VMEM((PB, 128), jnp.int32),    # PK2
            pltpu.VMEM((PB, 128), jnp.int32),    # CHR
            pltpu.VMEM((PB, 128), jnp.int32),    # PCH
            pltpu.VMEM((PB, 128), jnp.float32),  # VAL
            pltpu.VMEM((PB, 128), jnp.float32),  # SCO
            pltpu.VMEM((BC, 128), jnp.float32),  # ohP
            pltpu.VMEM((BC, 128), jnp.float32),  # ohFro
            pltpu.VMEM((BC, 512), jnp.float32),  # ohG (512-row groups)
            pltpu.VMEM((BC, 128), jnp.float32),  # ohG2
            pltpu.VMEM((BC, 128), jnp.float32),  # Ast0 (ancestor maps)
            pltpu.VMEM((BC, 128), jnp.float32),  # Aps0
            pltpu.VMEM((BC, 128), jnp.float32),  # Ast1
            pltpu.VMEM((BC, 128), jnp.float32),  # Aps1
            pltpu.VMEM((BC, 1), jnp.float32),    # seeds
            pltpu.VMEM((BC, 1), jnp.float32),    # mx0s
            pltpu.VMEM((BC, 1), jnp.float32),    # mx
            pltpu.VMEM((BC, 1), jnp.float32),    # mx1s
            pltpu.VMEM((B, 1), jnp.int32),       # so0_v
            pltpu.VMEM((B, 1), jnp.int32),       # so1_v
            pltpu.VMEM((6 * B, S0), jnp.float32),  # es0
            pltpu.VMEM((6 * B, S1), jnp.float32),  # es1
            # packed planes stay in HBM in STRIP_DMA mode (the refresh
            # DMAs slice them per lane); box mode stages them in VMEM
            pltpu.VMEM((8, 128) if STRIP_DMA else (6 * B, L1),
                       jnp.float32),              # yr0
            pltpu.VMEM((8, 128) if STRIP_DMA else (6 * B, L2),
                       jnp.float32),              # yr1
            # lane-major staging strips for the DMA refresh
            pltpu.VMEM((8 * B, S0) if STRIP_DMA else (8, 128),
                       jnp.float32),              # esL0
            pltpu.VMEM((8 * B, S1) if STRIP_DMA else (8, 128),
                       jnp.float32),              # esL1
            pltpu.VMEM((8 * B, 128), jnp.int32),   # plan_v
            pltpu.VMEM((PB, 128), jnp.int32),      # pv_s
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    (prov,) = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((((N + 127) // 128) * PB, 128), jnp.int32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=112 * 1024 * 1024,
        ),
    )(y1p, y2p, plan_mat)
    return prov


# ==========================================================================
# host side: packing, launch, traceback
# ==========================================================================

def _pack_plane6(y: np.ndarray) -> np.ndarray:
    """[T, A+1] log-probs -> [6, T+1] plane rows (chars, gap, cum-gap)."""
    T, Sy = y.shape
    plane = np.full((6, T + 1), _NEG, np.float32)
    plane[:Sy, :T] = y.T.astype(np.float32)
    cum = np.cumsum(y[:, -1]).astype(np.float32)
    plane[Sy, 0] = 0.0
    plane[Sy, 1:T + 1] = cum
    return plane


def _al(x: int) -> int:
    return ((x + 127) // 128) * 128


def prepare_box(y1, y2, envelope, cap: int = 256, smax: int = SMAX):
    """Per-box host prep: plan (+FIN, padded), anchors, spans.

    Returns None when the box needs more live span than ``smax`` (the
    kernel's static storage strip minus slack) — the caller routes those
    through the general kernel or retries with a larger strip. cap=None
    skips wide-window splitting (used when the strip is sized to the
    unsplit spans)."""
    y1 = np.asarray(y1)
    y2 = np.asarray(y2)
    U, V = len(y1), len(y2)
    env = np.asarray(envelope, dtype=np.int64)[:U]
    from .beam2d_planned import build_plan
    p = build_plan(env, U, V)
    if cap is not None:
        p = _split_wide(p, cap=cap)
    n = len(p["type"])
    # FIN: zero-width MAIN — winner 0 of its provenance word is the argmax
    # of the final table, so no score fetch is needed
    arr = np.zeros((5, n + 1), np.int32)
    arr[0, :n] = p["type"]
    arr[1, :n] = p["a_lo"]
    arr[2, :n] = p["a_hi"]
    arr[3, :n] = p["b_lo"]
    arr[4, :n] = p["b_hi"]
    arr[0, n] = MAIN
    np_len = _al(n + 1)
    pad = np.zeros((5, np_len - (n + 1)), np.int32)
    pad[0, :] = C0RUN
    arr = np.concatenate([arr, pad], axis=1)
    pp = dict(type=arr[0], a_lo=arr[1], a_hi=arr[2], b_lo=arr[3],
              b_hi=arr[4])
    sm0, sm1 = _plan_anchors(pp)
    s0, s1 = _plan_spans(pp, sm0, sm1)
    if max(s0, s1) + 2 > smax:
        return None
    return dict(plan=arr, sm0=sm0.astype(np.int32), sm1=sm1.astype(np.int32),
                fin=n, n=np_len, y1=y1, y2=y2, U=U, V=V,
                span=(s0, s1))


# VMEM budget for one launch (the kernel's vmem_limit is 112 MB; leave
# headroom for Mosaic's own allocations)
_VMEM_BUDGET = 100 * 1024 * 1024


def _vmem_est(B: int, L1: int, L2: int, S0: int = S, S1: int = S,
              strip_dma: bool = False) -> int:
    """Scratch bytes the kernel will request (mirrors _run_kernel's
    scratch_shapes; ADVICE r3: yr0/yr1 grow with the packed lane length
    and must be guarded against the VMEM budget)."""
    CP = 32
    BC, PB = B * CP, B
    b = 2 * BC * (S0 + S1) * 4               # st0 ps0 st1 ps1
    b += 8 * PB * 128 * 4                    # K1..SCO
    b += (3 * BC * 128 + BC * 512) * 4       # ohP ohFro ohG2 + ohG
    b += 4 * BC * 128 * 4                    # ancestor maps
    b += 4 * BC * 4 + 2 * B * 4              # seeds/mx*/so vecs
    b += 6 * B * (S0 + S1) * 4               # es0 es1
    if strip_dma:
        b += 8 * B * (S0 + S1) * 4           # esL staging (planes in HBM)
    else:
        b += 6 * B * (L1 + L2) * 4           # yr0 yr1 (VMEM planes)
    b += 8 * B * 128 * 4 + PB * 128 * 4      # plan_v pv_s
    return b


def _hot_need(plan_mat: np.ndarray, B: int, NB0: int, NB1: int,
              reset_free: bool = True):
    """Exact lockstep simulation of the kernel's per-step hot-chunk range
    [c_lo, c_hi) across all lanes; returns the max extent per axis (in
    chunks). Only valid for launches without mid-lane resets (full-pair
    mode: one reset per lane at step 0)."""
    t = plan_mat[0 * B:1 * B].astype(np.int64)
    N = t.shape[1]
    out = []
    for rows, NBx, skip in (((1, 2, 5), NB0, C1RUN), ((3, 4, 6), NB1,
                                                      C0RUN)):
        lo = plan_mat[rows[0] * B:(rows[0] + 1) * B].astype(np.int64)
        hi = plan_mat[rows[1] * B:(rows[1] + 1) * B].astype(np.int64)
        sm = plan_mat[rows[2] * B:(rows[2] + 1) * B].astype(np.int64)
        sw = (t != skip) & (hi > lo)
        so = np.empty((B, N), np.int64)
        cur = sm[:, 0].copy()  # reset origin at lane col 0
        for k0 in range(0, N, 128):
            k1 = min(k0 + 128, N)
            so[:, k0:k1] = cur[:, None]
            cur = np.maximum(cur, sm[:, k1 - 1])
        hlo = np.where(sw, np.maximum(lo - 1 - so, 0) // 128, NBx)
        hhi = np.where(sw, np.maximum(hi - 1 - so, 0) // 128 + 1, 0)
        c_lo = np.minimum(hlo.min(axis=0), NBx)
        c_hi = np.minimum(hhi.max(axis=0), NBx)
        out.append(int(np.maximum(c_hi - np.minimum(c_lo, c_hi), 0).max()))
    return out[0], out[1]


def box_beam_pallas(boxes, beam_width: int = 5, alphabet: str = "ACGT",
                    B: int = 64, steps_per_grid: int = 2,
                    prepared=None):
    """Decode many (y1, y2, envelope) anchor boxes in one segmented
    launch. Returns (seqs, overflow_idx): seqs[i] is the consensus for
    box i or None when its span overflows the static strip (overflow
    indices are also listed separately for the caller to reroute).
    Workloads whose packed emission planes would blow the VMEM budget are
    split into multiple launches transparently."""
    W = beam_width
    A = len(alphabet)
    n = len(boxes)
    seqs = [None] * n
    preps = []
    overflow = []
    for idx, (y1, y2, env) in enumerate(boxes):
        pb = (prepared[idx] if prepared is not None
              else prepare_box(y1, y2, env))
        if pb is None:
            overflow.append(idx)
        else:
            preps.append((idx, pb))
    if not preps:
        return seqs, overflow

    # VMEM guard: estimate the packed plane length at this B. The longest
    # single box floors the lane length regardless of B (L is pow2 of the
    # max lane), so when the estimate blows the budget, first shrink B
    # (st/ps strips scale with B); only split the box set when even B=16
    # cannot fit.
    def pow2(x, lo=1024):
        v = lo
        while v < x:
            v *= 2
        return v

    def est_for(Bq):
        tot1 = sum(_al(pb["U"] + 2) for _, pb in preps)
        tot2 = sum(_al(pb["V"] + 2) for _, pb in preps)
        m1 = max(_al(pb["U"] + 2) for _, pb in preps)
        m2 = max(_al(pb["V"] + 2) for _, pb in preps)
        return _vmem_est(Bq, pow2(max(tot1 // Bq + 512, m1)),
                         pow2(max(tot2 // Bq + 512, m2)))

    B = max(8, min(B, ((len(preps) + 7) // 8) * 8))
    while B > 16 and est_for(B) > _VMEM_BUDGET:
        B -= 16
    if est_for(B) > _VMEM_BUDGET and len(preps) > 1:
        mid = len(preps) // 2
        for sub in (preps[:mid], preps[mid:]):
            sub_seqs, sub_over = box_beam_pallas(
                [boxes[idx] for idx, _ in sub], beam_width=beam_width,
                alphabet=alphabet, B=B, steps_per_grid=steps_per_grid,
                prepared=[pb for _, pb in sub])
            for (idx, _), s in zip(sub, sub_seqs):
                seqs[idx] = s
            overflow.extend(sub[j][0] for j in sub_over)
        return seqs, sorted(overflow)
    # LPT bin-packing on padded plan length
    order = sorted(range(len(preps)), key=lambda i: -preps[i][1]["n"])
    lanes = [[] for _ in range(B)]
    loads = np.zeros(B, np.int64)
    for i in order:
        b = int(np.argmin(loads))
        lanes[b].append(i)
        loads[b] += preps[i][1]["n"]

    N = _al(int(loads.max()))
    N_pad = ((N + 511) // 512) * 512
    K = steps_per_grid
    if N_pad % K:  # pad with zero-width no-ops so grid=(N//K) drops nothing
        N_pad = ((N_pad + K - 1) // K) * K
    # per-lane emission bases
    el1 = np.zeros(B, np.int64)
    el2 = np.zeros(B, np.int64)
    placed = []  # (prep_i, lane, step0, base1, base2)
    for b in range(B):
        st = 0
        for i in lanes[b]:
            pb = preps[i][1]
            placed.append((i, b, st, int(el1[b]), int(el2[b])))
            st += pb["n"]
            el1[b] += _al(pb["U"] + 2)
            el2[b] += _al(pb["V"] + 2)

    def bucket_pow2(x, lo=1024):
        v = lo
        while v < x:
            v *= 2
        return v

    L1 = bucket_pow2(int(el1.max()) if len(placed) else 1024)
    L2 = bucket_pow2(int(el2.max()) if len(placed) else 1024)

    # hard post-packing check: if the exact lane lengths still blow the
    # budget (LPT imbalance the estimate missed), split and retry
    if _vmem_est(B, L1, L2) > _VMEM_BUDGET and len(preps) > 1:
        mid = len(preps) // 2
        for sub in (preps[:mid], preps[mid:]):
            sub_seqs, sub_over = box_beam_pallas(
                [boxes[idx] for idx, _ in sub], beam_width=beam_width,
                alphabet=alphabet, B=B, steps_per_grid=steps_per_grid,
                prepared=[pb for _, pb in sub])
            for (idx, _), s in zip(sub, sub_seqs):
                seqs[idx] = s
            overflow.extend(sub[j][0] for j in sub_over)
        return seqs, sorted(overflow)

    y1p = np.full((6 * B, L1), _NEG, np.float32)
    y2p = np.full((6 * B, L2), _NEG, np.float32)
    plan_mat = np.zeros((8 * B, N_pad), np.int32)
    # default padding: zero-width catch runs (exact no-ops)
    plan_mat[0 * B:1 * B, :] = C0RUN
    # every lane col 0 needs a valid reset (origin -128) even if empty
    plan_mat[7 * B:8 * B, 0] = 1
    plan_mat[5 * B:6 * B, 0] = -128
    plan_mat[6 * B:7 * B, 0] = -128

    for i, b, st, b1, b2 in placed:
        pb = preps[i][1]
        nn = pb["n"]
        sl = slice(st, st + nn)
        plan_mat[0 * B + b, sl] = pb["plan"][0]
        plan_mat[1 * B + b, sl] = pb["plan"][1] + np.where(
            pb["plan"][2] > pb["plan"][1], b1, 0)
        plan_mat[2 * B + b, sl] = pb["plan"][2] + np.where(
            pb["plan"][2] > pb["plan"][1], b1, 0)
        plan_mat[3 * B + b, sl] = pb["plan"][3] + np.where(
            pb["plan"][4] > pb["plan"][3], b2, 0)
        plan_mat[4 * B + b, sl] = pb["plan"][4] + np.where(
            pb["plan"][4] > pb["plan"][3], b2, 0)
        plan_mat[5 * B + b, sl] = pb["sm0"] + b1
        plan_mat[6 * B + b, sl] = pb["sm1"] + b2
        plan_mat[7 * B + b, st] = 1
        plan_mat[5 * B + b, st] = b1 - 128
        plan_mat[6 * B + b, st] = b2 - 128
        p1 = _pack_plane6(pb["y1"])
        p2 = _pack_plane6(pb["y2"])
        y1p[np.arange(6) * B + b, b1:b1 + p1.shape[1]] = p1
        y2p[np.arange(6) * B + b, b2:b2 + p2.shape[1]] = p2
        # carry anchors through trailing padding of the lane
        if st + nn == loads[b]:
            plan_mat[5 * B + b, st + nn:] = pb["sm0"][-1] + b1
            plan_mat[6 * B + b, st + nn:] = pb["sm1"][-1] + b2

    prov = _run_kernel(jnp.asarray(y1p), jnp.asarray(y2p),
                       jnp.asarray(plan_mat), B, W, A, L1, L2,
                       K=steps_per_grid, N=N_pad)
    prov = np.asarray(prov).reshape(-1, B, 128)
    for i, b, st, b1, b2 in placed:
        pb = preps[i][1]
        words = prov[:, b, :].reshape(-1)
        seqs[preps[i][0]] = _traceback_box(
            words, st, st + pb["fin"], W, A, alphabet)
    return seqs, overflow


def _traceback_box(words: np.ndarray, start: int, fin: int,
                   W: int, A: int, alphabet: str) -> str:
    """Walk packed provenance from the box's FIN step down to its first
    step. FIN is a zero-width MAIN: after it, slot 0 is the argmax
    candidate, so the walk starts at j=0 from the FIN word itself."""
    j = 0
    chars = []
    for t in range(fin, start - 1, -1):
        word = int(words[t])
        if (word & 3) != MAIN:
            continue
        if j >= W:
            chars.append((j - W) % A)
            j = (j - W) // A
        j = ((word >> (2 + 6 * j)) & 63) - 1
        if j < 0:
            break
    if j >= 0:
        chars.append(j if j < A else None)
    out = [c for c in reversed(chars) if c is not None]
    return "".join(alphabet[c] for c in out)


# ==========================================================================
# whole-pair batches through the segmented kernel
# ==========================================================================

def prepare_pairs_box(pairs, beam_width: int = 5, alphabet: str = "ACGT",
                      steps_per_grid: int = 2, prepared=None,
                      cap: int = 256):
    """Host prep + async H2D for a full-pair box-batch launch.

    This is the saturation engine for large lockstep waves: unlike the
    general kernel (ops/pallas_pair_beam_batch.py), whose per-step cost
    grows with B through host-unrolled per-pair scalar loops, every
    per-pair quantity here lives in [B, 1] vectors, per-axis storage
    strips are sized from the planned live spans, and (r5) the lazy
    ancestor maps confine per-step permute/seed/refresh work to a static
    hot window whose extent the host verifies by exact lockstep
    simulation of the plan (_hot_need). Wide envelope windows are split
    (``cap``) so the hot window stays narrow even across the degenerate
    transposed-envelope regions whose *span* cannot shrink (the next row
    re-reads the wide row's full output, docs/ROOFLINE.md §7).

    Planes are based at column +128 so every reset/eviction origin is
    non-negative (a DMA precondition). Chunk boundaries stay on absolute
    128-column grids, so outputs are bit-identical to the general kernel
    and the XLA planned engine (same windowed-memo semantics); window
    splitting preserves the f32 chain order (_split_wide docstring).

    Raises on workloads whose geometry cannot fit VMEM — the caller
    falls back to the general kernel.
    """
    W = beam_width
    A = len(alphabet)
    n = len(pairs)
    preps = (prepared if prepared is not None else
             [prepare_box(y1, y2, env, cap=cap, smax=1 << 30)
              for y1, y2, env in pairs])
    sp0 = max(pb["span"][0] for pb in preps)
    sp1 = max(pb["span"][1] for pb in preps)
    S0 = _al(sp0 + 2 + 2 * CH)
    S1 = _al(sp1 + 2 + 2 * CH)

    B = ((n + 7) // 8) * 8
    b1 = b2 = 128
    N = max(pb["n"] for pb in preps)
    N_pad = ((N + 511) // 512) * 512
    K = steps_per_grid
    if N_pad % K:
        N_pad = ((N_pad + K - 1) // K) * K

    def _L(maxT, max_sm, Sx):
        need = max(b1 + maxT + 2, max_sm + b1 + Sx)
        return ((need + 1023) // 1024) * 1024

    L1 = _L(max(pb["U"] for pb in preps),
            max(int(pb["sm0"].max()) for pb in preps), S0)
    L2 = _L(max(pb["V"] for pb in preps),
            max(int(pb["sm1"].max()) for pb in preps), S1)

    est = _vmem_est(B, L1, L2, S0=S0, S1=S1, strip_dma=True)
    if est > _VMEM_BUDGET:
        raise ValueError(
            f"pair_beam_box_batch: geometry needs ~{est >> 20} MiB VMEM "
            f"(B={B}, S0={S0}, S1={S1}, L1={L1}, L2={L2})")

    # lane-major planes (8 rows per lane; STRIP_DMA layout)
    y1p = np.full((8 * B, L1), _NEG, np.float32)
    y2p = np.full((8 * B, L2), _NEG, np.float32)
    plan_mat = np.zeros((8 * B, N_pad), np.int32)
    plan_mat[0 * B:1 * B, :] = C0RUN
    plan_mat[7 * B:8 * B, 0] = 1  # every lane col 0 resets (origin 0)

    for b, pb in enumerate(preps):
        nn = pb["n"]
        sl = slice(0, nn)
        plan_mat[0 * B + b, sl] = pb["plan"][0]
        plan_mat[1 * B + b, sl] = pb["plan"][1] + np.where(
            pb["plan"][2] > pb["plan"][1], b1, 0)
        plan_mat[2 * B + b, sl] = pb["plan"][2] + np.where(
            pb["plan"][2] > pb["plan"][1], b1, 0)
        plan_mat[3 * B + b, sl] = pb["plan"][3] + np.where(
            pb["plan"][4] > pb["plan"][3], b2, 0)
        plan_mat[4 * B + b, sl] = pb["plan"][4] + np.where(
            pb["plan"][4] > pb["plan"][3], b2, 0)
        plan_mat[5 * B + b, sl] = pb["sm0"] + b1
        plan_mat[6 * B + b, sl] = pb["sm1"] + b2
        plan_mat[5 * B + b, nn:] = pb["sm0"][-1] + b1
        plan_mat[6 * B + b, nn:] = pb["sm1"][-1] + b2
        plan_mat[7 * B + b, 0] = 1
        plan_mat[5 * B + b, 0] = b1 - 128
        plan_mat[6 * B + b, 0] = b2 - 128
        p1 = _pack_plane6(pb["y1"])
        p2 = _pack_plane6(pb["y2"])
        y1p[8 * b:8 * b + 6, b1:b1 + p1.shape[1]] = p1
        y2p[8 * b:8 * b + 6, b2:b2 + p2.shape[1]] = p2

    # static hot widths from the exact lockstep simulation (+1 chunk
    # safety; clamped to the strip, where the kernel degenerates to the
    # always-correct full-width eager permute)
    need0, need1 = _hot_need(plan_mat, B, S0 // CH, S1 // CH)
    HOTW0 = min(max((need0 + 1) * CH, 384), S0)
    HOTW1 = min(max((need1 + 1) * CH, 384), S1)

    return dict(dev=(jax.device_put(y1p), jax.device_put(y2p),
                     jax.device_put(plan_mat)),
                B=B, W=W, A=A, L1=L1, L2=L2, K=K, N=N_pad,
                S0=S0, S1=S1, HOTW0=HOTW0, HOTW1=HOTW1,
                fins=[pb["fin"] for pb in preps], alphabet=alphabet)


def launch_prepared_box(prep):
    y1p, y2p, plan_mat = prep["dev"]
    return _run_kernel(y1p, y2p, plan_mat, prep["B"], prep["W"], prep["A"],
                       prep["L1"], prep["L2"], K=prep["K"], N=prep["N"],
                       S0=prep["S0"], S1=prep["S1"],
                       HOTW0=prep["HOTW0"], HOTW1=prep["HOTW1"],
                       STRIP_DMA=True)


def fetch_prepared_box(prep, prov) -> list[str]:
    B, W, A = prep["B"], prep["W"], prep["A"]
    prov = np.asarray(prov).reshape(-1, B, 128)
    return [_traceback_box(prov[:, b, :].reshape(-1), 0, fin, W, A,
                           prep["alphabet"])
            for b, fin in enumerate(prep["fins"])]


def pair_beam_box_batch(pairs, beam_width: int = 5, alphabet: str = "ACGT",
                        steps_per_grid: int = 2, prepared=None,
                        cap: int = 256):
    """One-call wrapper: prepare + launch + fetch (see
    prepare_pairs_box)."""
    prep = prepare_pairs_box(pairs, beam_width=beam_width,
                             alphabet=alphabet,
                             steps_per_grid=steps_per_grid,
                             prepared=prepared, cap=cap)
    return fetch_prepared_box(prep, launch_prepared_box(prep))
