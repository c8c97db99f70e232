"""Batched Pallas TPU mega-kernel: B pair-consensus beam searches in lockstep.

Throughput form of ops/pallas_pair_beam.py (same step semantics,
differential-tested against it and the XLA engine). B independent read
pairs run through one sequential 1D grid over (padded) plan steps; each
pair owns a 32-row block of every VMEM state plane, so the per-step fixed
cost (grid overhead, winner selection, layered sweeps) is shared across
the batch. The single-pair kernel is latency-bound — measured 8x rows ~=
2x step time — so batching multiplies reads/s/chip.

Key differences from the single-pair kernel:
- ALL candidate bookkeeping (hash keys, chars, validity, scores) lives in
  "lane layout" planes [PB, 128] (pair = sublane, slot = lane); winner
  selection / dedup / key extension / parent lookups are lane-parallel VPU
  ops with per-pair row reductions — no unrolled scalar loops.
- lane->row bridges are in-block broadcasts + masked lane-reduces
  (exact for int32); key-match scans are min-reduces over the lane axis.
- storage permutes and parent gathers are block-diagonal one-hot matmuls
  at HIGHEST precision (default TPU dot truncates inputs to bf16).
- non-MAIN pairs get identity permutation rows: every step executes one
  uniform program with per-pair masks — no divergent control flow.

Per-pair plans (host side, beam2d_planned.plan_walk over the envelope) are
right-padded with zero-width catch-runs — exact no-ops for table state.

Supported model: plain CTC ("poreover"), the pair-decode flagship config.
Reference semantics: the row_col walk of BeamSearch.h:262-397 over
PrefixTree.h:492-540 2D CTC nodes, with the windowed-table memo semantics
shared by all TPU engines here (see native/pair_beam_cpu.cpp emulate mode).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = np.float32(-1e30)

MAIN, C0RUN, C1RUN = 0, 1, 2
# sweep-continuation steps: a MAIN step whose axis window exceeds the
# storage cap is split in the plan into MAIN (capped window) + CONT parts
# at 128-aligned absolute positions. Parts sweep the same (unchanged)
# candidate table with seeds re-read from storage, and scores accumulate
# per-axis window maxes across parts — bit-identical to the unsplit sweep
# because part boundaries coincide with the kernel's internal chunk grid
# (the f32 chain seeding/summation order is unchanged).
CONT0, CONT1 = 3, 4

# emission-ring refresh cadence (steps); N_pad is always a multiple of this
RREF = 512
# storage eviction-shift cadence (steps)
RSHIFT = 128

_M1 = np.int32(np.uint32(2654435761).astype(np.int32))
_M2 = np.int32(40503)


def _dotx(a, b):
    """Exact f32 matmul (HIGHEST: default TPU dot truncates to bf16)."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def _split3(x):
    """Exact 3-term bf16 decomposition of f32: x == hi + mid + lo.

    f32 has a 24-bit mantissa; each bf16 term captures 8 bits, and every
    residual is exactly representable (<= 8 significant bits), so the split
    is lossless."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _dotb(a, b):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)


def _gather(oh_ref, terms, BC: int):
    """Exact block-diagonal one-hot gather: out = oh @ x.

    ``terms`` is _split3(x). The one-hot matrix only connects rows within a
    pair's 32-row block, so it is stored with group-local columns [BC, 128]
    (row r selects among the 128 rows of its own group); only diagonal tile
    groups are multiplied — a full [BC,BC] dot costs (BC/128)^2 MXU tiles
    and made batch cost quadratic in B. Each selected product is exact in
    bf16 (one-hot times an exact bf16 term), and hi+mid+lo re-sums to the
    exact f32 payload, so this is bit-identical to a HIGHEST f32 dot. The
    three terms ride ONE matmul with column-concatenated RHS — small MXU
    ops are launch-overhead-bound, so one 3x-wide dot beats three."""
    hi, mid, lo = terms
    SP = hi.shape[1]
    G = 128
    outs = []
    for g0 in range(0, BC, G):
        g1 = min(g0 + G, BC)
        ohg = oh_ref[g0:g1, 0:g1 - g0].astype(jnp.bfloat16)
        cat = jnp.concatenate(
            [hi[g0:g1], mid[g0:g1], lo[g0:g1]], axis=1)
        r = _dotb(ohg, cat)
        acc = (r[:, 0:SP] + r[:, SP:2 * SP]) + r[:, 2 * SP:3 * SP]
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _gather_f32(oh_ref, x, BC: int):
    """Grouped block-diagonal one-hot gather at HIGHEST f32, for payloads
    too narrow for bf16 tiling (e.g. [BC, 1] seeds)."""
    G = 128
    outs = []
    for g0 in range(0, BC, G):
        g1 = min(g0 + G, BC)
        outs.append(_dotx(oh_ref[g0:g1, 0:g1 - g0], x[g0:g1]))
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=0)


def _build_kernel(B: int, W: int, A: int, Wst0: int, Wst1: int, CH: int,
                  L1: int, L2: int, K: int = 1, NTOT: int = 0,
                  RING0: int = 2048, RING1: int = 2048,
                  USE_RINGS: bool = True, HAS_CONT: bool = True,
                  EVICT_STEP: bool = False):
    # USE_RINGS / HAS_CONT compile the f0bc6dc VMEM measures (HBM emission
    # rings, CONT continuation-step handling) OUT of the step body when the
    # host proves they are not needed — always-on they taxed the small-B
    # path ~40% (the r02->r03 pair regression, VERDICT r3 item 2)
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = W * (A + 1)
    CP = 32
    assert C <= CP
    PB = max(B, 8)
    BC = B * CP
    LAYERS = W + 1
    S0 = ((Wst0 + 3 * CH + 127) // 128) * 128
    S1 = ((Wst1 + 3 * CH + 127) // 128) * 128
    WF0 = S0 - CH
    WF1 = S1 - CH
    LN = 128

    def kernel(y1_ref, y2_ref, plan_ref,
               prov_ref, sco_ref, val_ref,
               st0, ps0, st1, ps1,
               K1, K2, PK1, PK2, CHR, PCH, VAL, SCO,
               so_s, ohP, ohFro, ohG, ohG2,
               seeds, mx0s, mx, mx1s, tmp,
               plan_s, pv_s, dma_sem, hiw_s,
               yr0, yr1, ybs_s):
        for _k in range(K):
            _step_body(pl.program_id(0) * K + _k,
                       y1_ref, y2_ref, plan_ref,
                       prov_ref, sco_ref, val_ref,
                       st0, ps0, st1, ps1,
                       K1, K2, PK1, PK2, CHR, PCH, VAL, SCO,
                       so_s, ohP, ohFro, ohG, ohG2,
                       seeds, mx0s, mx, mx1s, tmp,
                       plan_s, pv_s, dma_sem, hiw_s,
                       yr0, yr1, ybs_s)

    def _step_body(i, y1_ref, y2_ref, plan_ref,
                   prov_ref, sco_ref, val_ref,
                   st0, ps0, st1, ps1,
                   K1, K2, PK1, PK2, CHR, PCH, VAL, SCO,
                   so_s, ohP, ohFro, ohG, ohG2,
                   seeds, mx0s, mx, mx1s, tmp,
                   plan_s, pv_s, dma_sem, hiw_s,
                   yr0, yr1, ybs_s):

        lane = jax.lax.broadcasted_iota(jnp.int32, (PB, LN), 1)
        prow = jax.lax.broadcasted_iota(jnp.int32, (PB, LN), 0)
        rr = jax.lax.broadcasted_iota(jnp.int32, (BC, 1), 0)
        rblk = rr // CP
        rslot = rr - rblk * CP
        # one-hot matrices use group-local columns: row r's pair block sits
        # at column base ((r % 128) // CP) * CP of r's 128-row group
        ccol = jax.lax.broadcasted_iota(jnp.int32, (BC, 128), 1)
        crow = jax.lax.broadcasted_iota(jnp.int32, (BC, 128), 0)
        cloc = (crow % 128) // CP * CP
        in_batch = prow < B

        # ---- per-pair plan scalars, read from SMEM ----
        # The plan lives in HBM (ANY) and is DMA'd into SMEM one 128-step
        # block at a time, so per-step reads are native scalar-core loads
        # (reading scalars out of a VMEM vector costs a VPU->SMEM sync per
        # value — 5*B of those per step measurably hurt).
        pb = pl.multiple_of((i // 128) * 128, 128)
        pcol = i - pb

        @pl.when(pcol == 0)
        def _load_plan():
            cp = pltpu.make_async_copy(
                plan_ref.at[:, pl.ds(pb, 128)], plan_s, dma_sem.at[0]
            )
            cp.start()
            cp.wait()

        stype = [plan_s[8 * b + 0, pcol] for b in range(B)]
        alo = [plan_s[8 * b + 1, pcol] for b in range(B)]
        ahi = [plan_s[8 * b + 2, pcol] for b in range(B)]
        blo = [plan_s[8 * b + 3, pcol] for b in range(B)]
        bhi = [plan_s[8 * b + 4, pcol] for b in range(B)]
        pso0 = [plan_s[8 * b + 5, pcol] for b in range(B)]
        pso1 = [plan_s[8 * b + 6, pcol] for b in range(B)]

        def scal_vec(scalars, default, dtype=jnp.float32):
            v = jnp.full((PB, LN), default, dtype)
            for b, x in enumerate(scalars):
                v = jnp.where(prow == b, x, v)
            return v

        is_main = scal_vec(
            [jnp.where(s == MAIN, 1.0, 0.0) for s in stype], 0.0)
        # sweep-all steps (MAIN + CONT parts): sweep every valid table row
        # and update scores; CONT parts leave the table/storage permutation
        # untouched (is_main stays the gate for those)
        if HAS_CONT:
            is_swall = scal_vec(
                [jnp.where((s == MAIN) | (s >= CONT0), 1.0, 0.0)
                 for s in stype], 0.0)
        else:
            is_swall = is_main
        is_main_r = jnp.zeros((BC, 1), jnp.float32)
        c0cont_r = jnp.zeros((BC, 1), jnp.float32)
        c1cont_r = jnp.zeros((BC, 1), jnp.float32)
        for b in range(B):
            is_main_r = jnp.where(
                rblk == b, jnp.where(stype[b] == MAIN, 1.0, 0.0), is_main_r)
            if HAS_CONT:
                c0cont_r = jnp.where(
                    rblk == b, jnp.where(stype[b] == CONT0, 1.0, 0.0),
                    c0cont_r)
                c1cont_r = jnp.where(
                    rblk == b, jnp.where(stype[b] == CONT1, 1.0, 0.0),
                    c1cont_r)

        # ------------------------------------------------------------------
        @pl.when(i == 0)
        def _init():
            # fill both emission rings from the start of the (HBM) planes;
            # per-pair refreshes slide them forward as eviction anchors rise
            if USE_RINGS:
                cp0 = pltpu.make_async_copy(
                    y1_ref.at[:, pl.ds(0, RING0)], yr0, dma_sem.at[4])
                cp1 = pltpu.make_async_copy(
                    y2_ref.at[:, pl.ds(0, RING1)], yr1, dma_sem.at[5])
                cp0.start()
                cp1.start()
                cp0.wait()
                cp1.wait()
            mx0s[:, :] = jnp.full((BC, 1), _NEG, jnp.float32)
            mx1s[:, :] = jnp.full((BC, 1), _NEG, jnp.float32)
            for b in range(2 * B):
                so_s[b] = -128
                hiw_s[b] = 2 * CH  # t=0 init writes land at lane 128
                ybs_s[b] = 0
            st0[:, :] = jnp.full((BC, S0), _NEG, jnp.float32)
            ps0[:, :] = jnp.full((BC, S0), _NEG, jnp.float32)
            st1[:, :] = jnp.full((BC, S1), _NEG, jnp.float32)
            ps1[:, :] = jnp.full((BC, S1), _NEG, jnp.float32)
            slot_ok = lane < A
            K1[:, :] = jnp.where(slot_ok, lane + 1, 0)
            K2[:, :] = jnp.where(slot_ok, lane + 1, 0)
            PK1[:, :] = jnp.zeros((PB, LN), jnp.int32)
            PK2[:, :] = jnp.zeros((PB, LN), jnp.int32)
            CHR[:, :] = jnp.where(slot_ok, lane, 0)
            PCH[:, :] = jnp.full((PB, LN), -1, jnp.int32)
            VAL[:, :] = jnp.where(slot_ok & in_batch, 1.0, 0.0)
            SCO[:, :] = jnp.where(slot_ok & in_batch, 0.0, _NEG)
            li0 = jax.lax.broadcasted_iota(jnp.int32, (BC, S0), 1)
            li1 = jax.lax.broadcasted_iota(jnp.int32, (BC, S1), 1)
            acc0 = st0[:, :]
            acc1 = st1[:, :]
            ysrc0 = yr0 if USE_RINGS else y1_ref
            ysrc1 = yr1 if USE_RINGS else y2_ref
            for b in range(B):
                for c in range(A):
                    acc0 = jnp.where((rr == b * CP + c) & (li0 == 128),
                                     ysrc0[8 * b + c, 0], acc0)
                    acc1 = jnp.where((rr == b * CP + c) & (li1 == 128),
                                     ysrc1[8 * b + c, 0], acc1)
            st0[:, :] = acc0
            st1[:, :] = acc1

        # ==================================================================
        # winner selection + field gathering (lane-parallel)
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

        # winner selection: the loop keeps only what the next iteration
        # needs (masked max -> first lane -> avail update); winner fields
        # come out as [PB, 1] per-w columns saved in Python lists and are
        # placed into the W*A child layout in one pass below — the previous
        # per-iteration full-lane scatter + from_w re-gather double hop
        # measured ~30us/step at B=16. ch/pch are tiny ints picked as ONE
        # packed masked sum.
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
            first = jnp.min(jnp.where(at_m, lane, BIG), axis=1, keepdims=True)
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
        # MAIN new table (lane layout), merged with unchanged run table
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
        nval = jnp.where((is_stay | is_child) & pw_ok & in_batch, 1.0, 0.0)

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

        # sweep set: MAIN/CONT sweep every valid row (fval == val at CONT,
        # the table was not updated); catch-runs sweep the winner-key set
        sa = is_swall > 0
        swept_f = jnp.where(sa, fval, wmatch * jnp.where(val > 0, 1.0, 0.0))
        swept = swept_f > 0

        # ---- row-space bookkeeping via in-block broadcast + masked
        # reduce. rep_rows/to_rows replace both the transpose-based
        # lane->row bridge and the unrolled 25-iteration key-match loops
        # (together ~19us/step at B=8): every lane-layout quantity reaches
        # row layout with one [BC,LN] where+reduce, exact for int32, and
        # first-match scans become min-reduces over the lane axis. ----
        laneB = jax.lax.broadcasted_iota(jnp.int32, (BC, LN), 1)
        BIGL = jnp.int32(LN + 1)

        def rep_rows(x):
            # [PB,LN] -> [BC,LN]: pair b's lane vector broadcast to its
            # CP-row block (jnp.repeat: the broadcast_to+reshape spelling
            # hits an unsupported Mosaic gather at B=1)
            return jnp.repeat(x[:B], CP, axis=0)

        def to_rows(x, default=0):
            # [PB,LN] lane layout -> [BC,1] row layout (row r reads its own
            # slot's lane)
            return jnp.sum(
                jnp.where(laneB == rslot, rep_rows(x), default),
                axis=1, keepdims=True)

        im_r = is_main_r > 0
        stay_r = rslot < W
        child_r = (rslot >= W) & (rslot < C)
        wofj_r = jnp.where(child_r, (rslot - W) // A, rslot)
        pw_src_r = to_rows(pw_src)
        # 0/1 int masks throughout: Mosaic cannot lower selects between
        # i1-valued vectors (arith.trunci i8->i1)
        pw_ok_r = to_rows(pw_oki)  # int32 0/1

        # stale-row source: stay rows <- winner slot; child rows <- first
        # OLD slot holding the child key (if any)
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

        # parent slot among swept lanes (sweep gather) / valid lanes
        # (frozen refresh): first lane with the parent's key
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

        # ---- block-diagonal one-hot matrices (group-local columns) ----
        ohP[:, :] = jnp.where((ccol == cloc + src_r) & (src_r >= 0),
                              1.0, 0.0)
        ohFro[:, :] = jnp.where(
            (ccol == cloc + fro_src_r) & (fro_src_r >= 0), 1.0, 0.0)
        ohG[:, :] = jnp.where((ccol == cloc + par_r) & (par_r >= 0),
                              1.0, 0.0)
        ohG2[:, :] = jnp.where((ccol == cloc + par2_r) & (par2_r >= 0),
                               1.0, 0.0)

        # ---- storage permute (identity rows for run pairs) ----
        def _permute_span(st, ps, SP):
            # The three gathers this needs (ohP@st, ohP@ps, ohFro@st) ride
            # ONE matmul per 128-row group: LHS = [ohP; ohFro] stacked on
            # rows, RHS = [st_hi|mid|lo | ps_hi|mid|lo] concatenated on
            # columns (the ohFro@ps quadrant is computed and discarded —
            # small matmuls are launch-bound, not FLOP-bound). Products and
            # the hi+mid+lo re-sum order are unchanged, so this is
            # bit-identical to the separate _gather calls it replaces.
            st_t = _split3(st[:, pl.ds(0, SP)])
            ps_t = _split3(ps[:, pl.ds(0, SP)])
            G = 128
            pst_l, pps_l, fst_l = [], [], []
            for g0 in range(0, BC, G):
                g1 = min(g0 + G, BC)
                gsz = g1 - g0
                OH = jnp.concatenate(
                    [ohP[g0:g1, 0:gsz].astype(jnp.bfloat16),
                     ohFro[g0:g1, 0:gsz].astype(jnp.bfloat16)], axis=0)
                X = jnp.concatenate(
                    [t[g0:g1] for t in st_t] + [t[g0:g1] for t in ps_t],
                    axis=1)
                R = _dotb(OH, X)

                def s3(rows, c0):
                    return ((rows[:, c0:c0 + SP]
                             + rows[:, c0 + SP:c0 + 2 * SP])
                            + rows[:, c0 + 2 * SP:c0 + 3 * SP])

                pst_l.append(s3(R[0:gsz], 0))
                pps_l.append(s3(R[0:gsz], 3 * SP))
                fst_l.append(s3(R[gsz:2 * gsz], 0))

            def _cat(parts):
                return parts[0] if len(parts) == 1 else jnp.concatenate(
                    parts, axis=0)

            fr_beam = _cat(pps_l)
            fr_child = _cat(fst_l)
            is_child_r = (is_main_r > 0) & (rslot >= W) & (rslot < C)
            newfr = jnp.where(is_child_r, fr_child, fr_beam)
            st[:, pl.ds(0, SP)] = jnp.where(src_r >= 0, _cat(pst_l), _NEG)
            ps[:, pl.ds(0, SP)] = jnp.where(val_r > 0, newfr, _NEG)

        def _span_of(so_base):
            spn = hiw_s[so_base]
            for b in range(1, B):
                spn = jnp.maximum(spn, hiw_s[so_base + b])
            return spn

        def _span_buckets(S):
            # 256 is the floor: hiw_s tracking never reports less (init
            # 2*CH; refresh keeps >= one chunk + CH). 384 matters since
            # block-scheduled eviction: spans drift up to +RSHIFT between
            # shift boundaries, so typical steps sit at 256-384
            return sorted({min(256, S), min(384, S), min(512, S),
                           min(1024, S), S})

        def permute(st, ps, S, span):
            # span-restricted: lanes >= the live span are -inf in every
            # row (writes never reached them), and a full-width permute
            # would reproduce -inf there (gather of -inf / fresh-row
            # splat), so gathering only the live span is bit-exact while
            # the tight plan anchors keep that span short.
            bks = _span_buckets(S)
            for bi, SP in enumerate(bks):
                pred = span <= SP
                if bi > 0:
                    pred = pred & (span > bks[bi - 1])

                @pl.when(pred)
                def _p(SP=SP):
                    _permute_span(st, ps, SP)

        permute(st0, ps0, S0, _span_of(0))
        permute(st1, ps1, S1, _span_of(B))

        # ==================================================================
        # windowed sweeps (per-pair windows; zero width = exact no-op)
        # ==================================================================
        liC = jax.lax.broadcasted_iota(jnp.int32, (BC, CH), 1)

        def sweep_axis(st, ps, y_ref, yr, RING, los, his, WF, S, L, so_base,
                       plan_so):
            # Eviction scheduling is a static choice (EVICT_STEP):
            #  - per-step: each pair shifts its storage window up to the
            #    tight plan anchor the moment it rises. Spans stay at the
            #    256 bucket and the device step is ~1.6x faster at B=5
            #    (r02 behavior, measured 1.38s vs 2.25s on the bundled
            #    pairs) — but the per-pair conditional shift regions
            #    serialize (~2us/pair/step), so cost grows with B.
            #  - block-scheduled: shifts run in one uniform pass every
            #    RSHIFT steps (_storage_shift below); spans drift up to
            #    +RSHIFT between boundaries (the 384 bucket) but the
            #    per-step path has no conditional regions — wins at
            #    larger B. The host picks per batch (B <= 8 -> per-step).
            if EVICT_STEP:
                new_so = []
                for b in range(B):
                    so_b = so_s[so_base + b]
                    need = his[b] - WF
                    cand = ((need + 127) // 128) * 128
                    ns = pl.multiple_of(
                        jnp.maximum(jnp.maximum(so_b, cand), plan_so[b]),
                        128)
                    d = pl.multiple_of(ns - so_b, 128)

                    @pl.when(d != 0)
                    def _shift(b=b, d=d, st=st, ps=ps, S=S):
                        nblk = S // CH
                        for ref in (st, ps):
                            for j in range(nblk):
                                srcp = pl.multiple_of(j * CH + d, 128)

                                @pl.when(srcp <= S - CH)
                                def _cp(j=j, srcp=srcp, ref=ref, b=b):
                                    tmp[b * CP:(b + 1) * CP,
                                        j * CH:(j + 1) * CH] = ref[
                                            b * CP:(b + 1) * CP,
                                            pl.ds(srcp, CH)]

                                @pl.when(srcp > S - CH)
                                def _fl(j=j, ref=ref, b=b):
                                    tmp[b * CP:(b + 1) * CP,
                                        j * CH:(j + 1) * CH] = jnp.full(
                                            (CP, CH), _NEG, jnp.float32)
                            ref[b * CP:(b + 1) * CP, :] = tmp[
                                b * CP:(b + 1) * CP, pl.ds(0, S)]

                    so_s[so_base + b] = ns
                    new_so.append(ns)
                    hw = jnp.maximum(hiw_s[so_base + b] - d, 0)
                    wid = his[b] - los[b]
                    hiw_s[so_base + b] = jnp.where(
                        wid > 0,
                        jnp.maximum(
                            hw, ((his[b] - ns + 127) // 128) * 128 + CH),
                        hw)
            else:
                new_so = [so_s[so_base + b] for b in range(B)]
                for b in range(B):
                    # live-span tracking (aligned-up exclusive end of
                    # written lanes) for the span-restricted gathers
                    wid = his[b] - los[b]
                    hiw_s[so_base + b] = jnp.where(
                        wid > 0,
                        jnp.maximum(
                            hiw_s[so_base + b],
                            ((his[b] - new_so[b] + 127) // 128) * 128 + CH),
                        hiw_s[so_base + b])

            ac0 = [pl.multiple_of((los[b] // 128) * 128, 128)
                   for b in range(B)]
            nchk = [(his[b] - ac0[b] + CH - 1) // CH for b in range(B)]
            n_chunks = nchk[0]
            for b in range(1, B):
                n_chunks = jnp.maximum(n_chunks, nchk[b])

            ybases = ([ybs_s[so_base + b] for b in range(B)]
                      if USE_RINGS else None)

            lo_r = jnp.zeros((BC, 1), jnp.int32)
            hi_r = jnp.zeros((BC, 1), jnp.int32)
            so_r = jnp.zeros((BC, 1), jnp.int32)
            for b in range(B):
                lo_r = jnp.where(rblk == b, los[b], lo_r)
                hi_r = jnp.where(rblk == b, his[b], hi_r)
                so_r = jnp.where(rblk == b, new_so[b], so_r)

            # seeds: own value at lo-1
            for b in range(B):
                pos0 = pl.multiple_of(jnp.maximum(ac0[b] - new_so[b], 0), 128)
                posp = pl.multiple_of(jnp.maximum(pos0 - CH, 0), 128)
                rows = slice(b * CP, (b + 1) * CP)
                catA = st[rows, pl.ds(posp, CH)]
                catB = st[rows, pl.ds(pos0, CH)]
                cat = jnp.concatenate([catA, catB], axis=1)
                li2 = jax.lax.broadcasted_iota(jnp.int32, (CP, 2 * CH), 1)
                tcat = jnp.where(li2 < CH, new_so[b] + posp + li2,
                                 new_so[b] + pos0 + (li2 - CH))
                seeds[rows, :] = jnp.max(
                    jnp.where(tcat == los[b] - 1, cat, _NEG), axis=1,
                    keepdims=True)
            seeds[:, :] = jnp.where(sw_r > 0, seeds[:, :], _NEG)
            mx[:, :] = jnp.full((BC, 1), _NEG, jnp.float32)

            def chunk(kc, carry):
                em_l, gap_l, rootv_l, fro_l, old_l, tabs_l = (
                    [], [], [], [], [], [])
                liP = jax.lax.broadcasted_iota(jnp.int32, (CP, CH), 1)
                poss = []
                for b in range(B):
                    c_lo_u = ac0[b] + kc * CH          # unclamped (for t)
                    c_lo = pl.multiple_of(
                        jnp.minimum(c_lo_u, L - CH), 128)  # clamped (memory)
                    rows = slice(b * CP, (b + 1) * CP)
                    yrows = slice(8 * b, 8 * (b + 1))
                    if USE_RINGS:
                        ypos = pl.multiple_of(
                            jnp.clip(c_lo - ybases[b], 0, RING - CH), 128)
                        yw = yr[yrows, pl.ds(ypos, CH)]
                    else:
                        yw = y_ref[yrows, pl.ds(c_lo, CH)]
                    em_b = jnp.full((CP, CH), _NEG, jnp.float32)
                    chb = ch_r[b * CP:(b + 1) * CP, :]
                    for c in range(A):
                        em_b = jnp.where(chb == float(c), yw[c:c + 1, :],
                                         em_b)
                    em_l.append(em_b)
                    gap_l.append(jnp.broadcast_to(yw[A:A + 1, :], (CP, CH)))
                    rootv_l.append(
                        jnp.broadcast_to(yw[A + 1:A + 2, :], (CP, CH)))
                    pos = pl.multiple_of(
                        jnp.clip(c_lo - new_so[b], 0, S - CH), 128)
                    poss.append(pos)
                    posp = pl.multiple_of(jnp.maximum(pos - CH, 0), 128)
                    fA = ps[rows, pl.ds(posp, CH)]
                    fB = ps[rows, pl.ds(pos, CH)]
                    fcat = jnp.concatenate([fA, fB], axis=1)
                    fro_l.append(jax.lax.slice_in_dim(fcat, CH - 1,
                                                      2 * CH - 1, axis=1))
                    old_l.append(st[rows, pl.ds(pos, CH)])
                    tabs_l.append(jnp.broadcast_to(c_lo_u + liP, (CP, CH)))
                em = jnp.concatenate(em_l, axis=0)
                gap = jnp.concatenate(gap_l, axis=0)
                rootv = jnp.concatenate(rootv_l, axis=0)
                fro = jnp.concatenate(fro_l, axis=0)
                old = jnp.concatenate(old_l, axis=0)
                t_abs = jnp.concatenate(tabs_l, axis=0)

                in_m = jnp.where(
                    (t_abs >= lo_r) & (t_abs < hi_r) & (sw_r > 0), 1.0, 0.0)
                fro_pos = t_abs - 1 - so_r
                fro = jnp.where((fro_pos >= 0) & (fro_pos < WF), fro, _NEG)
                ext = jnp.where(root_r > 0, rootv, fro)
                root_start = (root_r > 0) & (t_abs == 0)
                del root_start  # plain CTC has no flop start; kept for parity

                gapm = jnp.where(in_m > 0, gap, 0.0)
                cg = gapm
                sh = 1
                while sh < CH:
                    cg = cg + jnp.where(liC >= sh, pltpu.roll(cg, sh, 1), 0.0)
                    sh *= 2

                sd = seeds[:, :]
                pseed = _gather_f32(ohG, sd, BC)  # layer-invariant

                def layer(par):
                    parsh = pltpu.roll(par, 1, 1)
                    parsh = jnp.where(liC == 0, pseed, parsh)
                    parsh = jnp.where(t_abs == lo_r, pseed, parsh)
                    pv = jnp.where(pswept_r > 0, parsh, ext)
                    E = jnp.where(in_m > 0, pv + em, _NEG)
                    X = E - cg
                    run = X
                    sh = 1
                    while sh < CH:
                        prev = jnp.where(liC >= sh, pltpu.roll(run, sh, 1),
                                         _NEG)
                        run = jnp.logaddexp(run, prev)
                        sh *= 2
                    pfull = cg + jnp.logaddexp(run, sd)
                    return jnp.where(in_m > 0, pfull, _NEG)

                # iteration 0: the input m is the _NEG splat, so the gather
                # result is known analytically: rows with a parent (a
                # one-hot hit) give _NEG, rows without give 0. Computing it
                # directly saves a matmul and avoids slicing a splat
                # constant at sublane offset >= 128, which crashes the TPU
                # compiler ("limits[i] <= dim(i)" CHECK) when BC > 128.
                m = layer(jnp.broadcast_to(
                    jnp.where(pswept_r > 0, _NEG, 0.0), (BC, CH)))

                # remaining layers: trip count = the step's actual max
                # parent-chain depth (usually 1-2) instead of the static
                # W+1 — a depth-d row is correct after iteration d-1
                def layer_body(_l, mm):
                    return layer(_gather(ohG, _split3(mm), BC))

                m = jax.lax.fori_loop(1, n_layers, layer_body, m)

                merged = jnp.where(in_m > 0, m, old)
                for b in range(B):
                    rows = slice(b * CP, (b + 1) * CP)

                    @pl.when(kc < nchk[b])
                    def _wr(b=b, rows=rows):
                        st[rows, pl.ds(poss[b], CH)] = (
                            merged[b * CP:(b + 1) * CP, :])

                mx[:, :] = jnp.maximum(
                    mx[:, :], jnp.max(jnp.where(in_m > 0, m, _NEG), axis=1,
                                      keepdims=True))
                # per-pair last-lane time, built from scalars (slicing the
                # concat-of-broadcast t_abs crashes the Mosaic layout pass)
                last_t_r = jnp.zeros((BC, 1), jnp.int32)
                for b in range(B):
                    last_t_r = jnp.where(
                        rblk == b, ac0[b] + kc * CH + CH - 1, last_t_r)
                last_ok = (sw_r > 0) & (last_t_r >= lo_r) & (last_t_r < hi_r)
                seeds[:, :] = jnp.where(last_ok, m[:, CH - 1:CH], seeds[:, :])
                return carry

            jax.lax.fori_loop(0, n_chunks, chunk, 0)

            # frozen-copy refresh, span-restricted like the permutes
            spn = _span_of(so_base)
            bks = _span_buckets(S)
            for bi, SP in enumerate(bks):
                pred = spn <= SP
                if bi > 0:
                    pred = pred & (spn > bks[bi - 1])

                @pl.when(pred)
                def _rf(SP=SP):
                    pp = _gather(ohG2, _split3(st[:, pl.ds(0, SP)]), BC)
                    ps[:, pl.ds(0, SP)] = jnp.where(
                        psmask_r > 0, pp, ps[:, pl.ds(0, SP)])

        # ---- dynamic layer count, shared by both axis sweeps ----
        # parent-chain depth per row via iteration over the sweep's own
        # parent one-hot (values <= W+1 are exact in bf16); the sweeps then
        # run exactly max-depth layer iterations instead of the static W+1
        # (typical steps have depth 1-2 chains).
        def _gather_small(oh_ref, x):
            G = 128
            outs = []
            for g0 in range(0, BC, G):
                g1 = min(g0 + G, BC)
                outs.append(_dotb(
                    oh_ref[g0:g1, 0:g1 - g0].astype(jnp.bfloat16),
                    x[g0:g1].astype(jnp.bfloat16)))
            return outs[0] if len(outs) == 1 else jnp.concatenate(outs, 0)

        dvec = jnp.ones((BC, 1), jnp.float32)
        for _ in range(LAYERS - 1):
            pd = _gather_small(ohG, dvec)
            dvec = jnp.where(pswept_r > 0, 1.0 + pd, 1.0)
        dvec = jnp.where(sw_r > 0, dvec, 0.0)
        n_layers = jnp.minimum(
            jnp.max(dvec).astype(jnp.int32), LAYERS)

        sweep_axis(st0, ps0, y1_ref, yr0, RING0, alo, ahi, WF0, S0, L1, 0,
                   pso0)
        # per-axis window maxes persist across CONT parts: MAIN resets,
        # CONT0/CONT1 accumulate their axis, runs leave them alone — so
        # max(parts) + other-axis max == the unsplit step's score
        if HAS_CONT:
            mx0s[:, :] = jnp.where(
                is_main_r > 0, mx[:, :],
                jnp.where(c0cont_r > 0, jnp.maximum(mx0s[:, :], mx[:, :]),
                          mx0s[:, :]))
        else:
            mx0s[:, :] = mx[:, :]
        sweep_axis(st1, ps1, y2_ref, yr1, RING1, blo, bhi, WF1, S1, L2, B,
                   pso1)

        # ---- emission ring refresh, block-scheduled: every RREF steps,
        # slide every pair's ring base up to its current eviction anchor
        # (reads are always >= the anchor — same proof as storage eviction
        # — and anchors are non-decreasing). The host sizes RING0/RING1 so
        # one block's reads always fit from the previous block-boundary
        # anchor, so the refresh needs NO per-pair conditionals (a
        # conditional DMA per pair per step measurably serializes, and a
        # nested conditional variant deadlocked the device).
        if USE_RINGS:
            @pl.when(i % RREF == RREF - 1)
            def _ring_refresh():
                for b in range(B):
                    nb0 = pl.multiple_of(
                        jnp.clip(pso0[b], 0, L1 - RING0), 128)
                    nb1 = pl.multiple_of(
                        jnp.clip(pso1[b], 0, L2 - RING1), 128)
                    ybs_s[b] = nb0
                    ybs_s[B + b] = nb1
                    cp0 = pltpu.make_async_copy(
                        y1_ref.at[pl.ds(8 * b, 8), pl.ds(nb0, RING0)],
                        yr0.at[pl.ds(8 * b, 8), :], dma_sem.at[4])
                    cp1 = pltpu.make_async_copy(
                        y2_ref.at[pl.ds(8 * b, 8), pl.ds(nb1, RING1)],
                        yr1.at[pl.ds(8 * b, 8), :], dma_sem.at[5])
                    cp0.start()
                    cp1.start()
                    cp0.wait()
                    cp1.wait()

        if HAS_CONT:
            mx1s[:, :] = jnp.where(
                is_main_r > 0, mx[:, :],
                jnp.where(c1cont_r > 0, jnp.maximum(mx1s[:, :], mx[:, :]),
                          mx1s[:, :]))

        # ---- storage eviction, block-scheduled: every RSHIFT steps shift
        # each pair's window planes up to its current eviction anchor
        # (columns below it are provably never read — see _plan_anchors).
        # Between boundaries the live span grows by at most the window
        # drift, which the host folds into Wst (_plan_spans). Uniform
        # cadence keeps the per-step path free of conditional shift
        # regions; the inner per-pair conditions run once per RSHIFT steps.
        if not EVICT_STEP:
            @pl.when(i % RSHIFT == RSHIFT - 1)
            def _storage_shift():
                for so_base, stx, psx, Sx, pso in ((0, st0, ps0, S0, pso0),
                                                   (B, st1, ps1, S1, pso1)):
                    for b in range(B):
                        so_b = so_s[so_base + b]
                        ns = pl.multiple_of(
                            jnp.maximum(so_b, pso[b]), 128)
                        d = pl.multiple_of(ns - so_b, 128)

                        @pl.when(d != 0)
                        def _shift(b=b, d=d, ns=ns, stx=stx, psx=psx, Sx=Sx,
                                   so_base=so_base):
                            nblk = Sx // CH
                            for ref in (stx, psx):
                                for j in range(nblk):
                                    srcp = pl.multiple_of(j * CH + d, 128)

                                    @pl.when(srcp <= Sx - CH)
                                    def _cp(j=j, srcp=srcp, ref=ref, b=b):
                                        tmp[b * CP:(b + 1) * CP,
                                            j * CH:(j + 1) * CH] = ref[
                                                b * CP:(b + 1) * CP,
                                                pl.ds(srcp, CH)]

                                    @pl.when(srcp > Sx - CH)
                                    def _fl(j=j, ref=ref, b=b):
                                        tmp[b * CP:(b + 1) * CP,
                                            j * CH:(j + 1) * CH] = jnp.full(
                                                (CP, CH), _NEG, jnp.float32)
                                ref[b * CP:(b + 1) * CP, :] = tmp[
                                    b * CP:(b + 1) * CP, pl.ds(0, Sx)]
                            so_s[so_base + b] = ns
                            hiw_s[so_base + b] = jnp.maximum(
                                hiw_s[so_base + b] - d, 0)

        # ---- scores: rows -> lanes bridge via transpose ----
        # without CONT steps mx still holds the axis-1 sweep max directly
        tot_r = mx0s[:, :] + (mx1s[:, :] if HAS_CONT else mx[:, :])
        colIota = jax.lax.broadcasted_iota(jnp.int32, (LN, PB), 1)
        rowIota = jax.lax.broadcasted_iota(jnp.int32, (LN, PB), 0)
        acc = jnp.full((LN, PB), _NEG, jnp.float32)
        for b in range(B):
            blkv = tot_r[b * CP:(b + 1) * CP, :]  # [CP, 1]
            patch = jnp.concatenate(
                [blkv, jnp.full((CP, PB - 1), _NEG, jnp.float32)], axis=1)
            patch = jnp.concatenate(
                [patch, jnp.full((LN - CP, PB), _NEG, jnp.float32)], axis=0)
            acc = jnp.where((colIota == b) & (rowIota < CP), patch[:, 0:1],
                            acc)
        sc_lanes = jnp.transpose(acc)  # [PB, LN]
        new_sco = jnp.where((fval > 0) & (lane < C), sc_lanes, _NEG)
        SCO[:, :] = jnp.where(sa, new_sco, sco)

        # ---- provenance: ONE bit-packed int32 per pair per step ----
        # layout: bits 0-1 step type; bits 2+6w: winner w's slot + 1
        # (0 = none), slots fit 6 bits. Accumulated in VMEM scratch
        # [PB, 128] and flushed to the HBM (ANY) output with one async DMA
        # per 128 steps. Two measured constraints shape this:
        #  - outputs must not be revolving VMEM windows (Mosaic round-trips
        #    every windowed output block through HBM on every step of an
        #    "arbitrary" grid — ~66us/step for a (32*PB,128) block,
        #    ~10us/step for each (8,128) one);
        #  - the packed form keeps the whole provenance stream at
        #    N*PB*4 bytes (1.7 MB for a full read pair batch) instead of
        #    128x that — the fat layout's device->host fetch took longer
        #    than the kernel itself.
        # CONT0/CONT1 both clamp to 3 in the 2-bit type field — the
        # traceback only distinguishes MAIN (0) from everything else
        packed = scal_vec([jnp.minimum(s, 3) for s in stype], C0RUN,
                          jnp.int32)
        for w in range(W):
            wv = jnp.where(hass[w], firsts[w], -1)  # [PB, 1]
            packed = packed | ((wv + 1) << (2 + 6 * w))
        pv_s[:, :] = jnp.where(lane == i % 128, packed, pv_s[:, :])

        @pl.when((i % 128 == 127) | (i == NTOT - 1))
        def _flush_prov():
            cp = pltpu.make_async_copy(
                pv_s,
                prov_ref.at[pl.ds((i // 128) * PB, PB), :],
                dma_sem.at[1],
            )
            cp.start()
            cp.wait()

        @pl.when(i == NTOT - 1)
        def _fin():
            for j, (src, dst) in enumerate(((SCO, sco_ref), (VAL, val_ref))):
                cp = pltpu.make_async_copy(src, dst, dma_sem.at[2 + j])
                cp.start()
                cp.wait()

    return kernel, C, CP, PB, BC, S0, S1


def _split_wide(plan: dict, cap: int = 256) -> dict:
    """Split plan windows wider than ``cap`` into parts at 128-aligned
    absolute positions (cap must be a multiple of 128).

    Catch-runs split into more catch-runs of the same type (the winner set
    re-derives identically from the unchanged table, and seeds re-read from
    storage). MAIN windows split into a capped MAIN + CONT0/CONT1
    continuation steps that sweep the unchanged table and accumulate the
    per-axis window maxes (mx0s/mx1s in the kernel). Part boundaries
    coincide with the kernel's internal 128-column chunk grid, so the f32
    chain order — and therefore the output — is bit-identical to the
    unsplit plan; what changes is that the plan's eviction anchors
    (suffix-min of window lo) can now rise *inside* a wide window, keeping
    the live storage span (and Wst) bounded by ~cap instead of the widest
    envelope degeneracy (~1.8k columns on real reads)."""
    t = plan["type"]
    al, ah = plan["a_lo"], plan["a_hi"]
    bl, bh = plan["b_lo"], plan["b_hi"]
    wide = (((t != C1RUN) & (ah - al > cap))
            | ((t != C0RUN) & (bh - bl > cap)))
    if not wide.any():
        return plan

    def parts(lo: int, hi: int):
        out = []
        p = lo
        while hi - p > cap:
            q = (p // 128) * 128 + cap
            out.append((p, q))
            p = q
        out.append((p, hi))
        return out

    rows = []
    idx = np.nonzero(wide)[0]
    prev = 0
    keep = np.stack([t, al, ah, bl, bh], axis=1).astype(np.int32)
    for i in idx:
        rows.extend(map(tuple, keep[prev:i]))
        prev = i + 1
        ty = int(t[i])
        a0, a1, b0, b1 = int(al[i]), int(ah[i]), int(bl[i]), int(bh[i])
        if ty == C0RUN:
            rows.extend((C0RUN, lo, hi, 0, 0) for lo, hi in parts(a0, a1))
        elif ty == C1RUN:
            rows.extend((C1RUN, 0, 0, lo, hi) for lo, hi in parts(b0, b1))
        else:
            ap = parts(a0, a1) if a1 - a0 > cap else [(a0, a1)]
            bp = parts(b0, b1) if b1 - b0 > cap else [(b0, b1)]
            rows.append((MAIN, ap[0][0], ap[0][1], bp[0][0], bp[0][1]))
            rows.extend((CONT0, lo, hi, 0, 0) for lo, hi in ap[1:])
            rows.extend((CONT1, 0, 0, lo, hi) for lo, hi in bp[1:])
    rows.extend(map(tuple, keep[prev:]))
    arr = np.asarray(rows, dtype=np.int32)
    return dict(type=arr[:, 0], a_lo=arr[:, 1], a_hi=arr[:, 2],
                b_lo=arr[:, 3], b_hi=arr[:, 4])


def _plan_anchors(p: dict) -> tuple[np.ndarray, np.ndarray]:
    """Tight eviction anchors per axis: the 128-aligned suffix-min of
    (window lo - 1). No step at or after t ever reads a storage lane below
    it (sweep fro/seed reads start at lo-1, chunk origins at
    align_down(lo)), so the kernel may evict up to here early. Zero-width
    steps don't sweep, so they don't constrain; steps with no future sweep
    on an axis anchor to the end of the read (history dead)."""
    U_b = int(p["a_hi"].max())
    V_b = int(p["b_hi"].max())
    sw0 = (p["type"] != C1RUN) & (p["a_hi"] > p["a_lo"])
    sw1 = (p["type"] != C0RUN) & (p["b_hi"] > p["b_lo"])
    lo0 = np.where(sw0, p["a_lo"], U_b + 1).astype(np.int64)
    lo1 = np.where(sw1, p["b_lo"], V_b + 1).astype(np.int64)
    sm0 = np.minimum.accumulate((lo0 - 1)[::-1])[::-1] // 128 * 128
    sm1 = np.minimum.accumulate((lo1 - 1)[::-1])[::-1] // 128 * 128
    return sm0, sm1


def _plan_spans(p: dict, sm0: np.ndarray, sm1: np.ndarray,
                evict_step: bool = False) -> tuple[int, int]:
    """Required live storage span per axis: max over sweeping steps of
    (window hi - storage offset). With per-step eviction (evict_step) the
    offset equals the tight anchor at every step. With block-scheduled
    shifts the offset is the anchor at the last RSHIFT boundary before t,
    -128 before the first boundary. The anchors rise inside split windows,
    but the walk re-reads back into wide transposed-envelope columns, so
    this span — not the capped window width — is what storage must hold."""
    def blocked_base(sm: np.ndarray) -> np.ndarray:
        if evict_step:
            return sm
        base = np.full(len(sm), -128, np.int64)
        for k0 in range(RSHIFT, len(sm), RSHIFT):
            base[k0:k0 + RSHIFT] = sm[k0 - 1]
        return np.maximum.accumulate(base)

    sw0 = (p["type"] != C1RUN) & (p["a_hi"] > p["a_lo"])
    sw1 = (p["type"] != C0RUN) & (p["b_hi"] > p["b_lo"])
    s0 = int(np.where(sw0, p["a_hi"] - blocked_base(sm0), 0).max(initial=0))
    s1 = int(np.where(sw1, p["b_hi"] - blocked_base(sm1), 0).max(initial=0))
    return s0, s1


def _pack_plane(y: np.ndarray, L: int) -> np.ndarray:
    """[T, A+1] log-probs -> [8, L] plane (emissions, gap, cum-gap@t-1)."""
    T, S = y.shape
    plane = np.full((8, L), _NEG, np.float32)
    plane[:S, :T] = y.T.astype(np.float32)
    cum = np.cumsum(y[:, -1]).astype(np.float32)
    plane[S, 0] = 0.0
    plane[S, 1:T + 1] = cum
    return plane


@partial(jax.jit,
         static_argnames=("B", "W", "A", "Wst0", "Wst1", "CH", "L1", "L2",
                          "K", "RING0", "RING1", "USE_RINGS", "HAS_CONT",
                          "EVICT_STEP"))
def _run_kernel(y1p, y2p, plan_mat, B: int, W: int, A: int,
                Wst0: int, Wst1: int, CH: int, L1: int, L2: int, K: int = 1,
                RING0: int = 2048, RING1: int = 2048,
                USE_RINGS: bool = True, HAS_CONT: bool = True,
                EVICT_STEP: bool = False):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = plan_mat.shape[1]
    # grid=(N // K): a non-dividing K would silently drop the last N % K
    # steps of every plan
    assert N % K == 0, f"steps_per_grid {K} must divide padded plan {N}"
    kernel, C, CP, PB, BC, S0, S1 = _build_kernel(
        B, W, A, Wst0, Wst1, CH, L1, L2, K=K, NTOT=N,
        RING0=RING0, RING1=RING1, USE_RINGS=USE_RINGS, HAS_CONT=HAS_CONT,
        EVICT_STEP=EVICT_STEP)

    # emission planes: VMEM-resident when they fit the budget (fastest —
    # the r02 path); otherwise HBM, staged through per-pair VMEM rings
    # (yr0/yr1) refreshed by anchor-gated DMAs so VMEM no longer scales
    # with read length x batch
    y_space = pl.ANY if USE_RINGS else pltpu.VMEM
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N // K,),
        in_specs=[
            pl.BlockSpec(memory_space=y_space),
            pl.BlockSpec(memory_space=y_space),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        # outputs live in HBM and are filled by explicit async DMAs from
        # VMEM scratch — see the provenance comment in the kernel
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
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
            pltpu.SMEM((2 * B,), jnp.int32),     # so_s
            pltpu.VMEM((BC, 128), jnp.float32),  # ohP
            pltpu.VMEM((BC, 128), jnp.float32),  # ohFro
            pltpu.VMEM((BC, 128), jnp.float32),  # ohG
            pltpu.VMEM((BC, 128), jnp.float32),  # ohG2
            pltpu.VMEM((BC, 1), jnp.float32),    # seeds
            pltpu.VMEM((BC, 1), jnp.float32),    # mx0s
            pltpu.VMEM((BC, 1), jnp.float32),    # mx
            pltpu.VMEM((BC, 1), jnp.float32),    # mx1s
            pltpu.VMEM((BC, max(S0, S1)), jnp.float32),  # tmp
            pltpu.SMEM((8 * B, 128), jnp.int32),  # plan_s
            pltpu.VMEM((PB, 128), jnp.int32),     # pv_s (packed prov accum)
            pltpu.SemaphoreType.DMA((6,)),        # dma_sem
            pltpu.SMEM((2 * B,), jnp.int32),      # hiw_s (live spans)
            # emission rings (dummy-sized when planes are VMEM-resident)
            pltpu.VMEM((8 * B, RING0) if USE_RINGS else (8, 128),
                       jnp.float32),              # yr0
            pltpu.VMEM((8 * B, RING1) if USE_RINGS else (8, 128),
                       jnp.float32),              # yr1
            pltpu.SMEM((2 * B,), jnp.int32),      # ybs_s (ring bases)
        ],
    )
    prov, sco, valid = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((((N + 127) // 128) * PB, 128), jnp.int32),
            jax.ShapeDtypeStruct((PB, 128), jnp.float32),
            jax.ShapeDtypeStruct((PB, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(y1p, y2p, plan_mat)
    return prov, sco, valid


def _traceback(words: np.ndarray, sco: np.ndarray, valid: np.ndarray,
               n_steps: int, W: int, A: int, alphabet: str) -> str:
    """words [N] bit-packed provenance for one pair: bits 0-1 step type,
    bits 2+6w winner w's slot + 1 (0 = none)."""
    C = W * (A + 1)
    scores = np.where(valid[:C] > 0, sco[:C], -np.inf)
    j = int(np.argmax(scores))
    chars = []
    for t in range(n_steps - 1, -1, -1):
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


# VMEM the kernel may allocate per launch (vmem_limit is 100 MB)
_VMEM_BUDGET = 88 * 1024 * 1024


def _vmem_est(B: int, Wst0: int, Wst1: int, RING0: int, RING1: int,
              L1: int, L2: int, use_rings: bool) -> int:
    """Scratch bytes _run_kernel will request (mirrors scratch_shapes).
    With use_rings=False the emission planes are VMEM-resident inputs and
    count in full; with rings only the ring buffers count."""
    CH = 128
    CP, PB = 32, max(B, 8)
    BC = B * CP
    S0 = ((Wst0 + 3 * CH + 127) // 128) * 128
    S1 = ((Wst1 + 3 * CH + 127) // 128) * 128
    b = 2 * BC * (S0 + S1) * 4              # st/ps both axes
    b += 8 * PB * 128 * 4                   # K1..SCO
    b += 4 * BC * 128 * 4                   # ohP ohFro ohG ohG2
    b += 4 * BC * 4                         # seeds mx0s mx mx1s
    b += BC * max(S0, S1) * 4               # tmp
    b += 2 * PB * 128 * 4                   # pv_s + slack
    if use_rings:
        b += 8 * B * (RING0 + RING1) * 4    # emission rings
    else:
        b += 8 * B * (L1 + L2) * 4          # VMEM-resident emission planes
    return b


def prepare_pairs(pairs, beam_width: int = 5, alphabet: str = "ACGT",
                  steps_per_grid: int | None = None,
                  device_put: bool = True):
    """Host-side stage of the batched pair kernel: plans, geometry, packed
    planes; returns a prep dict whose ``dev`` arrays are already enqueued
    for transfer (jax.device_put is async). Splitting prepare / launch /
    fetch lets callers overlap the H2D of the next wave with the device
    compute of the current one — on a tunneled dev chip the transfer is
    ~2s for a 5-pair wave (~40 MB at ~20 MB/s), comparable to the kernel
    itself; on a production host PCIe makes it negligible.

    The wide-window split cap is chosen adaptively: splitting bounds VMEM
    (storage strips + emission rings) but lengthens the plan with CONT
    steps (~2x on the bundled pairs at cap 256 — the r03 regression), so
    the loosest cap whose scratch fits the VMEM budget wins. Every cap
    yields bit-identical output (split boundaries sit on the kernel's own
    128-column chunk grid).
    """
    from .beam2d_planned import build_plan

    B = len(pairs)
    A = len(alphabet)
    W = beam_width
    CH = 128

    raw_plans = []
    ys = []
    for y1, y2, envelope in pairs:
        y1 = np.asarray(y1)
        y2 = np.asarray(y2)
        U, V = len(y1), len(y2)
        if envelope is None:
            envelope = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
        env = np.asarray(envelope, dtype=np.int64)[:U]
        raw_plans.append(build_plan(env, U, V))
        ys.append((y1, y2))

    T1 = max(len(y1) for y1, _ in ys)
    T2 = max(len(y2) for _, y2 in ys)
    L1 = ((T1 + CH + 8 + 127) // 128) * 128
    L2 = ((T2 + CH + 8 + 127) // 128) * 128

    def bucket(x, buckets=(384, 768, 1536, 2048, 3072)):
        for bk in buckets:
            if x <= bk:
                return bk
        return ((x + 1023) // 1024) * 1024

    # emission-ring sizes: every RREF-step block's reads must fit the ring
    # filled from the previous block boundary's eviction anchor (base 0 for
    # block 0). Exact per-block simulation of what the kernel will do; +256
    # covers chunk-origin alignment and ceil-to-CH read slop.
    def ring_required(plans_lohi):
        need = 1024
        for lo, hi, sw, sm in plans_lohi:
            n = len(lo)
            read_hi = np.where(sw, hi + 2 * CH, 0)
            base = np.clip(sm, 0, None)
            for k0 in range(0, n, RREF):
                blk_base = 0 if k0 == 0 else int(base[k0 - 1])
                blk_need = int(read_hi[k0:k0 + RREF].max(initial=0))
                need = max(need, blk_need - blk_base)
        return ((need + 1023) // 1024) * 1024

    # per-step eviction for small batches (see sweep_axis comment):
    # tighter spans + faster steps; block-scheduled beyond B=8.
    # steps_per_grid is coupled: with per-step eviction the unrolled
    # conditional shift regions schedule poorly at K>1 (measured 1.51s at
    # K=1 vs 2.03s at K=4 on the bundled pairs); with the uniform block
    # pass more steps per grid amortize grid overhead (2.25s at K=4 vs
    # 2.54s at K=1).
    evict_step = B <= 8
    if steps_per_grid is None:
        steps_per_grid = 1 if evict_step else 4

    def geometry(cap):
        plans = (raw_plans if cap is None
                 else [_split_wide(p, cap=cap) for p in raw_plans])
        anchors = [_plan_anchors(p) for p in plans]
        spans = [_plan_spans(p, sm0, sm1, evict_step)
                 for p, (sm0, sm1) in zip(plans, anchors)]
        w0 = max(
            int(np.where(p["type"] != C1RUN,
                         p["a_hi"] - p["a_lo"], 0).max())
            for p in plans)
        w1 = max(
            int(np.where(p["type"] != C0RUN,
                         p["b_hi"] - p["b_lo"], 0).max())
            for p in plans)
        s0 = max(s[0] for s in spans)
        s1 = max(s[1] for s in spans)
        # storage must hold the full live span [anchor, window hi); the
        # kernel's forced-eviction fallback (his - WF) must never rise
        # past the anchor, which holds when Wst + 2*CH >= span
        Wst0 = bucket(max(w0, s0, 1) + 2)
        Wst1 = bucket(max(w1, s1, 1) + 2)
        RING0 = min(ring_required(
            [(p["a_lo"], p["a_hi"],
              (p["type"] != C1RUN) & (p["a_hi"] > p["a_lo"]), sm0)
             for p, (sm0, _) in zip(plans, anchors)]), L1)
        RING1 = min(ring_required(
            [(p["b_lo"], p["b_hi"],
              (p["type"] != C0RUN) & (p["b_hi"] > p["b_lo"]), sm1)
             for p, (_, sm1) in zip(plans, anchors)]), L2)
        return plans, anchors, Wst0, Wst1, RING0, RING1

    # pick the loosest configuration that fits VMEM: resident planes beat
    # rings, an unsplit plan beats CONT splitting (each tighter setting
    # costs per-step time; all settings are bit-identical in output)
    chosen = None
    for cap in (None, 1024, 512, 256):
        plans, anchors, Wst0, Wst1, RING0, RING1 = geometry(cap)
        for use_rings in (False, True):
            if _vmem_est(B, Wst0, Wst1, RING0, RING1, L1, L2,
                         use_rings) <= _VMEM_BUDGET:
                chosen = (plans, anchors, Wst0, Wst1, RING0, RING1,
                          use_rings)
                break
        if chosen:
            break
    if chosen is None:
        # last resort: tightest split with rings, let Mosaic arbitrate
        chosen = (plans, anchors, Wst0, Wst1, RING0, RING1, True)
    plans, anchors, Wst0, Wst1, RING0, RING1, use_rings = chosen
    has_cont = any(bool((p["type"] >= CONT0).any()) for p in plans)

    N = max(len(p["type"]) for p in plans)
    N_pad = ((N + 511) // 512) * 512
    Lp = ((N_pad + 127) // 128) * 128

    y1p = np.concatenate([_pack_plane(y1, L1) for y1, _ in ys])
    y2p = np.concatenate([_pack_plane(y2, L2) for _, y2 in ys])

    plan_mat = np.zeros((8 * B, Lp), np.int32)
    for b, p in enumerate(plans):
        n = len(p["type"])
        plan_mat[8 * b + 0, :n] = p["type"]
        plan_mat[8 * b + 0, n:N_pad] = C0RUN  # zero-width no-op padding
        plan_mat[8 * b + 1, :n] = p["a_lo"]
        plan_mat[8 * b + 2, :n] = p["a_hi"]
        plan_mat[8 * b + 3, :n] = p["b_lo"]
        plan_mat[8 * b + 4, :n] = p["b_hi"]
        # rows 5/6: tight eviction anchors (_plan_anchors). Evicting up to
        # them keeps the live storage span (and the per-step permute/
        # refresh gathers over it) short; outputs are bit-identical because
        # evicted-early lanes are provably never read.
        sm0, sm1 = anchors[b]
        plan_mat[8 * b + 5, :n] = sm0.astype(np.int32)
        plan_mat[8 * b + 6, :n] = sm1.astype(np.int32)
        if n < N_pad:
            plan_mat[8 * b + 5, n:N_pad] = plan_mat[8 * b + 5, n - 1]
            plan_mat[8 * b + 6, n:N_pad] = plan_mat[8 * b + 6, n - 1]
    plan_mat = plan_mat[:, :N_pad]

    if device_put:
        dev = (jax.device_put(y1p), jax.device_put(y2p),
               jax.device_put(plan_mat))
    else:
        dev = (jnp.asarray(y1p), jnp.asarray(y2p), jnp.asarray(plan_mat))
    return dict(
        dev=dev, B=B, W=W, A=A, Wst0=Wst0, Wst1=Wst1, CH=CH, L1=L1, L2=L2,
        K=steps_per_grid,
        RING0=RING0 if use_rings else 128,
        RING1=RING1 if use_rings else 128,
        use_rings=use_rings, has_cont=has_cont, evict_step=evict_step,
        n_steps=[len(p["type"]) for p in plans], alphabet=alphabet,
    )


def launch_prepared(prep):
    """Dispatch the kernel for a prepared batch; returns device arrays
    without blocking (JAX async dispatch)."""
    return _run_kernel(
        *prep["dev"], prep["B"], prep["W"], prep["A"],
        prep["Wst0"], prep["Wst1"], prep["CH"], prep["L1"], prep["L2"],
        K=prep["K"], RING0=prep["RING0"], RING1=prep["RING1"],
        USE_RINGS=prep["use_rings"], HAS_CONT=prep["has_cont"],
        EVICT_STEP=prep["evict_step"])


def fetch_prepared(prep, outs) -> list[str]:
    """Block on the kernel outputs, pull the packed provenance to host
    (~0.4 bytes/step/pair) and walk the tracebacks."""
    prov, sco, valid = outs
    B, W, A = prep["B"], prep["W"], prep["A"]
    PB = max(B, 8)
    # [n_blocks, PB, 128] packed words; pair b's step i word sits at
    # block i//128, row b, lane i%128
    prov = np.asarray(prov).reshape(-1, PB, 128)
    sco = np.asarray(sco)
    valid = np.asarray(valid)
    out = []
    for b in range(B):
        words = prov[:, b, :].reshape(-1)
        out.append(_traceback(words, sco[b], valid[b],
                              prep["n_steps"][b], W, A, prep["alphabet"]))
    return out


def pair_beam_pallas_batch(pairs, beam_width: int = 5,
                           alphabet: str = "ACGT",
                           steps_per_grid: int | None = None) -> list[str]:
    """Batched Pallas row_col pair beam search (plain CTC).

    pairs: list of (y1, y2, envelope). All pairs share one kernel launch;
    plans are padded to the longest with zero-width catch-runs. See
    prepare_pairs for the adaptive VMEM configuration."""
    prep = prepare_pairs(pairs, beam_width=beam_width, alphabet=alphabet,
                         steps_per_grid=steps_per_grid)
    return fetch_prepared(prep, launch_prepared(prep))
