"""Pallas 1D CTC beam-search kernel (all three reference model kinds).

The 1D analogue of the 2D pair kernels: the reference's hot loop
(BeamSearch.h:18-58, pruning Beam.h:93-108) as ONE sequential-grid kernel
over time steps, B reads in lockstep. Unlike the 2D search there is no
envelope/window storage: a candidate's state is two floats (the
reference's 2-component node state), so the whole beam state is nine
[B, 128] planes and the per-step body is pure VPU lane work:

- candidate table: C = W*(A+1) lanes (W=25, A=4 -> 125 <= 128): W "stay"
  slots then W*A children, exactly the XLA engine's layout (ops/beam.py).
- winner selection: W rounds of masked max + first-lane + key-dedup
  sweep — the same selection the 2D kernels use, equivalent to the XLA
  engine's tril-dedup + lax.top_k because duplicate keys carry identical
  states (ops/beam.py:178-180).
- stay/child updates: per-winner masked-max hash-join lookups against
  the old table (125 tiny [B,128] reductions replace the XLA engine's
  [B,125,125] equality cubes — the reason that engine's per-step cost is
  ~125x this one's). The update rule is the reference's per-model node
  state (ops/beam.py _node_update):
    ctc                : (prob, -inf)      PrefixTree.h:478-489
    ctc_merge_repeats  : (gap, no_gap)     PrefixTree.h:649-663  (bonito)
    ctc_flipflop       : (flip, flop)      PrefixTree.h:548-574
  Node score for pruning/top is logaddexp(state0, state1) in every kind.
- emissions: all reads share the time index, so ONE DMA per RING steps
  refreshes an [8B, RING] plane strip (A chars + gap + root cumulative
  blank, or A flips + A flops), and the per-step column select is two
  VPU ops.
- provenance: winner source lanes packed 4-per-int32, flushed to HBM
  every 128 steps; the traceback runs as a tiny jitted reverse scan on
  device (fetching raw provenance through the dev tunnel would cost more
  than the kernel).

Differentially validated against ops/beam.py (the XLA engine), which is
itself pinned to the enumeration oracles and the reference C++ trie
(tests/test_beam.py, native/beam1d_cpu.cpp).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

_NEG = np.float32(-1e30)
_M1 = np.int32(np.uint32(2654435761).astype(np.int32))
_M2 = np.int32(40503)
RING = 2048
_MODEL_IDS = {"ctc": 0, "ctc_merge_repeats": 1, "ctc_flipflop": 2}


def _build_kernel(B: int, W: int, A: int, L: int, NTOT: int, MODEL: int):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    C = W * (A + 1)
    assert C <= 128
    PB = max(B, 8)
    PW = (W + 3) // 4  # packed provenance words per step (4 x 8 bits)
    assert PW <= 8

    def kernel(y_ref, len_ref, prov_ref, st0_out, st1_out, val_out,
               K1, K2, PK1, PK2, CHR, PCH, ST0, ST1, VAL,
               yr, pv_s, dma_sem):
        i = pl.program_id(0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (PB, 128), 1)
        lane1k = jax.lax.broadcasted_iota(jnp.int32, (PB, 1024), 1)

        rb = pl.multiple_of((i // RING) * RING, 128)

        @pl.when(i % RING == 0)
        def _ring():
            cp = pltpu.make_async_copy(
                y_ref.at[:, pl.ds(rb, RING)], yr, dma_sem.at[0])
            cp.start()
            cp.wait()

        # ---- per-read emission scalars at t = i ----
        # plane rows per read: 0..A-1 chars (flips for flipflop); then
        # gap + root-cumulative-blank (ctc/bonito) or A flops (flipflop)
        col = i - rb
        ck = pl.multiple_of((col // 128) * 128, 128)
        sub = col - ck
        yv = []  # [B,1] per plane row class
        laneB = jax.lax.broadcasted_iota(jnp.int32, (B, 128), 1)
        for c in range(8):
            chunk = yr[c * B:(c + 1) * B, pl.ds(ck, 128)]
            yv.append(jnp.sum(jnp.where(laneB == sub, chunk, 0.0),
                              axis=1, keepdims=True))

        def vlan(x):  # [B,1] -> [PB,128]
            if PB > B:
                x = jnp.concatenate(
                    [x, jnp.full((PB - B, 1), _NEG, jnp.float32)], axis=0)
            return jnp.broadcast_to(x, (PB, 128))

        if MODEL == 2:
            gap_v = None
            root_v = None
        else:
            gap_v = vlan(yv[A])
            root_v = vlan(yv[A + 1])

        def flip_y(c):
            return vlan(yv[c])[:, 0:1]

        def flop_y(c):
            return vlan(yv[A + c])[:, 0:1]

        lenv = len_ref[:, 0:1]  # [PB,1] read lengths
        adv = (i < lenv) & (i > 0)  # padded steps: exact no-op
        adv_l = jnp.broadcast_to(adv, (PB, 128))

        @pl.when(i == 0)
        def _init():
            slot_c = lane - W  # child slots W..W+A-1 hold root children
            isc = (slot_c >= 0) & (slot_c < A)
            e0 = jnp.full((PB, 128), _NEG, jnp.float32)
            e0f = jnp.full((PB, 128), _NEG, jnp.float32)
            for c in range(A):
                e0 = jnp.where(slot_c == c, vlan(yv[c]), e0)
                if MODEL == 2:
                    e0f = jnp.where(slot_c == c, vlan(yv[A + c]), e0f)
            K1[:, :] = jnp.where(isc, slot_c + 1, 0)
            K2[:, :] = jnp.where(isc, slot_c + 1, 0)
            PK1[:, :] = jnp.zeros((PB, 128), jnp.int32)
            PK2[:, :] = jnp.zeros((PB, 128), jnp.int32)
            CHR[:, :] = jnp.where(isc, slot_c, -1)
            PCH[:, :] = jnp.full((PB, 128), -1, jnp.int32)
            if MODEL == 0:     # (y0[c], -inf)
                ST0[:, :] = jnp.where(isc, e0, _NEG)
                ST1[:, :] = jnp.full((PB, 128), _NEG, jnp.float32)
            elif MODEL == 1:   # (gap=-inf, no_gap=y0[c])
                ST0[:, :] = jnp.full((PB, 128), _NEG, jnp.float32)
                ST1[:, :] = jnp.where(isc, e0, _NEG)
            else:              # (flip=y0[c], flop=y0[c+A])
                ST0[:, :] = jnp.where(isc, e0, _NEG)
                ST1[:, :] = jnp.where(isc, e0f, _NEG)
            VAL[:, :] = jnp.where(isc, 1.0, 0.0)
            pv_s[:, :] = jnp.zeros((PB, 1024), jnp.int32)

        @pl.when(i > 0)
        def _step():
            k1 = K1[:, :]
            k2 = K2[:, :]
            pk1 = PK1[:, :]
            pk2 = PK2[:, :]
            chs = CHR[:, :]
            pchs = PCH[:, :]
            st0 = ST0[:, :]
            st1 = ST1[:, :]
            val = VAL[:, :]
            if MODEL == 0:
                sc = st0
            else:
                sc = jnp.logaddexp(st0, st1)

            # ---- winner selection (dedup + top-W) ----
            avail = val > 0
            BIG = jnp.int32(129)
            chpack = (chs & 255) | ((pchs + 1) << 8)
            firsts, hass, kw1s, kw2s, pk1s, pk2s, cps = (
                [], [], [], [], [], [], [])
            sts0, sts1 = [], []
            for w in range(W):
                s_m = jnp.where(avail, sc, _NEG)
                has = jnp.max(jnp.where(avail, 1.0, 0.0), axis=1,
                              keepdims=True) > 0
                m = jnp.max(s_m, axis=1, keepdims=True)
                first = jnp.min(
                    jnp.where(avail & (s_m == m), lane, BIG),
                    axis=1, keepdims=True)
                oh = lane == first

                def pick(x):
                    return jnp.sum(jnp.where(oh, x, 0), axis=1,
                                   keepdims=True)

                kw1 = pick(k1)
                kw2 = pick(k2)
                avail = avail & ~((k1 == kw1) & (k2 == kw2))
                firsts.append(first)
                hass.append(has)
                kw1s.append(kw1)
                kw2s.append(kw2)
                pk1s.append(pick(pk1))
                pk2s.append(pick(pk2))
                cps.append(pick(chpack))
                sts0.append(pick(st0).astype(jnp.float32))
                sts1.append(pick(st1).astype(jnp.float32)
                            if MODEL > 0 else None)

            vld = val > 0

            def lookup(q1, q2):
                # [B,1] query key -> old-table state (duplicates carry
                # identical state, masked max recovers the match)
                mm = vld & (k1 == q1) & (k2 == q2)
                l0 = jnp.max(jnp.where(mm, st0, _NEG), axis=1,
                             keepdims=True)
                if MODEL == 0:
                    return l0, None
                l1 = jnp.max(jnp.where(mm, st1, _NEG), axis=1,
                             keepdims=True)
                return l0, l1

            def upd(s0, s1, p0, p1, same, y_c, y_cf):
                """Reference node update: own state (s0, s1), parent state
                at t-1 (p0, p1), `same` = char == parent char."""
                if MODEL == 0:
                    return (jnp.logaddexp(p0 + y_c, s0 + gap_v[:, 0:1]),
                            None)
                if MODEL == 1:
                    n0 = jnp.logaddexp(s0, s1) + gap_v[:, 0:1]
                    src = jnp.where(same, p0, jnp.logaddexp(p0, p1))
                    n1 = jnp.logaddexp(src + y_c, s1 + y_c)
                    return n0, n1
                emit_flip = jnp.where(
                    same, p1, jnp.logaddexp(p0, p1)) + y_c
                emit_flop = jnp.where(same, p0 + y_cf, _NEG)
                n0 = jnp.logaddexp(emit_flip, s0 + y_c)
                n1 = jnp.logaddexp(emit_flop, s1 + y_cf)
                return n0, n1

            # ---- per-winner updates ----
            nk1 = jnp.zeros((PB, 128), jnp.int32)
            nk2 = jnp.zeros((PB, 128), jnp.int32)
            npk1 = jnp.zeros((PB, 128), jnp.int32)
            npk2 = jnp.zeros((PB, 128), jnp.int32)
            nch = jnp.full((PB, 128), -1, jnp.int32)
            npch = jnp.full((PB, 128), -1, jnp.int32)
            nst0 = jnp.full((PB, 128), _NEG, jnp.float32)
            nst1 = jnp.full((PB, 128), _NEG, jnp.float32)
            nval = jnp.zeros((PB, 128), jnp.float32)

            for w in range(W):
                chw = cps[w] & 255
                pchw = (cps[w] >> 8) - 1
                y_w = jnp.full((PB, 1), _NEG, jnp.float32)
                y_wf = jnp.full((PB, 1), _NEG, jnp.float32)
                for c in range(A):
                    y_w = jnp.where(chw == c, flip_y(c), y_w)
                    if MODEL == 2:
                        y_wf = jnp.where(chw == c, flop_y(c), y_wf)
                # stay: parent at t-1 (ctc root parent = cumulative blank)
                pp0, pp1 = lookup(pk1s[w], pk2s[w])
                if MODEL == 0:
                    is_root = (pk1s[w] == 0) & (pk2s[w] == 0)
                    pp0 = jnp.where(is_root, root_v[:, 0:1], pp0)
                same_w = chw == pchw
                stay0, stay1 = upd(sts0[w], sts1[w], pp0, pp1, same_w,
                                   y_w, y_wf)
                okw = hass[w]
                sel = lane == w
                nk1 = jnp.where(sel, kw1s[w], nk1)
                nk2 = jnp.where(sel, kw2s[w], nk2)
                npk1 = jnp.where(sel, pk1s[w], npk1)
                npk2 = jnp.where(sel, pk2s[w], npk2)
                nch = jnp.where(sel, chw, nch)
                npch = jnp.where(sel, pchw, npch)
                nst0 = jnp.where(sel & okw, stay0, nst0)
                if MODEL > 0:
                    nst1 = jnp.where(sel & okw, stay1, nst1)
                nval = jnp.where(sel & okw, 1.0, nval)
                # children: own prior state = table lookup, parent = winner
                for c in range(A):
                    ck1 = kw1s[w] * _M1 + (c + 1)
                    ck2 = kw2s[w] * _M2 + (c + 1)
                    cp0, cp1 = lookup(ck1, ck2)
                    child0, child1 = upd(
                        cp0, cp1, sts0[w], sts1[w], chw == c,
                        flip_y(c), flop_y(c) if MODEL == 2 else None)
                    selc = lane == (W + w * A + c)
                    nk1 = jnp.where(selc, ck1, nk1)
                    nk2 = jnp.where(selc, ck2, nk2)
                    npk1 = jnp.where(selc, kw1s[w], npk1)
                    npk2 = jnp.where(selc, kw2s[w], npk2)
                    nch = jnp.where(selc, c, nch)
                    npch = jnp.where(selc, chw, npch)
                    nst0 = jnp.where(selc & okw, child0, nst0)
                    if MODEL > 0:
                        nst1 = jnp.where(selc & okw, child1, nst1)
                    nval = jnp.where(selc & okw, 1.0, nval)

            K1[:, :] = jnp.where(adv_l, nk1, k1)
            K2[:, :] = jnp.where(adv_l, nk2, k2)
            PK1[:, :] = jnp.where(adv_l, npk1, pk1)
            PK2[:, :] = jnp.where(adv_l, npk2, pk2)
            CHR[:, :] = jnp.where(adv_l, nch, chs)
            PCH[:, :] = jnp.where(adv_l, npch, pchs)
            ST0[:, :] = jnp.where(adv_l, nst0, st0)
            if MODEL > 0:
                ST1[:, :] = jnp.where(adv_l, nst1, st1)

            VAL[:, :] = jnp.where(adv_l, nval, val)

            # ---- provenance: winner source lanes, 4 per int32; lane
            # (i%128)*PW + k of the [PB,1024] block accumulator. On
            # non-advancing steps store 0 (decoded as "no move").
            words = []
            for k in range(PW):
                word = jnp.zeros((PB, 1), jnp.int32)
                for m in range(4):
                    w = 4 * k + m
                    if w < W:
                        wv = jnp.where(hass[w] & adv,
                                       firsts[w] + 1, 0)
                        word = word | (wv << (8 * m))
                words.append(word)
            base = (i % 128) * 8
            acc = pv_s[:, :]
            for k in range(PW):
                acc = jnp.where(lane1k == base + k, words[k], acc)
            pv_s[:, :] = acc

        @pl.when((i % 128 == 127) | (i == NTOT - 1))
        def _flush():
            cp = pltpu.make_async_copy(
                pv_s, prov_ref.at[pl.ds((i // 128) * PB, PB), :],
                dma_sem.at[1])
            cp.start()
            cp.wait()

        @pl.when(i == NTOT - 1)
        def _fin():
            # outputs live in HBM (ANY): a VMEM output block would be
            # round-tripped through HBM on every step of an "arbitrary"
            # grid (see pallas_pair_beam_batch provenance note)
            for j, (src, dst) in enumerate(
                    ((ST0, st0_out), (ST1, st1_out), (VAL, val_out))):
                cp = pltpu.make_async_copy(src, dst, dma_sem.at[j % 2])
                cp.start()
                cp.wait()

    return kernel, C, PB


@partial(jax.jit, static_argnames=("B", "W", "A", "L", "MODEL"))
def _run_kernel(yp, lens, B: int, W: int, A: int, L: int, MODEL: int = 0):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = L
    kernel, C, PB = _build_kernel(B, W, A, L, N, MODEL)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(N,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((PB, 128), jnp.int32),    # K1
            pltpu.VMEM((PB, 128), jnp.int32),    # K2
            pltpu.VMEM((PB, 128), jnp.int32),    # PK1
            pltpu.VMEM((PB, 128), jnp.int32),    # PK2
            pltpu.VMEM((PB, 128), jnp.int32),    # CHR
            pltpu.VMEM((PB, 128), jnp.int32),    # PCH
            pltpu.VMEM((PB, 128), jnp.float32),  # ST0
            pltpu.VMEM((PB, 128), jnp.float32),  # ST1
            pltpu.VMEM((PB, 128), jnp.float32),  # VAL
            pltpu.VMEM((8 * B, RING), jnp.float32),  # yr
            pltpu.VMEM((PB, 1024), jnp.int32),   # pv_s
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    prov, st0, st1, val = pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((((N + 127) // 128) * PB, 1024),
                                 jnp.int32),
            jax.ShapeDtypeStruct((PB, 128), jnp.float32),
            jax.ShapeDtypeStruct((PB, 128), jnp.float32),
            jax.ShapeDtypeStruct((PB, 128), jnp.float32),
        ],
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(yp, lens)
    return prov, st0, st1, val


@partial(jax.jit, static_argnames=("W", "A", "PB"))
def _traceback_device(prov, st0, st1, val, lens, W: int, A: int, PB: int):
    """Reverse provenance walk on device (jnp scan over time)."""
    C = W * (A + 1)
    nblk = prov.shape[0] // PB
    words = prov.reshape(nblk, PB, 128, 8)
    words = jnp.transpose(words, (1, 0, 2, 3)).reshape(PB, nblk * 128, 8)

    lane = jnp.arange(128)
    sc = jnp.logaddexp(st0, st1)
    scores = jnp.where((val > 0) & (lane[None, :] < C), sc, -np.inf)
    j0 = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [PB]

    N = words.shape[1]

    def back(j, wt):
        # wt [PB, 8] packed winner source lanes (+1; 0 = no advance)
        is_child = j >= W
        c = jnp.where(is_child, (j - W) % A, -1)
        w = jnp.where(is_child, (j - W) // A, j)
        word = jnp.take_along_axis(wt, (w // 4)[:, None], axis=1)[:, 0]
        src = ((word >> (8 * (w % 4))) & 255) - 1
        moved = src >= 0
        j_prev = jnp.where(moved, src, j)
        c = jnp.where(moved, c, -1)
        return j_prev, c

    jN, chars_rev = jax.lax.scan(
        back, j0, jnp.transpose(words, (1, 0, 2)), reverse=True)
    # jN indexes the init table (root children at lanes W..W+A-1)
    first_char = jnp.where(jN >= W, (jN - W) % A, -1)
    # int8 halves nothing on-device but cuts the D2H fetch 4x (values
    # are -1..A-1); the dev tunnel moves ~20 MB/s
    return first_char.astype(jnp.int8), chars_rev.astype(jnp.int8)


def prepare_beam1d(ys, beam_width: int = 25, alphabet: str = "ACGT",
                   model: str = "ctc"):
    """Pack a read batch into device planes (async device_put).

    The batch pads to a multiple of 8 lanes (dummy length-1 reads) so the
    [8B, RING] ring DMA rows stay 8-aligned for Mosaic; fetch drops the
    padding."""
    A = len(alphabet)
    model_id = _MODEL_IDS[model]
    n_real = len(ys)
    B = max(8, ((n_real + 7) // 8) * 8)
    T = max(len(np.asarray(y)) for y in ys)
    L = ((T + RING - 1) // RING) * RING
    yp = np.full((8 * B, L), _NEG, np.float32)
    lens = np.ones((max(B, 8), 128), np.int32)
    for b, y in enumerate(ys):
        y = np.asarray(y, np.float32)
        t = len(y)
        for c in range(A):
            yp[c * B + b, :t] = y[:, c]
        if model_id == 2:
            for c in range(A):  # flop emissions at columns A..2A-1
                yp[(A + c) * B + b, :t] = y[:, A + c]
        else:
            yp[A * B + b, :t] = y[:, -1]
            # root_prev at t = cumulative blank through t-1 (ctc only)
            cum = np.cumsum(y[:, -1])
            yp[(A + 1) * B + b, 0] = 0.0
            yp[(A + 1) * B + b, 1:t] = cum[:t - 1]
        lens[b, :] = t
    return dict(dev=(jax.device_put(yp), jax.device_put(lens)),
                B=B, n_real=n_real, W=beam_width, A=A, L=L,
                alphabet=alphabet, model_id=model_id)


def launch_beam1d(prep):
    """Kernel + on-device traceback; returns small device arrays."""
    yp, lens = prep["dev"]
    B, W, A, L = prep["B"], prep["W"], prep["A"], prep["L"]
    prov, st0, st1, val = _run_kernel(yp, lens, B, W, A, L,
                                      MODEL=prep["model_id"])
    return _traceback_device(prov, st0, st1, val, lens, W, A, max(B, 8))


def fetch_beam1d(prep, outs) -> list[str]:
    first_char = np.asarray(outs[0])
    chars_rev = np.asarray(outs[1])  # [N, PB] int8
    alphabet = prep["alphabet"]
    out = []
    for b in range(prep["n_real"]):
        cs = chars_rev[:, b]
        cs = cs[cs >= 0]
        head = ([alphabet[int(first_char[b])]]
                if int(first_char[b]) >= 0 else [])
        out.append("".join(head + [alphabet[c] for c in cs]))
    return out


def beam1d_pallas_batch(ys, beam_width: int = 25, alphabet: str = "ACGT",
                        model: str = "ctc") -> list[str]:
    """Beam-search decode a batch of reads through the Pallas kernel.
    Covers all three reference model kinds (ctc / ctc_merge_repeats /
    ctc_flipflop)."""
    assert model in _MODEL_IDS
    if len(ys) == 0:
        return []
    prep = prepare_beam1d(ys, beam_width=beam_width, alphabet=alphabet,
                          model=model)
    return fetch_beam1d(prep, launch_beam1d(prep))
