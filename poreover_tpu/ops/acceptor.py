"""Banded Viterbi acceptor: align a *given* label to a probability lattice.

Equivalent of the reference's viterbi_acceptor_poreover
(poreover/decoding/Forward.h:14-121, wrapped by decoding_cpp.pyx:69-84):
banded [label x time] Viterbi over emit/stay moves, traceback returns the
per-timestep path (gap character where nothing is emitted).

TPU design: instead of a scalar double loop over (l, t), each label row is
one vectorized update over its band window. The in-row stay chain
  v(l,t) = max(emit(l,t), v(l,t-1) + y[t,gap])
is solved in closed form with a cumulative max:
  v(l,t) = G(t) + cummax_t(emit(l,t) - G(t)),   G = cumsum of gap log-probs,
so the whole DP is a ``lax.scan`` over L rows of O(band) work.

Faithfulness notes (pinned deliberately):
- The reference pushes each row's band one iteration late (Forward.h:39-42
  + :64-65), so row l's *storable* cells are row l-1's band; writes outside
  are silently clipped (SparseMatrix.h:35-42). We reproduce the effective
  intersection.
- Row 0 (pure-gap row) is only stored on [0, band] (initial push), so the
  first emission must happen within the band of t=0.
- Cells inside a stored band that are never written read as uninitialized
  memory in the C++; we treat them as -inf (the only sane semantics).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.logspace import LOG_0

_NEG_INF = LOG_0


def _band_tables(T: int, L: int, band: int):
    """Host-side exact band bookkeeping for rows 1..L.

    Returns (rs, re, stored_lo, stored_hi) each [L+1] (index by l),
    inclusive stored bounds, exclusive write end.
    """
    l = np.arange(L + 1, dtype=np.int64)
    center = (l * T) // L if L > 0 else l * 0
    rs = np.maximum(1, center - band)
    re = np.minimum(T, center + band)
    stored_lo = np.empty(L + 1, dtype=np.int64)
    stored_hi = np.empty(L + 1, dtype=np.int64)
    # rows 0 and 1 were pushed with [0, band] inclusive before the loop
    stored_lo[0:2] = 0
    stored_hi[0:2] = band
    if L >= 2:
        stored_lo[2:] = rs[1:L]
        stored_hi[2:] = re[1:L]  # SparseRow end is inclusive
    return rs, re, stored_lo, stored_hi


@partial(jax.jit, static_argnames=("W",))
def _acceptor_scan(y, label, G, rs, re, slo, shi, L, W: int):
    """Forward DP. label [Lmax] int32 padded; L true length.

    Returns (ptr_band [Lmax, W] int8, offs [Lmax] int32, v_final unused).
    """
    T = y.shape[0]
    dtype = y.dtype
    gap_col = y[:, -1]

    # row 0: gap cumsum but only stored on [0, band] (see module docstring)
    t_idx = jnp.arange(T)
    v0 = jnp.where((t_idx >= slo[0]) & (t_idx <= shi[0]), G, _NEG_INF)

    # pad helper arrays so dynamic_slice never clamps surprisingly
    pad = W + 1
    gap_pad = jnp.concatenate([jnp.full((pad,), _NEG_INF, dtype), gap_col,
                               jnp.full((pad,), _NEG_INF, dtype)])
    G_pad = jnp.concatenate([jnp.full((pad,), _NEG_INF, dtype), G,
                             jnp.full((pad,), _NEG_INF, dtype)])

    def row_step(v_prev, inp):
        l, c = inp  # l in 1..Lmax, c = label[l-1]
        off = rs[l]
        y_c_full = y[:, c]
        y_c_pad = jnp.concatenate(
            [jnp.full((pad,), _NEG_INF, dtype), y_c_full,
             jnp.full((pad,), _NEG_INF, dtype)]
        )
        v_prev_pad = jnp.concatenate(
            [jnp.full((pad,), _NEG_INF, dtype), v_prev,
             jnp.full((pad,), _NEG_INF, dtype)]
        )

        y_c = jax.lax.dynamic_slice(y_c_pad, (off + pad,), (W,))
        y_g = jax.lax.dynamic_slice(gap_pad, (off + pad,), (W,))
        v_pm1 = jax.lax.dynamic_slice(v_prev_pad, (off + pad - 1,), (W,))
        G_w = jax.lax.dynamic_slice(G_pad, (off + pad,), (W,))

        t_w = off + jnp.arange(W)
        writable = (
            (t_w < re[l])
            & (t_w >= l - 1)
            & (t_w >= slo[l])
            & (t_w <= shi[l])
            & (l <= L)
        )
        emit = jnp.where(writable, y_c + v_pm1, _NEG_INF)

        # stay-chain seed just before the window: only row 1's explicit
        # v(1,0)=y[0,c] cell can sit there (Forward.h:51)
        seed_val = jnp.where((l == 1) & (off == 1), y[0, c], _NEG_INF)
        seed_G = jnp.where(off - 1 >= 0, G_pad[off + pad - 1], 0.0)

        H = jnp.concatenate([(seed_val - seed_G)[None], emit - G_w])
        chain = jax.lax.cummax(H)  # [W+1]
        v_row_w = jnp.where(writable, G_w + chain[1:], _NEG_INF)

        stay_prev = jnp.concatenate([seed_val[None], v_row_w[:-1]])
        stay = stay_prev + y_g
        ptr = jnp.where(writable & (emit >= stay), 1, 0).astype(jnp.int8)

        # scatter window back into a full-length row vector
        v_row = jnp.full((T,), _NEG_INF, dtype)
        v_row = jax.lax.dynamic_update_slice(
            jnp.concatenate([jnp.full((pad,), _NEG_INF, dtype), v_row,
                             jnp.full((pad,), _NEG_INF, dtype)]),
            jnp.where(writable, v_row_w, _NEG_INF),
            (off + pad,),
        )[pad:pad + T]
        v_row = jnp.where((jnp.arange(T) == 0) & (l == 1), y[0, c], v_row)
        v_row = jnp.where(l <= L, v_row, v_prev)
        return v_row, (ptr, off.astype(jnp.int32))

    Lmax = label.shape[0]
    ls = jnp.arange(1, Lmax + 1)
    v_final, (ptr_band, offs) = jax.lax.scan(row_step, v0, (ls, label))
    return ptr_band, offs, v_final


@partial(jax.jit, static_argnames=("W", "gap_char", "T"))
def _traceback(ptr_band, offs, label, L, T: int, W: int, gap_char: int):
    """Reference traceback (Forward.h:99-115) as a reversed scan over t."""

    def step(l, t):
        in_rows = (l >= 1) & (l <= label.shape[0])
        row = jnp.maximum(l - 1, 0)
        w = t - offs[row]
        w_ok = (w >= 0) & (w < W)
        p = jnp.where(
            in_rows & w_ok,
            ptr_band[row, jnp.clip(w, 0, W - 1)],
            0,
        )
        p = jnp.where((l == 1) & (t == 0), 1, p)  # explicit ptr(1,0)=1
        emit_here = (p > 0) & (l > 0)
        out_char = jnp.where(emit_here, label[row], gap_char)
        l_next = jnp.where(emit_here, l - 1, l)
        return l_next, out_char.astype(jnp.int32)

    ts = jnp.arange(T)
    _, path_rev = jax.lax.scan(step, L, ts, reverse=True)
    return path_rev


def viterbi_acceptor(y, label: str, band_size: int = 1000, alphabet: str = "ACGT"):
    """Per-timestep path of ``label`` through ``y`` (ints; gap=len(alphabet)).

    Drop-in equivalent of cpp_viterbi_acceptor (decoding_cpp.pyx:69-84).
    """
    y = np.asarray(y)
    T = y.shape[0]
    L = len(label)
    gap_char = len(alphabet)
    if L == 0:
        return np.full(T, gap_char, dtype=np.int64)

    lut = {c: i for i, c in enumerate(alphabet)}
    label_int = np.array([lut[c] for c in label], dtype=np.int32)

    rs, re, slo, shi = _band_tables(T, L, band_size)
    W = int(min(2 * band_size + 2, T + 2))

    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    yj = jnp.asarray(y, dtype)
    G = jnp.cumsum(yj[:, -1])

    ptr_band, offs, _ = _acceptor_scan(
        yj,
        jnp.asarray(label_int),
        G,
        jnp.asarray(rs),
        jnp.asarray(re),
        jnp.asarray(slo),
        jnp.asarray(shi),
        jnp.asarray(L, jnp.int32),
        W,
    )
    path = _traceback(
        ptr_band,
        offs,
        jnp.asarray(label_int),
        jnp.asarray(L, jnp.int32),
        T,
        W,
        gap_char,
    )
    return np.asarray(path).astype(np.int64)
