"""ctypes bindings for the native host runtime (native/poreover_native.cpp).

Builds on demand with the repo Makefile if the shared library is missing.
A pure-numpy fallback with identical semantics exists in
``poreover_tpu.ops.nw`` for environments without a C++ toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path

_NATIVE_DIR = Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libporeover_native.so"

_lib = None


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", str(_NATIVE_DIR)],
            check=True,
            capture_output=True,
        )
        return _LIB_PATH.exists()
    except Exception:
        return False


def load():
    """Load (building if needed) the native library; None if unavailable."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists() and not _build():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.nw_global_pair.restype = ctypes.c_int
    lib.nw_global_pair.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.nw_global_pair_banded.restype = ctypes.c_int
    lib.nw_global_pair_banded.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    import numpy as _np
    from numpy.ctypeslib import ndpointer

    lib.nw_fit_align.restype = ctypes.c_int
    lib.nw_fit_align.argtypes = [
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_char_p, ctypes.c_char_p,
    ]
    lib.pair_beam_row_col_cpu.restype = ctypes.c_int
    lib.pair_beam_row_col_cpu.argtypes = [
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_char_p,
    ]
    lib.pair_beam_row_col_cpu_emul.restype = ctypes.c_int
    lib.pair_beam_row_col_cpu_emul.argtypes = (
        lib.pair_beam_row_col_cpu.argtypes
    )
    lib.pair_beam_row_col_cpu_emul_grace.restype = ctypes.c_int
    lib.pair_beam_row_col_cpu_emul_grace.argtypes = [
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
    ]
    lib.pair_beam_row_col_cpu_emul_stats.restype = ctypes.c_int
    lib.pair_beam_row_col_cpu_emul_stats.argtypes = [
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ndpointer(_np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.pair_beam_row_col_cpu_emul_trace.restype = ctypes.c_int
    lib.pair_beam_row_col_cpu_emul_trace.argtypes = [
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ndpointer(_np.int64, flags="C_CONTIGUOUS"),
        ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
        ndpointer(_np.float64, flags="C_CONTIGUOUS"),
        ndpointer(_np.int64, flags="C_CONTIGUOUS"),
    ]
    lib.beam_search_1d_cpu.restype = ctypes.c_int
    lib.beam_search_1d_cpu.argtypes = [
        ndpointer(_np.float64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ctypes.c_int, ctypes.c_char_p,
    ]
    lib.plan_walk_native.restype = ctypes.c_int
    lib.plan_walk_native.argtypes = [
        ndpointer(_np.int64, flags="C_CONTIGUOUS"), ctypes.c_int,
        ctypes.c_int, ndpointer(_np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    _lib = lib
    return _lib


def beam_search_1d_cpu(y, beam_width: int = 25) -> str:
    """Single-core CPU 1D CTC beam search (trie + hashmaps) — the measured
    baseline stand-in for the reference's cpp_beam_search
    (BeamSearch.h:18-58)."""
    import numpy as np

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y = np.ascontiguousarray(y, dtype=np.float64)
    out = ctypes.create_string_buffer(len(y) + 1)
    n = lib.beam_search_1d_cpu(y, len(y), beam_width, out)
    return out.value[:n].decode()


def plan_walk_native(env, U: int, V: int):
    """C++ plan builder (see native/plan_walk.cpp); returns the same dict
    as beam2d_planned.plan_walk or None if the library is unavailable."""
    import numpy as np

    lib = load()
    if lib is None or not hasattr(lib, "plan_walk_native"):
        return None
    env = np.ascontiguousarray(env, dtype=np.int64)
    cap = U + V + 2
    out = np.empty((cap, 5), np.int32)
    n = lib.plan_walk_native(env, U, V, out.reshape(-1), cap)
    if n < 0:
        return None
    arr = out[:n]
    return dict(
        type=arr[:, 0].copy(), a_lo=arr[:, 1].copy(), a_hi=arr[:, 2].copy(),
        b_lo=arr[:, 3].copy(), b_hi=arr[:, 4].copy(),
    )


def fit_align(query: str, ref_window: str, match=2, mismatch=-1, gap_cost=-1):
    """Fitting alignment: query global, reference-window overhang free."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    buflen = len(query) + len(ref_window) + 1
    out_q = ctypes.create_string_buffer(buflen)
    out_r = ctypes.create_string_buffer(buflen)
    n = lib.nw_fit_align(
        query.encode(), len(query), ref_window.encode(), len(ref_window),
        match, mismatch, gap_cost, out_q, out_r,
    )
    return out_q.value[:n].decode(), out_r.value[:n].decode()


def pair_beam_row_col_cpu(y1, y2, envelope, beam_width: int = 5) -> str:
    """Single-core CPU row_col pair beam search (plain CTC) — the measured
    baseline stand-in for the reference's C++ decoder."""
    import numpy as np

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y1 = np.ascontiguousarray(y1, dtype=np.float64)
    y2 = np.ascontiguousarray(y2, dtype=np.float64)
    env = np.ascontiguousarray(envelope, dtype=np.int64)
    out = ctypes.create_string_buffer(len(y1) + len(y2) + 1)
    n = lib.pair_beam_row_col_cpu(
        y1, len(y1), y2, len(y2), env, beam_width, out
    )
    return out.value[:n].decode()


def pair_beam_row_col_cpu_emul_grace(
    y1, y2, envelope, beam_width: int = 5, grace: int = 1,
    return_stats: bool = False,
):
    """Windowed-memo oracle with an eviction grace period (graveyard depth
    grace-1). ``grace=1`` reproduces the TPU engines' semantics exactly;
    on the bundled real pair ``grace=18`` makes the output byte-identical
    to the unbounded-memo trie (measured max graveyard 97 nodes — see
    docs/EXACTNESS.md). With return_stats, also returns the int64[35]
    stats vector: [0] max graveyard size, [1..31] rejoin-absence
    histogram, [32] rejoins after full eviction, [33] prunes whose
    keep/drop boundary scores were bit-equal f64 ties (beam membership is
    then tie-break-order dependent), [34] 1 if the final top-1 score tied
    the runner-up."""
    import numpy as np

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y1 = np.ascontiguousarray(y1, dtype=np.float64)
    y2 = np.ascontiguousarray(y2, dtype=np.float64)
    env = np.ascontiguousarray(envelope, dtype=np.int64)
    out = ctypes.create_string_buffer(len(y1) + len(y2) + 1)
    if return_stats:
        stats = np.zeros(35, np.int64)
        n = lib.pair_beam_row_col_cpu_emul_stats(
            y1, len(y1), y2, len(y2), env, beam_width, grace, out, stats
        )
        return out.value[:n].decode(), stats
    n = lib.pair_beam_row_col_cpu_emul_grace(
        y1, len(y1), y2, len(y2), env, beam_width, grace, out
    )
    return out.value[:n].decode()


def pair_beam_row_col_cpu_emul_trace(y1, y2, envelope, beam_width: int = 5,
                                     grace: int = 1):
    """Windowed-memo oracle with a per-prune diagnostic trace. Returns
    (seq, scores [n_steps, W] f64 post-prune beam scores, uv [n_steps, 2]
    the (u, v) at each prune step) — used to bisect engine-vs-oracle
    divergences (docs/EXACTNESS.md)."""
    import numpy as np

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y1 = np.ascontiguousarray(y1, dtype=np.float64)
    y2 = np.ascontiguousarray(y2, dtype=np.float64)
    env = np.ascontiguousarray(envelope, dtype=np.int64)
    cap = len(y1) + len(y2)
    out = ctypes.create_string_buffer(cap + 1)
    trace = np.full((cap, beam_width), -np.inf)
    meta = np.zeros(1 + 2 * cap, np.int64)
    n = lib.pair_beam_row_col_cpu_emul_trace(
        y1, len(y1), y2, len(y2), env, beam_width, grace, out, trace, meta
    )
    ns = int(meta[0])
    return (out.value[:n].decode(), trace[:ns],
            meta[1:1 + 2 * ns].reshape(ns, 2).copy())


def pair_beam_row_col_cpu_emul(y1, y2, envelope, beam_width: int = 5) -> str:
    """Diagnostic: CPU pair beam with the TPU engines' windowed-table memo
    semantics (evicted nodes lose live history; children read an eviction
    snapshot). Used to attribute TPU-vs-C++ output differences."""
    import numpy as np

    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    y1 = np.ascontiguousarray(y1, dtype=np.float64)
    y2 = np.ascontiguousarray(y2, dtype=np.float64)
    env = np.ascontiguousarray(envelope, dtype=np.int64)
    out = ctypes.create_string_buffer(len(y1) + len(y2) + 1)
    n = lib.pair_beam_row_col_cpu_emul(
        y1, len(y1), y2, len(y2), env, beam_width, out
    )
    return out.value[:n].decode()


def global_pair(seq1: str, seq2: str, match=2, mismatch=-1, gap_cost=-1):
    lib = load()
    if lib is None:
        from .ops.nw import global_pair_py

        return global_pair_py(seq1, seq2, match, mismatch, gap_cost)
    buflen = len(seq1) + len(seq2) + 1
    out1 = ctypes.create_string_buffer(buflen)
    out2 = ctypes.create_string_buffer(buflen)
    n = lib.nw_global_pair(
        seq1.encode(), len(seq1), seq2.encode(), len(seq2),
        match, mismatch, gap_cost, out1, out2,
    )
    return out1.value[:n].decode(), out2.value[:n].decode()


def global_pair_banded(
    seq1: str, seq2: str, band_width=500, match=2, mismatch=-1, gap_cost=-1
):
    lib = load()
    if lib is None:
        from .ops.nw import global_pair_banded_py

        return global_pair_banded_py(seq1, seq2, band_width, match, mismatch, gap_cost)
    buflen = len(seq1) + len(seq2) + 1
    out1 = ctypes.create_string_buffer(buflen)
    out2 = ctypes.create_string_buffer(buflen)
    n = lib.nw_global_pair_banded(
        seq1.encode(), len(seq1), seq2.encode(), len(seq2),
        band_width, match, mismatch, gap_cost, out1, out2,
    )
    return out1.value[:n].decode(), out2.value[:n].decode()
