"""Differential tests for the Pallas TPU pair-beam kernels.

Run on real TPU hardware with:
    POREOVER_TPU_TESTS=1 python -m pytest tests/test_pallas.py -v

Skipped on the default CPU test mesh (the kernels are Mosaic/TPU-only).
Both kernels must reproduce the XLA planned engine byte-for-byte: the XLA
engine is itself validated against the f64 windowed-semantics C++ oracle
(native/pair_beam_cpu.cpp emulate mode) and the enumeration oracles.
"""
import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu",
    reason="Pallas TPU kernels need real TPU hardware "
    "(set POREOVER_TPU_TESTS=1 on a TPU machine)",
)

rng = np.random.default_rng(7)


def softmax_log(T, S=5):
    x = rng.normal(size=(T, S)) * 2
    return (x - np.log(np.exp(x).sum(1, keepdims=True))).astype(np.float32)


def cases():
    out = []
    for (U, V) in [(40, 300), (60, 50), (25, 25)]:
        y1, y2 = softmax_log(U), softmax_log(V)
        env = np.tile(np.array([0, V], dtype=np.int64), (U, 1))
        out.append((y1, y2, env))
    U, V = 80, 90
    y1, y2 = softmax_log(U), softmax_log(V)
    env = np.stack(
        [np.clip(np.arange(U) - 10, 0, V - 1),
         np.clip(np.arange(U) + 15, 1, V)], axis=1
    ).astype(np.int64)
    out.append((y1, y2, env))
    # envelope degeneracies that force plan windows > the 256-column split
    # cap on BOTH axes (a tall stack of rows covering the same columns
    # inflates the transposed first+count extents; one wide row inflates a
    # row window), exercising the CONT0/CONT1 continuation-step path. The
    # XLA reference engine decodes the UNSPLIT plan, so equality proves
    # the split is exact.
    U, V = 420, 460
    y1, y2 = softmax_log(U), softmax_log(V)
    lo = np.clip(np.arange(U) - 8, 0, V - 1)
    hi = np.clip(np.arange(U) + 12, 1, V)
    lo[50:340] = 40
    hi[50:340] = 64
    lo[340:350] = 40
    hi[340:350] = 440
    env = np.stack([lo, hi], axis=1).astype(np.int64)
    out.append((y1, y2, env))
    return out


@pytest.fixture(scope="module")
def refs():
    from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned

    cs = cases()
    return cs, [beam_search_2d_planned(y1, y2, env, beam_width=5)
                for y1, y2, env in cs]


def test_single_kernel_matches_xla(refs):
    from poreover_tpu.ops.pallas_pair_beam import pair_beam_pallas

    cs, expected = refs
    for (y1, y2, env), exp in zip(cs, expected):
        assert pair_beam_pallas(y1, y2, env, beam_width=5) == exp


def test_batch_kernel_matches_xla_b1(refs):
    from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

    cs, expected = refs
    for c, exp in zip(cs, expected):
        assert pair_beam_pallas_batch([c], beam_width=5)[0] == exp


def test_batch_kernel_matches_xla_b4(refs):
    from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

    cs, expected = refs
    outs = pair_beam_pallas_batch(cs, beam_width=5)
    assert outs == expected


def test_batch_kernel_matches_xla_b8(refs):
    """Batch > 4 crosses the 128-row one-hot group boundary (BC > 128):
    the multi-group gather path must compile and stay exact. Round 1's
    driver crash (XLA CHECK 'limits[i] <= dim(i)') lived exactly here."""
    from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

    cs, expected = refs
    cs8 = (cs * 2)[:8]
    exp8 = (expected * 2)[:8]
    outs = pair_beam_pallas_batch(cs8, beam_width=5)
    assert outs == exp8


@pytest.mark.skipif(
    not pytest.importorskip("os").path.exists(
        "/root/reference/data/reads/read1.npy"),
    reason="bundled reads not present")
def test_real_read_scale():
    """The exact bench configuration: bundled read pair, real envelope,
    U,V ~ 62k/75k, single + batch-8 kernels. Guards against lowering bugs
    that only degenerate at real-read scale (round-1 bench crash class).
    Output must match the f64 windowed-semantics C++ oracle byte-for-byte."""
    from poreover_tpu.decoding import envelope as em
    from poreover_tpu.decoding.pair import get_sequence_mapping
    from poreover_tpu.io.trace import model_from_trace
    from poreover_tpu import native
    from poreover_tpu.ops.pallas_pair_beam import pair_beam_pallas
    from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

    m1 = model_from_trace("/root/reference/data/reads/read1.npy", "poreover")
    m2 = model_from_trace("/root/reference/data/reads/read2.npy", "poreover")
    m2.reverse_complement()
    b1, p1 = m1.viterbi_decode(return_path=True)
    b2, p2 = m2.viterbi_decode(return_path=True)
    s2s1, _ = get_sequence_mapping(p1, "poreover")
    s2s2, _ = get_sequence_mapping(p2, "poreover")
    a1, a2 = native.global_pair_banded(b1, b2)
    alignment = np.array([list(a1), list(a2)])
    cols = em.get_alignment_columns(alignment)
    env = em.build_envelope(m1.log_prob, m2.log_prob, cols, s2s1, s2s2,
                            padding=5)

    oracle = native.pair_beam_row_col_cpu_emul(
        m1.log_prob, m2.log_prob, env, beam_width=5)
    single = pair_beam_pallas(m1.log_prob, m2.log_prob, env, beam_width=5)
    assert single == oracle
    outs = pair_beam_pallas_batch(
        [(m1.log_prob, m2.log_prob, env)] * 8, beam_width=5)
    assert all(o == oracle for o in outs)


def test_beam1d_kernel_matches_xla_engine():
    """Pallas 1D beam kernel == XLA engine (ops/beam.py) on mixed-length
    synthetic reads, width 25 (the reference 1D default). The XLA engine
    is itself pinned to the enumeration oracles and the C++ trie
    (tests/test_beam.py)."""
    from poreover_tpu.ops.beam import beam_search_batch
    from poreover_tpu.ops.pallas_beam1d import beam1d_pallas_batch

    ys = [softmax_log(T) for T in (300, 257, 512, 100, 421, 380, 256, 64)]
    got = beam1d_pallas_batch(ys, beam_width=25)
    want = beam_search_batch(ys, beam_width=25)
    assert got == want


def test_beam1d_kernel_all_model_kinds():
    """The r5 generalized kernel (2-component node state) == XLA engine
    for bonito (ctc_merge_repeats, PrefixTree.h:649-663) and flip-flop
    (ctc_flipflop, PrefixTree.h:548-574); flip-flop reads 2A emission
    columns and no gap plane."""
    from poreover_tpu.ops.beam import beam_search_batch
    from poreover_tpu.ops.pallas_beam1d import beam1d_pallas_batch

    for model, S in (("ctc_merge_repeats", 5), ("ctc_flipflop", 8)):
        ys = [softmax_log(T, S) for T in (300, 257, 512, 100, 401, 77)]
        got = beam1d_pallas_batch(ys, beam_width=25, model=model)
        want = beam_search_batch(ys, beam_width=25, model=model)
        assert got == want, model
