"""Reference-exact mode: the planned engine's eviction graveyard must
reproduce the C++ grace-oracle (native/pair_beam_cpu.cpp emulate mode with
a grace period) and, at the exact-mode depth, the reference's unbounded
trie itself (PrefixTree.h:74-148 semantics)."""
import numpy as np
import pytest

from poreover_tpu import native
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned, _planned_scan, build_plan
from poreover_tpu.ops.beam2d_planned import C0RUN, C1RUN

rng = np.random.default_rng(21)


def softmax_log(T, S=5):
    x = rng.normal(size=(T, S)) * 2
    return x - np.log(np.exp(x).sum(1, keepdims=True))


def cases():
    out = []
    for (U, V) in [(40, 36), (70, 80), (120, 110)]:
        y1, y2 = softmax_log(U), softmax_log(V)
        lo = np.clip(np.arange(U) * V // U - 6, 0, V - 1)
        hi = np.clip(np.arange(U) * V // U + 8, 1, V)
        env = np.stack([lo, hi], axis=1).astype(np.int64)
        out.append((y1, y2, env))
    return out


def _engine(y1, y2, env, G, grace):
    import jax.numpy as jnp
    import jax

    U, V = len(y1), len(y2)
    plan = build_plan(env, U, V)
    w0 = np.where(plan["type"] != C1RUN, plan["a_hi"] - plan["a_lo"], 0)
    w1 = np.where(plan["type"] != C0RUN, plan["b_hi"] - plan["b_lo"], 0)
    Wst0 = int(max(w0.max(), 1)) + 2
    Wst1 = int(max(w1.max(), 1)) + 2
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    first_char, chars = _planned_scan(
        jnp.asarray(y1, dtype), jnp.asarray(y2, dtype),
        jnp.asarray(plan["type"]), jnp.asarray(plan["a_lo"]),
        jnp.asarray(plan["a_hi"]), jnp.asarray(plan["b_lo"]),
        jnp.asarray(plan["b_hi"]), 0, 5, 4, Wst0, Wst1,
        G=G, grace=grace,
    )
    out = [int(first_char)] + [int(c) for c in np.asarray(chars)]
    return "".join("ACGT"[c] for c in out if c >= 0)


@pytest.mark.parametrize("grace", [2, 4, 8, 20])
def test_graveyard_matches_grace_oracle(grace):
    for y1, y2, env in cases():
        want = native.pair_beam_row_col_cpu_emul_grace(
            y1, y2, env, beam_width=5, grace=grace)
        got = _engine(y1, y2, env, G=32, grace=grace)
        assert got == want, (grace, len(got), len(want))


def test_exact_mode_matches_unbounded_trie():
    for y1, y2, env in cases():
        want = native.pair_beam_row_col_cpu(y1, y2, env, beam_width=5)
        got = beam_search_2d_planned(y1, y2, env, beam_width=5, exact=True)
        assert got == want, (len(got), len(want))


def test_grace1_unchanged():
    """G > 0 with grace=1 must reproduce the default windowed engine."""
    for y1, y2, env in cases():
        base = beam_search_2d_planned(y1, y2, env, beam_width=5)
        got = _engine(y1, y2, env, G=16, grace=1)
        assert got == base


def test_segmented_exact_batch_bit_identical():
    """The segmented exact engine (bounded-length scan launches, carried
    candidate+graveyard state; the r5 workaround for the TPU worker's
    program-size fault) must equal the one-launch batch bit-for-bit,
    at a segment length that forces several segments per pair."""
    from poreover_tpu.ops.beam2d_planned import (
        beam_search_2d_planned_batch,
        beam_search_2d_planned_batch_seg,
    )

    pairs = list(cases())
    want = beam_search_2d_planned_batch(pairs, beam_width=5, exact=True)
    got = beam_search_2d_planned_batch_seg(pairs, beam_width=5,
                                           exact=True, seg=64)
    assert got == want
