"""Host-side geometry selection of the batched pair kernel (CPU-safe).

The kernel's static configuration (split cap, emission rings vs resident
planes, eviction scheduling, steps_per_grid) is chosen per workload by
prepare_pairs; these tests pin the selection logic without launching the
Mosaic kernel (prepare only — no _run_kernel call)."""
import numpy as np

from poreover_tpu.ops.pallas_pair_beam_batch import (
    _VMEM_BUDGET, _plan_anchors, _plan_spans, _split_wide, _vmem_est,
    prepare_pairs,
)

rng = np.random.default_rng(3)


def softmax_log(T, S=5):
    x = rng.normal(size=(T, S)) * 2
    return (x - np.log(np.exp(x).sum(1, keepdims=True))).astype(np.float32)


def mk_pair(U=600, V=640, band=40):
    y1, y2 = softmax_log(U), softmax_log(V)
    lo = np.clip((np.arange(U) * V) // U - band, 0, V - 1)
    hi = np.clip((np.arange(U) * V) // U + band, 1, V)
    return y1, y2, np.stack([lo, hi], axis=1).astype(np.int64)


def test_small_batch_picks_fast_config():
    pairs = [mk_pair() for _ in range(4)]
    prep = prepare_pairs(pairs, beam_width=5, device_put=False)
    assert prep["evict_step"] is True          # B <= 8
    assert prep["K"] == 1                      # coupled to per-step mode
    assert prep["use_rings"] is False          # planes fit VMEM
    assert prep["has_cont"] is False           # no splitting needed
    assert _vmem_est(4, prep["Wst0"], prep["Wst1"], prep["RING0"],
                     prep["RING1"], prep["L1"], prep["L2"],
                     prep["use_rings"]) <= _VMEM_BUDGET


def test_large_batch_switches_modes():
    pairs = [mk_pair() for _ in range(16)]
    prep = prepare_pairs(pairs, beam_width=5, device_put=False)
    assert prep["evict_step"] is False
    assert prep["K"] == 4


def test_padded_plan_divisible_by_K():
    pairs = [mk_pair(500, 520)] * 3
    prep = prepare_pairs(pairs, beam_width=5, device_put=False)
    assert prep["dev"][2].shape[1] % prep["K"] == 0


def test_split_wide_spans_shrink():
    """Splitting bounds the live span; per-step anchors are at least as
    tight as block-scheduled ones."""
    y1, y2, env = mk_pair(900, 940, band=30)
    # degenerate stretch: many rows over the same narrow column range
    env[200:700, 0] = 100
    env[200:700, 1] = 130
    from poreover_tpu.ops.beam2d_planned import build_plan

    p = build_plan(env, len(y1), len(y2))
    sm0, sm1 = _plan_anchors(p)
    s_step = _plan_spans(p, sm0, sm1, evict_step=True)
    s_block = _plan_spans(p, sm0, sm1, evict_step=False)
    assert s_step[0] <= s_block[0] and s_step[1] <= s_block[1]
    ps = _split_wide(p, cap=256)
    sm0s, sm1s = _plan_anchors(ps)
    s_split = _plan_spans(ps, sm0s, sm1s, evict_step=True)
    assert s_split[0] <= max(s_step[0], 256 + 128)
