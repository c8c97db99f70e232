"""Bisect the first plan step where the f64 planned engine's beam diverges
from the f64 windowed-memo oracle on pair 1 (the 1/5 oracle_exact miss).

Prereq: scratch/tie_stats.py (builds five_pairs.npz) and the emul trace:
  native.pair_beam_row_col_cpu_emul_trace -> /tmp/emul_trace_scores.npy
Run:   python scratch/bisect_f64.py            (takes ~1h: ~170 s/probe)
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

d = np.load("/root/repo/scratch/five_pairs.npz")
y1, y2, env = d["y1_1"], d["y2_1"], d["env_1"]
tr = np.load("/tmp/emul_trace_scores.npy")
uv = np.load("/tmp/emul_trace_uv.npy")

from poreover_tpu.ops.beam2d_planned import (  # noqa: E402
    MAIN, build_plan, debug_state_after,
)

plan = build_plan(np.asarray(env, np.int64)[: len(y1)], len(y1), len(y2))
is_main = np.asarray(plan["type"]) == MAIN
n_total = len(is_main)
cum_main = np.cumsum(is_main)
print(f"plan steps {n_total}, main steps {int(cum_main[-1])}, "
      f"emul prunes {len(tr)}", flush=True)


def top5(state):
    k1, k2 = state["k1"].astype(np.int64), state["k2"].astype(np.int64)
    sc, vd = state["score"].astype(np.float64), state["valid"]
    order = np.argsort(-sc, kind="stable")
    seen, out = set(), []
    for i in order:
        if not vd[i]:
            continue
        key = (int(k1[i]), int(k2[i]))
        if key in seen:
            continue
        seen.add(key)
        out.append(float(sc[i]))
        if len(out) == 5:
            break
    return np.array(out)


def agree(n):
    """Semantic agreement: same beam membership up to cross-implementation
    ulp noise (the two engines sum in different orders, so scores are
    never bit-equal — measured: they differ in the last bits from the
    very first prune). A structural divergence (different candidates
    kept) moves at least one score by far more than ulp."""
    j = int(cum_main[n - 1]) if n > 0 else 0
    if j == 0:
        return True
    t0 = time.perf_counter()
    st = debug_state_after(y1, y2, env, n_steps=n, beam_width=5)
    got = np.sort(top5(st))[::-1]
    want = np.sort(tr[j - 1])[::-1]
    if len(got) == len(want):
        err = np.max(np.abs(got - want) / np.maximum(np.abs(want), 1.0))
        ok = bool(err < 1e-9)
    else:
        err, ok = np.inf, False
    print(f"n={n} (prune {j}, uv={tuple(uv[j-1])}): "
          f"{'MATCH' if ok else 'DIFF'} relerr={err:.3e} "
          f"[{time.perf_counter()-t0:.0f}s]", flush=True)
    if not ok:
        print("  got :", got, flush=True)
        print("  want:", want, flush=True)
    return ok


# quick sanity probe early + the known-divergent end
lo, hi = 0, n_total
if not agree(min(200, n_total)):
    hi = min(200, n_total)
else:
    lo = min(200, n_total)
while hi - lo > 1:
    mid = (lo + hi) // 2
    if agree(mid):
        lo = mid
    else:
        hi = mid
j = int(cum_main[hi - 1])
print(f"FIRST DIVERGENT plan step: {hi} (type {plan['type'][hi-1]}), "
      f"prune {j}, uv={tuple(uv[j-1])}", flush=True)
print("emul scores at prune-1:", tr[j - 2] if j >= 2 else None, flush=True)
print("emul scores at prune  :", tr[j - 1], flush=True)
