"""Differential timing: r02 kernel vs current adaptive-cap kernel."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(n)]

which = sys.argv[1] if len(sys.argv) > 1 else "all"


def timeit(tag, fn, reps=3):
    t0 = time.perf_counter()
    out = fn()
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: warm={warm:.1f}s best={best:.3f}s", flush=True)
    return out


outs = {}
if which in ("all", "r02"):
    import poreover_tpu.ops._ppb_r02 as r02
    outs["r02"] = timeit(
        "r02 kernel", lambda: r02.pair_beam_pallas_batch(workloads,
                                                         beam_width=5))
if which in ("all", "new"):
    import poreover_tpu.ops.pallas_pair_beam_batch as ppb
    outs["new"] = timeit(
        "adaptive kernel",
        lambda: ppb.pair_beam_pallas_batch(workloads, beam_width=5))
if len(outs) == 2:
    print("outputs identical:", outs["r02"] == outs["new"])
