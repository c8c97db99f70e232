"""Probe the r02->r03 pair regression: adaptive split cap vs forced 256."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(n)]

import poreover_tpu.ops.pallas_pair_beam_batch as ppb  # noqa: E402


def timeit(tag):
    t0 = time.perf_counter()
    out = ppb.pair_beam_pallas_batch(workloads, beam_width=5)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = ppb.pair_beam_pallas_batch(workloads, beam_width=5)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: warm={warm:.1f}s best={best:.3f}s", flush=True)
    return out


new = timeit("adaptive cap (B=5)")
budget = ppb._VMEM_BUDGET
ppb._VMEM_BUDGET = 30 * 1024 * 1024  # force the old cap=256 path
old = timeit("forced small budget")
ppb._VMEM_BUDGET = budget
print("outputs identical:", new == old)
