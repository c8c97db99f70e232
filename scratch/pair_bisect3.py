"""Commit-level bisect of the pair-kernel per-step regression."""
import importlib
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(n)]

for tag in sys.argv[1:]:
    mod = importlib.import_module(f"poreover_tpu.ops.{tag}")
    fn = mod.pair_beam_pallas_batch
    t0 = time.perf_counter()
    out = fn(workloads, beam_width=5)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(workloads, beam_width=5)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: warm={warm:.1f}s best={best:.3f}s", flush=True)
