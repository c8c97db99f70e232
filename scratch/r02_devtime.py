"""Device-resident timing of the r02 kernel (per-step eviction)."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(n)]

import jax
import poreover_tpu.ops._ppb_r02 as r02

orig_run = r02._run_kernel
captured = {}


def capture_run(*a, **kw):
    captured["a"], captured["kw"] = a, kw
    return orig_run(*a, **kw)


r02._run_kernel = capture_run
t0 = time.perf_counter()
out = r02.pair_beam_pallas_batch(workloads, beam_width=5)
print(f"r02 full (warm): {time.perf_counter()-t0:.1f}s", flush=True)

a, kw = captured["a"], captured["kw"]
dev = [jax.device_put(np.asarray(x)) if hasattr(x, "shape") else x
       for x in a[:3]]
jax.block_until_ready(dev)
rest = a[3:]
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    outs = orig_run(*dev, *rest, **kw)
    jax.block_until_ready(outs[0])
    best = min(best, time.perf_counter() - t0)
print(f"r02 device-resident: {best:.3f}s", flush=True)
