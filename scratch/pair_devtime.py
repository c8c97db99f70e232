"""Split pair-kernel time into H2D transfer vs device compute."""
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
import jax.numpy as jnp
import poreover_tpu.ops.pallas_pair_beam_batch as ppb

# intercept _run_kernel args by replicating the host prep inline
orig_run = ppb._run_kernel
captured = {}


def capture_run(y1p, y2p, plan_mat, *a, **kw):
    captured["args"] = (y1p, y2p, plan_mat, a, kw)
    return orig_run(y1p, y2p, plan_mat, *a, **kw)


ppb._run_kernel = capture_run
t0 = time.perf_counter()
out = ppb.pair_beam_pallas_batch(workloads, beam_width=5)
print(f"full call (warm/compile): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
out = ppb.pair_beam_pallas_batch(workloads, beam_width=5)
full = time.perf_counter() - t0
print(f"full call: {full:.3f}s", flush=True)

y1p, y2p, plan_mat, a, kw = captured["args"]
y1d = jax.device_put(y1p)
y2d = jax.device_put(y2p)
pd = jax.device_put(plan_mat)
jax.block_until_ready((y1d, y2d, pd))
nbytes = (y1p.nbytes + y2p.nbytes + plan_mat.nbytes) / 1e6
t0 = time.perf_counter()
jax.block_until_ready(jax.device_put((np.asarray(y1p), np.asarray(y2p),
                                      np.asarray(plan_mat))))
h2d = time.perf_counter() - t0
print(f"H2D of {nbytes:.1f}MB: {h2d:.3f}s ({nbytes/h2d:.1f} MB/s)",
      flush=True)

best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    prov, sco, valid = orig_run(y1d, y2d, pd, *a, **kw)
    jax.block_until_ready(prov)
    best = min(best, time.perf_counter() - t0)
print(f"device-resident kernel: {best:.3f}s", flush=True)
t0 = time.perf_counter()
pn = np.asarray(prov)
print(f"prov D2H {pn.nbytes/1e6:.1f}MB: {time.perf_counter()-t0:.3f}s",
      flush=True)
