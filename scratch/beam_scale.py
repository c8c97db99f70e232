"""1D beam XLA engine: does reads/s scale with B? Device-resident."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

import jax
import jax.numpy as jnp

from poreover_tpu.io.trace import model_from_trace
from poreover_tpu.ops.beam import _beam_search_scan_batch, _pad_bucket

DATA = "/root/reference/data"
ys = []
for name in ("read1.npy", "read2.npy"):
    m = model_from_trace(f"{DATA}/reads/{name}", "poreover")
    ys.append(m.log_prob.astype(np.float32))

Tpad = _pad_bucket(max(len(y) for y in ys))
S = ys[0].shape[1]

for B in [int(x) for x in sys.argv[1:]] or (128, 512):
    yb = np.zeros((B, Tpad, S), np.float32)
    tv = np.zeros((B, Tpad), bool)
    for i in range(B):
        y = ys[i % 2]
        yb[i, :len(y)] = y
        tv[i, :len(y)] = True
    yj = jax.device_put(yb)
    tvj = jax.device_put(tv)
    root = jnp.cumsum(jnp.where(tvj, yj[:, :, -1], 0.0), axis=1)
    jax.block_until_ready((yj, tvj, root))
    t0 = time.perf_counter()
    out = _beam_search_scan_batch(yj, tvj, root, 0, 25, 4)
    _ = (np.asarray(out[0]), np.asarray(out[1]))
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(2):
        t0 = time.perf_counter()
        out = _beam_search_scan_batch(yj, tvj, root, 0, 25, 4)
        _ = (np.asarray(out[0]), np.asarray(out[1]))
        best = min(best, time.perf_counter() - t0)
    print(f"B={B}: warm={warm:.1f}s best={best:.2f}s "
          f"({B/best:.1f} reads/s)", flush=True)
