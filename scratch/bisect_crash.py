"""Compile-only bisect of the XLA lowering CHECK:
  Check failed: limits[i] <= dim(i) (16 vs. 1)

Usage: python scratch/bisect_crash.py Wst0 Wst1 N_pad T1 T2
Exits 0 on successful compile, crashes (SIGABRT) on the bug.
"""
import sys, os
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp

Wst0, Wst1, N_pad, T1, T2 = map(int, sys.argv[1:6])

from poreover_tpu.ops.pallas_pair_beam import _run_kernel, _pack_plane

y1 = np.log(np.random.default_rng(0).dirichlet(np.ones(5), T1)).astype(np.float32)
y2 = np.log(np.random.default_rng(1).dirichlet(np.ones(5), T2)).astype(np.float32)
y1p = jnp.asarray(_pack_plane(y1))
y2p = jnp.asarray(_pack_plane(y2))

# all-no-op plan: C0RUN with zero width
ptype = jnp.full((N_pad,), 1, jnp.int32)   # C0RUN
zeros = jnp.zeros((N_pad,), jnp.int32)

lowered = _run_kernel.lower(
    y1p, y2p, ptype, zeros, zeros, zeros, zeros,
    5, 4, Wst0, Wst1, 128, False)
print("lowered ok", flush=True)
compiled = lowered.compile()
print("COMPILE OK", sys.argv[1:6], flush=True)
