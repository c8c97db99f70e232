"""Time the batch kernel per grid step under PPB_SKIP toggles.

Usage: PPB_SKIP=permute,prov python scratch/probe_run.py [B] [NSTEPS]
"""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

import importlib.util
spec = importlib.util.spec_from_file_location("ppb_probe", "/root/repo/scratch/ppb_probe.py")
probe = importlib.util.module_from_spec(spec)
spec.loader.exec_module(probe)

from poreover_tpu.ops.beam2d_planned import plan_walk, transpose_envelope

B = int(sys.argv[1]) if len(sys.argv) > 1 else 8
NSTEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 2048

d = np.load("/root/repo/scratch/workload.npz")
y1, y2, env = d["y1"], d["y2"], d["env"]
U, V = len(y1), len(y2)
env = np.asarray(env, dtype=np.int64)[:U]
env_t = transpose_envelope(env, U, V)
plan = plan_walk(env, env_t, U, V)

C1RUN = probe.C1RUN
C0RUN = probe.C0RUN
w0g = int(np.where(plan["type"] != C1RUN, plan["a_hi"] - plan["a_lo"], 0).max())
w1g = int(np.where(plan["type"] != C0RUN, plan["b_hi"] - plan["b_lo"], 0).max())

def bucket(x, buckets=(384, 768, 1536, 3072)):
    for bk in buckets:
        if x <= bk:
            return bk
    return ((x + 1023) // 1024) * 1024

Wst0 = bucket(max(w0g, 1) + 2)
Wst1 = bucket(max(w1g, 1) + 2)
CH = 128
N_pad = ((NSTEPS + 511) // 512) * 512
T1, T2 = len(y1), len(y2)
L1 = ((T1 + CH + 8 + 127) // 128) * 128
L2 = ((T2 + CH + 8 + 127) // 128) * 128
Lp = ((N_pad + 127) // 128) * 128

y1p = np.concatenate([probe._pack_plane(y1, L1) for _ in range(B)])
y2p = np.concatenate([probe._pack_plane(y2, L2) for _ in range(B)])

plan_mat = np.zeros((8 * B, Lp), np.int32)
n = min(len(plan["type"]), NSTEPS)
for b in range(B):
    plan_mat[8 * b + 0, :n] = plan["type"][:n]
    plan_mat[8 * b + 0, n:N_pad] = C0RUN
    plan_mat[8 * b + 1, :n] = plan["a_lo"][:n]
    plan_mat[8 * b + 2, :n] = plan["a_hi"][:n]
    plan_mat[8 * b + 3, :n] = plan["b_lo"][:n]
    plan_mat[8 * b + 4, :n] = plan["b_hi"][:n]
plan_mat = plan_mat[:, :N_pad]

args = (jnp.asarray(y1p), jnp.asarray(y2p), jnp.asarray(plan_mat))
kw = dict(B=B, W=5, A=4, Wst0=Wst0, Wst1=Wst1, CH=CH, L1=L1, L2=L2, K=int(os.environ.get("PPB_K", "1")))

t0 = time.time()
out = probe._run_kernel(*args, **kw)
[np.asarray(o) for o in out]
print(f"# warm (incl compile): {time.time()-t0:.2f}s", file=sys.stderr)
best = float("inf")
for _ in range(3):
    t0 = time.time()
    out = probe._run_kernel(*args, **kw)
    [np.asarray(o) for o in out]
    best = min(best, time.time() - t0)
us = best / N_pad * 1e6
print(f"SKIP={os.environ.get('PPB_SKIP','')} LAYERS={os.environ.get('PPB_LAYERS','')} "
      f"B={B} N={N_pad} total={best:.3f}s per_step={us:.1f}us per_pair_step={us/B:.2f}us")
