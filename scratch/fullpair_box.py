"""Validate + time pair_beam_box_batch (full pairs through the segmented
kernel) against the general kernel. argv: [B] [cap|none]"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"])
             for i in range(int(d["n"]))]

from poreover_tpu.ops.pallas_box_beam import (  # noqa: E402
    pair_beam_box_batch, prepare_box,
)

B = int(sys.argv[1]) if len(sys.argv) > 1 else 5
cap = None
if len(sys.argv) > 2:
    cap = None if sys.argv[2] == "none" else int(sys.argv[2])
else:
    cap = 256
wl = (workloads * ((B + 4) // 5))[:B]
preps = [prepare_box(y1, y2, env, cap=cap, smax=1 << 30)
         for y1, y2, env in wl]
print("spans:", [pb["span"] for pb in preps[:5]],
      "N:", max(pb["n"] for pb in preps), flush=True)

t0 = time.perf_counter()
out = pair_beam_box_batch(wl, beam_width=5, prepared=preps, cap=cap)
print(f"warm: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = pair_beam_box_batch(wl, beam_width=5, prepared=preps, cap=cap)
    best = min(best, time.perf_counter() - t0)
N_pad = ((max(pb["n"] for pb in preps) + 511) // 512) * 512
print(f"B={B} cap={cap} box-batch best={best:.3f}s "
      f"({2*B/best:.2f} reads/s, {best/N_pad*1e6:.1f} us/step)", flush=True)

if os.environ.get("FP_CHECK", "1") == "1":
    from poreover_tpu.ops.pallas_pair_beam_batch import (  # noqa: E402
        pair_beam_pallas_batch,
    )
    want = pair_beam_pallas_batch(workloads, beam_width=5)
    match = sum(a == w for a, w in zip(out, (want * ((B + 4) // 5))[:B]))
    print(f"match vs general kernel: {match}/{B}", flush=True)
