"""Box kernel B / steps_per_grid sweep on the real 644-box workload."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])

from poreover_tpu.decoding.pair import anchored_box_workloads  # noqa: E402
from poreover_tpu.ops.pallas_box_beam import box_beam_pallas, prepare_box

flat = []
for i in range(n):
    y1, y2, env = d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]
    bw, _ = anchored_box_workloads(
        y1, y2, env, d[f"aln_{i}"], d[f"s2s1_{i}"], d[f"s2s2_{i}"],
        matches=10)
    flat.extend((y1s, y2s, envs) for _, y1s, y2s, envs in bw)
print(f"{len(flat)} boxes", flush=True)
preps = [prepare_box(*b) for b in flat]
print(f"overflow: {sum(p is None for p in preps)}", flush=True)

ref = None
for B, K in [(64, 4), (96, 2), (128, 2), (64, 8)]:
    try:
        t0 = time.perf_counter()
        seqs, ov = box_beam_pallas(flat, beam_width=5, B=B,
                                   steps_per_grid=K, prepared=preps)
        warm = time.perf_counter() - t0
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            seqs, ov = box_beam_pallas(flat, beam_width=5, B=B,
                                       steps_per_grid=K, prepared=preps)
            best = min(best, time.perf_counter() - t0)
        same = "ref" if ref is None else ("==" if seqs == ref else "DIFF!")
        if ref is None:
            ref = seqs
        print(f"B={B} K={K}: warm={warm:.1f}s best={best:.3f}s "
              f"ov={len(ov)} {same}", flush=True)
    except Exception as e:
        print(f"B={B} K={K}: FAILED {type(e).__name__}: {e}", flush=True)
