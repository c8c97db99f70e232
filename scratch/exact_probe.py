import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(int(d["n"]))]
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned
# smallest pair first
order = sorted(range(5), key=lambda i: len(workloads[i][0]))
for i in order[:2]:
    y1, y2, env = workloads[i]
    t0 = time.perf_counter()
    s = beam_search_2d_planned(y1, y2, env, beam_width=5, exact=True)
    print(f"pair{i}: U={len(y1)} V={len(y2)} {time.perf_counter()-t0:.1f}s len={len(s)}", flush=True)
