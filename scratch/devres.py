import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(int(d["n"]))]
from poreover_tpu.ops.pallas_pair_beam_batch import fetch_prepared, launch_prepared, prepare_pairs
prep = prepare_pairs(workloads, beam_width=5)
print("cfg: rings=%s cont=%s evict_step=%s Wst0=%d Wst1=%d K=%d" % (
    prep["use_rings"], prep["has_cont"], prep["evict_step"],
    prep["Wst0"], prep["Wst1"], prep["K"]), flush=True)
t0 = time.perf_counter()
out = fetch_prepared(prep, launch_prepared(prep))
print(f"warm: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    out = fetch_prepared(prep, launch_prepared(prep))
    best = min(best, time.perf_counter() - t0)
print(f"device-resident best: {best:.3f}s", flush=True)
