import os, sys, time
import numpy as np
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
workloads = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(int(d["n"]))]
from poreover_tpu.ops.pallas_pair_beam_batch import fetch_prepared, launch_prepared, prepare_pairs
outs = {}
for k in [int(x) for x in sys.argv[1:]]:
    prep = prepare_pairs(workloads, beam_width=5, steps_per_grid=k)
    t0 = time.perf_counter()
    out = fetch_prepared(prep, launch_prepared(prep))
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fetch_prepared(prep, launch_prepared(prep))
        best = min(best, time.perf_counter() - t0)
    outs[k] = out
    print(f"K={k}: warm={warm:.1f}s best={best:.3f}s", flush=True)
vals = list(outs.values())
print("identical:", all(v == vals[0] for v in vals))
