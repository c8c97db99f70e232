"""Build the real 5-pair workload once and cache to scratch/five_pairs.npz."""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

from bench import build_pair_workload, _call_fast5s_to_npy, DATA  # noqa: E402

out = "/root/repo/scratch/five_pairs.npz"
with open(f"{DATA}/pairs.txt") as f:
    pair_names = [line.split() for line in f if line.split()]
fast5s = sorted({f"{DATA}/reads/{n}" for p in pair_names for n in p})
blobs = {}
with tempfile.TemporaryDirectory() as td:
    npys = _call_fast5s_to_npy(td, fast5s)
    npys = {k: v for k, v in npys.items() if os.path.exists(v)}
    for i, (n1, n2) in enumerate(pair_names):
        s1 = os.path.splitext(n1)[0]
        s2 = os.path.splitext(n2)[0]
        y1, y2, env, ex = build_pair_workload(npys[s1], npys[s2],
                                              with_alignment=True)
        blobs[f"y1_{i}"] = y1
        blobs[f"y2_{i}"] = y2
        blobs[f"env_{i}"] = env
        blobs[f"aln_{i}"] = ex["alignment"]
        blobs[f"s2s1_{i}"] = ex["s2s1"]
        blobs[f"s2s2_{i}"] = ex["s2s2"]
blobs["n"] = np.array(len(pair_names))
np.savez_compressed(out, **blobs)
print("saved", out, "pairs:", len(pair_names))
