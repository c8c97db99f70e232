"""Does the segmented exact batch survive the axon worker (VERDICT r4
item 5)? B=5 bundled pairs, exact mode, segment lengths from argv."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
wls = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(int(d["n"]))]

from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned_batch_seg
from poreover_tpu import native

seg = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
t0 = time.perf_counter()
out = beam_search_2d_planned_batch_seg(wls, beam_width=5, exact=True, seg=seg)
print(f"seg={seg}: warm {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(2):
    t0 = time.perf_counter()
    out = beam_search_2d_planned_batch_seg(wls, beam_width=5, exact=True,
                                           seg=seg)
    best = min(best, time.perf_counter() - t0)
print(f"seg={seg}: batched exact B=5 best={best:.1f}s", flush=True)
trie = [native.pair_beam_row_col_cpu(y1, y2, env, beam_width=5)
        for y1, y2, env in wls]
print(f"trie_match: {sum(a == b for a, b in zip(out, trie))}/5", flush=True)
