"""Differential: Pallas beam1d vs XLA engine for all 3 model kinds."""
import os, sys, time
sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np

rng = np.random.default_rng(3)

def softmax_log(T, S):
    x = rng.normal(size=(T, S)) * 2
    return (x - np.log(np.exp(x).sum(1, keepdims=True))).astype(np.float32)

from poreover_tpu.ops.beam import beam_search_batch
from poreover_tpu.ops.pallas_beam1d import beam1d_pallas_batch

for model, S in (("ctc", 5), ("ctc_merge_repeats", 5), ("ctc_flipflop", 8)):
    ys = [softmax_log(T, S) for T in (300, 257, 512, 100, 401, 385, 256, 77)]
    t0 = time.perf_counter()
    got = beam1d_pallas_batch(ys, beam_width=25, model=model)
    dt = time.perf_counter() - t0
    want = beam_search_batch(ys, beam_width=25, model=model)
    ok = sum(a == b for a, b in zip(got, want))
    print(f"{model}: {ok}/{len(ys)} match (pallas {dt:.1f}s)", flush=True)
    if ok != len(ys):
        for i, (a, b) in enumerate(zip(got, want)):
            if a != b:
                print(f"  read {i}: len got={len(a)} want={len(b)}")
                print("  got ", a[:80]); print("  want", b[:80])
        sys.exit(1)
print("ALL OK")
