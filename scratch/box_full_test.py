"""Full anchored workload through the segmented kernel: correctness vs
CPU oracle + timing."""
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

with open("scratch/workloads.pkl", "rb") as f:
    workloads, extras = pickle.load(f)

from poreover_tpu import native
from poreover_tpu.decoding.pair import anchored_box_workloads
from poreover_tpu.ops.pallas_box_beam import box_beam_pallas, prepare_box

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
K = int(sys.argv[2]) if len(sys.argv) > 2 else 2

flat = []
for (y1, y2, env), ex in zip(workloads, extras):
    bw, anc = anchored_box_workloads(
        y1, y2, env, ex["alignment"], ex["s2s1"], ex["s2s2"], matches=10)
    for (k, y1s, y2s, envs) in bw:
        flat.append((y1s, y2s, envs))
print(f"{len(flat)} boxes")

t0 = time.perf_counter()
preps = [prepare_box(y1, y2, env) for y1, y2, env in flat]
prep_s = time.perf_counter() - t0
n_over = sum(p is None for p in preps)
print(f"prep {prep_s:.2f}s  overflow {n_over}/{len(flat)}")

t0 = time.perf_counter()
seqs, overflow = box_beam_pallas(flat, beam_width=5, B=B,
                                 steps_per_grid=K, prepared=preps)
warm = time.perf_counter() - t0
print(f"warm (incl compile) {warm:.1f}s")
ts = []
for _ in range(3):
    t0 = time.perf_counter()
    seqs2, _ = box_beam_pallas(flat, beam_width=5, B=B,
                               steps_per_grid=K, prepared=preps)
    ts.append(time.perf_counter() - t0)
assert seqs == seqs2
print(f"hot: {['%.0fms' % (t*1000) for t in ts]} B={B} K={K}")

# correctness vs CPU unbounded trie per box
t0 = time.perf_counter()
cpu = [native.pair_beam_row_col_cpu(y1, y2, env, beam_width=5)
       for y1, y2, env in flat]
cpu_s = time.perf_counter() - t0
n_match = sum(a == b for a, b in zip(seqs, cpu) if a is not None)
n_skip = sum(a is None for a in seqs)
print(f"cpu {cpu_s:.2f}s  box match {n_match}/{len(flat) - n_skip} "
      f"(skipped {n_skip})")
mism = [i for i, (a, b) in enumerate(zip(seqs, cpu))
        if a is not None and a != b][:5]
for i in mism:
    print(f"  box {i}: got {seqs[i][:50]} want {cpu[i][:50]}")
