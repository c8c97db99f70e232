"""Launch intercept: same B, different N_pad, same storage shapes."""
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

from poreover_tpu.decoding.pair import anchored_box_workloads
from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

flat = []
for (y1, y2, env), ex in zip(workloads, extras):
    bw, anc = anchored_box_workloads(
        y1, y2, env, ex["alignment"], ex["s2s1"], ex["s2s2"], matches=10)
    for (k, y1s, y2s, envs) in bw:
        flat.append((y1s, y2s, envs))

order = sorted(range(len(flat)), key=lambda i: len(flat[i][0]) + len(flat[i][1]))
B = 8
# short wave (N_pad 512-ish) and long wave (N_pad 2048+) at same B
short = [flat[j] for j in order[len(order) // 2:len(order) // 2 + B]]
long_ = [flat[j] for j in order[-B:]]

for name, wl in (("short", short), ("long", long_)):
    t0 = time.perf_counter()
    out = pair_beam_pallas_batch(wl, beam_width=5, steps_per_grid=2)
    warm = time.perf_counter() - t0
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out2 = pair_beam_pallas_batch(wl, beam_width=5, steps_per_grid=2)
        ts.append(time.perf_counter() - t0)
    from poreover_tpu.ops.beam2d_planned import build_plan
    from poreover_tpu.ops.pallas_pair_beam_batch import _split_wide
    N = max(len(_split_wide(build_plan(
        np.asarray(e, dtype=np.int64)[:len(y1)], len(y1), len(y2)))["type"])
        for y1, y2, e in wl)
    N_pad = ((N + 511) // 512) * 512
    print(f"{name}: warm={warm:.1f}s hots={[f'{t*1000:.0f}' for t in ts]}ms "
          f"N_pad={N_pad}", flush=True)
