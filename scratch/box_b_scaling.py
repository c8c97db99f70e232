"""Per-step cost of the batch kernel vs B on narrow anchored boxes."""
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

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

# sort by size, take a band of mid-length boxes and replicate
order = sorted(range(len(flat)), key=lambda i: len(flat[i][0]) + len(flat[i][1]))
mid = [flat[j] for j in order[len(order) // 2: len(order) // 2 + 16]]

for B in [int(x) for x in sys.argv[1:]] or [16, 64]:
    wl = (mid * ((B + 15) // 16))[:B]
    t0 = time.perf_counter()
    out = pair_beam_pallas_batch(wl, beam_width=5, steps_per_grid=2)
    warm = time.perf_counter() - t0
    t0 = time.perf_counter()
    out2 = pair_beam_pallas_batch(wl, beam_width=5, steps_per_grid=2)
    dt = time.perf_counter() - t0
    assert out == out2
    from poreover_tpu.ops.beam2d_planned import build_plan
    from poreover_tpu.ops.pallas_pair_beam_batch import _split_wide
    N = max(len(_split_wide(build_plan(
        np.asarray(e, dtype=np.int64)[:len(y1)], len(y1), len(y2)))["type"])
        for y1, y2, e in wl)
    N_pad = ((N + 511) // 512) * 512
    print(f"B={B}: warm={warm:.1f}s hot={dt*1000:.1f}ms N_pad={N_pad} "
          f"per_plan_step={dt / N_pad * 1e6:.1f}us boxes_per_s={B/dt:.1f}",
          flush=True)
