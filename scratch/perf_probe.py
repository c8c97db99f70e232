"""Measure pair-kernel timing: B scaling, steps_per_grid, box stats."""
import os
import pickle
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

with open("scratch/workloads.pkl", "rb") as f:
    workloads, extras = pickle.load(f)

mode = sys.argv[1] if len(sys.argv) > 1 else "full"

if mode == "boxes":
    from poreover_tpu.decoding.pair import anchored_box_workloads
    from poreover_tpu.ops.beam2d_planned import build_plan
    flat = []
    for (y1, y2, env), ex in zip(workloads, extras):
        bw, anc = anchored_box_workloads(
            y1, y2, env, ex["alignment"], ex["s2s1"], ex["s2s2"], matches=10)
        for (k, y1s, y2s, envs) in bw:
            flat.append((y1s, y2s, envs))
    lens, widths, cellsv = [], [], []
    for y1s, y2s, envs in flat:
        U, V = len(y1s), len(y2s)
        env = np.asarray(envs, dtype=np.int64)[:U]
        p = build_plan(env, U, V)
        lens.append(len(p["type"]))
        w0 = int(np.where(p["type"] != 2, p["a_hi"] - p["a_lo"], 0).max())
        w1 = int(np.where(p["type"] != 1, p["b_hi"] - p["b_lo"], 0).max())
        widths.append(max(w0, w1))
        cellsv.append(int(np.sum(env[:, 1] - env[:, 0])))
    lens = np.array(lens); widths = np.array(widths)
    print(f"n_boxes={len(flat)} plan_len: min={lens.min()} "
          f"p50={np.percentile(lens,50):.0f} p90={np.percentile(lens,90):.0f} "
          f"max={lens.max()} sum={lens.sum()}")
    print(f"widths: p50={np.percentile(widths,50):.0f} "
          f"p90={np.percentile(widths,90):.0f} max={widths.max()}")
    print(f"cells: total={sum(cellsv)/1e6:.2f}M")
    # histogram of plan lens
    for b in (256, 512, 1024, 2048, 4096, 8192, 100000):
        print(f"  len<= {b}: {(lens <= b).sum()}")
    sys.exit(0)

from poreover_tpu.ops.pallas_pair_beam_batch import pair_beam_pallas_batch

if mode == "full":
    B = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    K = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    reps = (B + len(workloads) - 1) // len(workloads)
    wl = (workloads * reps)[:B]
    t0 = time.perf_counter()
    out = pair_beam_pallas_batch(wl, beam_width=5, steps_per_grid=K)
    print(f"warm B={B} K={K}: {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    out2 = pair_beam_pallas_batch(wl, beam_width=5, steps_per_grid=K)
    dt = time.perf_counter() - t0
    # plan length for per-step cost
    from poreover_tpu.ops.beam2d_planned import build_plan
    from poreover_tpu.ops.pallas_pair_beam_batch import _split_wide
    N = max(len(_split_wide(build_plan(
        np.asarray(e, dtype=np.int64)[:len(y1)], len(y1), len(y2)))["type"])
        for y1, y2, e in wl)
    N_pad = ((N + 511) // 512) * 512
    print(f"hot B={B} K={K}: {dt:.2f}s N_pad={N_pad} "
          f"per_grid_step={dt/(N_pad//K)*1e6:.1f}us "
          f"per_plan_step={dt/N_pad*1e6:.1f}us "
          f"pairs_per_s={B/dt:.2f}")
    assert out == out2
