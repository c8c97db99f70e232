"""Does length-bucketing the 1D beam sat beat one max-padded launch?"""
import os, sys, time
sys.path.insert(0, "/root/repo"); os.chdir("/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")
import numpy as np
import bench
from poreover_tpu.ops.pallas_beam1d import (
    fetch_beam1d, launch_beam1d, prepare_beam1d)

ys = sorted(bench._sat_reads(), key=len)
short, longr = ys[:6], ys[6:]

def run(reads, B):
    reps = (B + len(reads) - 1) // len(reads)
    sel = (reads * reps)[:B]
    prep = prepare_beam1d(sel, beam_width=25)
    out = fetch_beam1d(prep, launch_beam1d(prep))  # warm
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = fetch_beam1d(prep, launch_beam1d(prep))
        best = min(best, time.perf_counter() - t0)
    return best

tA = run(short, 64)
print(f"short6 B=64 (L={((len(short[-1])+2047)//2048)*2048}): {tA:.2f}s", flush=True)
tB = run(longr, 64)
print(f"long6 B=64: {tB:.2f}s", flush=True)
print(f"bucketed total: {tA+tB:.2f}s = {128/(tA+tB):.1f} reads/s "
      f"(single-launch B=128 baseline ~4.8s = 26.5 reads/s)", flush=True)
