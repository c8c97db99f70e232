"""Reproduce the pair_f64 bench row: does the f64 planned engine match
the f64 windowed-memo oracle on pair 1 (read_316/read_318)?"""
import json
import os
import subprocess
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench  # noqa: E402

DATA = bench.DATA

with open(f"{DATA}/pairs.txt") as f:
    pairs = [ln.split() for ln in f.read().splitlines() if ln.strip()]
print("pairs:", pairs)
i = 1
r1, r2 = pairs[i]
import tempfile

with tempfile.TemporaryDirectory() as td_bc:
    npys = bench._call_fast5s_to_npy(
        td_bc, [f"{DATA}/reads/{r1}", f"{DATA}/reads/{r2}"])
    s1 = os.path.splitext(r1)[0]
    s2 = os.path.splitext(r2)[0]
    wl = bench.build_pair_workload(npys[s1], npys[s2])
y1, y2, env = wl
print("shapes", y1.shape, y2.shape, env.shape)

from poreover_tpu import native  # noqa: E402

t0 = time.perf_counter()
oracle = native.pair_beam_row_col_cpu_emul(y1, y2, env, beam_width=5)
print(f"oracle len={len(oracle)} {time.perf_counter()-t0:.1f}s")

td = "/tmp/f64repro"
os.makedirs(td, exist_ok=True)
np.save(f"{td}/y1.npy", y1)
np.save(f"{td}/y2.npy", y2)
np.save(f"{td}/env.npy", env)
code = f"""
import time, numpy as np, sys, json
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned
y1 = np.load({td!r} + "/y1.npy"); y2 = np.load({td!r} + "/y2.npy")
env = np.load({td!r} + "/env.npy")
t0 = time.perf_counter()
s = beam_search_2d_planned(y1, y2, env, beam_width=5)
print(json.dumps(dict(seq=s, warm_s=round(time.perf_counter()-t0, 2),
                      backend=jax.default_backend(),
                      dtype_check=str(jax.numpy.zeros(1).dtype))))
"""
r = subprocess.run([sys.executable, "-c", code], timeout=3600,
                   capture_output=True, text=True)
print("STDERR tail:", r.stderr[-500:])
info = json.loads(r.stdout.strip().splitlines()[-1])
seq = info["seq"]
print(f"f64 len={len(seq)} warm={info['warm_s']}s backend={info['backend']} "
      f"dtype={info['dtype_check']}")
print("MATCH" if seq == oracle else "MISMATCH")
if seq != oracle:
    # locate first divergence
    n = min(len(seq), len(oracle))
    k = next((j for j in range(n) if seq[j] != oracle[j]), n)
    print(f"lens {len(seq)} vs {len(oracle)}; first diff at {k}")
    print("f64   :", seq[max(0, k - 20):k + 20])
    print("oracle:", oracle[max(0, k - 20):k + 20])
