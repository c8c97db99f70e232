"""Which bundled pair misses the f64 windowed-memo oracle under f32, and
by how much (docs/EXACTNESS.md f32 section, VERDICT r4 item 4b)."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
wls = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]) for i in range(int(d["n"]))]

from poreover_tpu import native
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned

for i, (y1, y2, env) in enumerate(wls):
    oracle = native.pair_beam_row_col_cpu_emul(y1, y2, env, beam_width=5)
    f32 = beam_search_2d_planned(y1, y2, env, beam_width=5)
    m = "MATCH" if f32 == oracle else "DIFF"
    print(f"pair{i}: cpu-f32 vs f64 oracle: {m} (lens {len(f32)}/{len(oracle)})",
          flush=True)
