"""All 628 in-cap boxes: segmented kernel vs XLA planned engine (exact)."""
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
from poreover_tpu.ops.pallas_box_beam import box_beam_pallas, prepare_box
from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned_batch

flat = []
for (y1, y2, env), ex in zip(workloads, extras):
    bw, anc = anchored_box_workloads(
        y1, y2, env, ex["alignment"], ex["s2s1"], ex["s2s2"], matches=10)
    for (k, y1s, y2s, envs) in bw:
        flat.append((y1s, y2s, envs))
preps = [prepare_box(*b) for b in flat]
seqs, overflow = box_beam_pallas(flat, beam_width=5, B=64, prepared=preps)
idx = [i for i in range(len(flat)) if preps[i] is not None]
t0 = time.perf_counter()
want = []
for c0 in range(0, len(idx), 32):
    want += beam_search_2d_planned_batch(
        [flat[i] for i in idx[c0:c0 + 32]], beam_width=5)
    print(f"  planned {c0 + 32}/{len(idx)}", flush=True)
print(f"planned batch {time.perf_counter()-t0:.1f}s", flush=True)
bad = [i for i, w in zip(idx, want) if seqs[i] != w]
print(f"exact vs planned: {len(idx) - len(bad)}/{len(idx)}; bad={bad[:10]}")
with open("/tmp/box_seqs_cur.pkl", "wb") as f:
    pickle.dump(seqs, f)
