"""Bring-up: segmented box kernel vs XLA planned engine on synthetic boxes."""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)

from poreover_tpu.ops.beam2d_planned import beam_search_2d_planned
from poreover_tpu.ops.pallas_box_beam import box_beam_pallas

rng = np.random.default_rng(0)


def mk_box(U, V, width):
    y1 = np.log(rng.dirichlet(np.ones(5), size=U)).astype(np.float32)
    y2 = np.log(rng.dirichlet(np.ones(5), size=V)).astype(np.float32)
    env = np.zeros((U, 2), np.int64)
    for u in range(U):
        c = int(u * V / U)
        env[u, 0] = max(0, c - width // 2)
        env[u, 1] = min(V, c + width // 2 + 1)
        if env[u, 1] <= env[u, 0]:
            env[u, 1] = env[u, 0] + 1
    # envelope rows must be monotone + overlapping (repair like the driver)
    for u in range(1, U):
        env[u, 0] = max(env[u, 0], env[u - 1, 0])
        env[u, 1] = max(env[u, 1], env[u, 0] + 1, env[u - 1, 1] - width)
        if env[u, 0] > env[u - 1, 1] - 1:
            env[u, 0] = env[u - 1, 1] - 1
    return y1, y2, env


sizes = [(40, 38, 11), (120, 130, 25), (300, 280, 40), (64, 64, 9),
         (200, 210, 31), (500, 480, 60), (30, 33, 7), (150, 140, 21),
         (90, 95, 15), (250, 240, 35), (400, 390, 50), (70, 75, 13)]
boxes = [mk_box(*s) for s in sizes]

print("running XLA planned engine per box...", flush=True)
want = [beam_search_2d_planned(y1, y2, env, beam_width=5)
        for y1, y2, env in boxes]
print("running segmented box kernel (B=8)...", flush=True)
got, overflow = box_beam_pallas(boxes, beam_width=5, B=8)
print("overflow:", overflow)
nok = 0
for i, (w, g) in enumerate(zip(want, got)):
    ok = (w == g)
    nok += ok
    if not ok:
        print(f"box {i} MISMATCH:\n  want({len(w)}): {w[:60]}...\n"
              f"  got({len(g) if g else -1}): {(g or '')[:60]}...")
print(f"match {nok}/{len(boxes)}")
