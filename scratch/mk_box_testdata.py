"""Curate a small set of real anchored boxes into tests/data/boxes.npz.

Selection from the 644 real boxes of data/pairs.txt at threshold 10:
a spread of sizes (tiny / median / large / near-cap) so the committed
fixture stays small but covers multi-box lanes, reset boundaries and the
FIN traceback. (VERDICT r3 item 6: promote box validation out of
scratch/ without committing a 29 MB pickle.)"""
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ["JAX_PLATFORMS"] = "cpu"

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])

from poreover_tpu.decoding.pair import anchored_box_workloads  # noqa: E402

flat = []
for i in range(n):
    y1, y2, env = d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]
    bw, _ = anchored_box_workloads(
        y1, y2, env, d[f"aln_{i}"], d[f"s2s1_{i}"], d[f"s2s2_{i}"],
        matches=10)
    for (k, y1s, y2s, envs) in bw:
        flat.append((y1s, y2s, envs))
print("total boxes:", len(flat))

sizes = np.array([len(y1) + len(y2) for y1, y2, _ in flat])
order = np.argsort(sizes)
# spread: smallest 4, quartile picks, biggest 4
picks = list(order[:4])
for q in (0.25, 0.4, 0.5, 0.6, 0.75, 0.85, 0.92):
    picks.append(order[int(q * (len(order) - 1))])
picks += list(order[-4:])
# a few mid randoms for variety (deterministic)
rng = np.random.default_rng(0)
picks += list(rng.choice(order[4:-4], size=9, replace=False))
picks = list(dict.fromkeys(int(p) for p in picks))
print("picked:", len(picks), "sizes:", sorted(int(sizes[p]) for p in picks))

blobs = {}
for j, p in enumerate(picks):
    y1, y2, env = flat[p]
    blobs[f"y1_{j}"] = np.asarray(y1, np.float32)
    blobs[f"y2_{j}"] = np.asarray(y2, np.float32)
    blobs[f"env_{j}"] = np.asarray(env, np.int64)
blobs["n"] = np.array(len(picks))
os.makedirs("/root/repo/tests/data", exist_ok=True)
np.savez_compressed("/root/repo/tests/data/boxes.npz", **blobs)
print("saved tests/data/boxes.npz",
      os.path.getsize("/root/repo/tests/data/boxes.npz"), "bytes")
