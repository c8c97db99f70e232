"""Does width-partitioning box launches pay? Narrow-only vs mixed rate."""
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_comp_cache")

d = np.load("/root/repo/scratch/five_pairs.npz", allow_pickle=True)
n = int(d["n"])

from poreover_tpu.decoding.pair import anchored_box_workloads  # noqa: E402
from poreover_tpu.ops.pallas_box_beam import box_beam_pallas, prepare_box

flat = []
for i in range(n):
    y1, y2, env = d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"]
    bw, _ = anchored_box_workloads(
        y1, y2, env, d[f"aln_{i}"], d[f"s2s1_{i}"], d[f"s2s2_{i}"],
        matches=10)
    flat.extend((y1s, y2s, envs) for _, y1s, y2s, envs in bw)
preps = [prepare_box(*b) for b in flat]


def width(pb):
    if pb is None:
        return 1 << 30
    w0 = int((pb["plan"][2] - pb["plan"][1]).max())
    w1 = int((pb["plan"][4] - pb["plan"][3]).max())
    return max(w0, w1)


ws = [width(pb) for pb in preps]
ok = [i for i, pb in enumerate(preps) if pb is not None]
print("widths percentiles:",
      np.percentile([ws[i] for i in ok], [50, 75, 90, 95, 99]).astype(int),
      flush=True)

for thr in (128, 192):
    narrow = [i for i in ok if ws[i] <= thr]
    wide = [i for i in ok if ws[i] > thr]
    print(f"thr={thr}: narrow={len(narrow)} wide={len(wide)}", flush=True)

thr = 128
narrow = [i for i in ok if ws[i] <= thr]
wide = [i for i in ok if ws[i] > thr]


def run(idxs, tag):
    bxs = [flat[i] for i in idxs]
    pps = [preps[i] for i in idxs]
    t0 = time.perf_counter()
    seqs, ov = box_beam_pallas(bxs, beam_width=5, B=64, prepared=pps)
    warm = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        seqs, ov = box_beam_pallas(bxs, beam_width=5, B=64, prepared=pps)
        best = min(best, time.perf_counter() - t0)
    print(f"{tag}: {len(bxs)} boxes warm={warm:.1f}s best={best:.3f}s "
          f"({len(bxs)/best:.0f} boxes/s)", flush=True)
    return seqs


sn = run(narrow, "narrow<=128")
sw = run(wide, "wide>128")
sa = run(ok, "mixed(all)")
merged = {}
for j, i in enumerate(narrow):
    merged[i] = sn[j]
for j, i in enumerate(wide):
    merged[i] = sw[j]
same = all(merged[i] == s for i, s in zip(ok, sa))
print("partitioned == mixed outputs:", same, flush=True)
