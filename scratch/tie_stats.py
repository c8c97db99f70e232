"""Tie diagnostic (r5): for each bundled pair, run the f64 windowed-memo
oracle with stats and report how many prune cuts had bit-equal keep/drop
score ties. If pair 1 (the 1/5 oracle_exact miss) has ties and the
matching pairs have none, the miss is tie-break class, not rounding.

Caches the 5 workloads to scratch/five_pairs.npz (basecall runs on TPU
the first time).
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "five_pairs.npz")

if os.path.exists(CACHE):
    d = np.load(CACHE, allow_pickle=True)
    wls = [(d[f"y1_{i}"], d[f"y2_{i}"], d[f"env_{i}"])
           for i in range(int(d["n"]))]
else:
    import bench

    with open(f"{bench.DATA}/pairs.txt") as f:
        pairs = [ln.split() for ln in f.read().splitlines() if ln.strip()]
    names = sorted({n for p in pairs for n in p})
    with tempfile.TemporaryDirectory() as td:
        npys = bench._call_fast5s_to_npy(
            td, [f"{bench.DATA}/reads/{n}" for n in names])
        wls = []
        for r1, r2 in pairs:
            s1, s2 = os.path.splitext(r1)[0], os.path.splitext(r2)[0]
            wls.append(bench.build_pair_workload(npys[s1], npys[s2]))
    np.savez_compressed(
        CACHE, n=len(wls),
        **{f"{k}_{i}": v for i, (y1, y2, env) in enumerate(wls)
           for k, v in (("y1", y1), ("y2", y2), ("env", env))})

from poreover_tpu import native  # noqa: E402

for i, (y1, y2, env) in enumerate(wls):
    seq, stats = native.pair_beam_row_col_cpu_emul_grace(
        y1, y2, env, beam_width=5, grace=1, return_stats=True)
    print(f"pair{i}: len={len(seq)} cut_ties={stats[33]} "
          f"final_top_tie={stats[34]}")
