"""Build the bench's 5-pair workloads (basecall + stages 1-3) and save them.

Reproduces bench.py:bench_pair's workload construction so the f64/oracle
discrepancy (bench_results.json pair_f64.oracle_exact == "0/1") can be
analyzed without re-running the whole bench.
"""
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402

DATA = bench.DATA
OUT = "/root/repo/scratch/pair_workloads"
os.makedirs(OUT, exist_ok=True)

with open(f"{DATA}/pairs.txt") as f:
    pair_names = [line.split() for line in f if line.split()]
fast5s = sorted({f"{DATA}/reads/{n}" for p in pair_names for n in p})

with tempfile.TemporaryDirectory() as td:
    npys = bench._call_fast5s_to_npy(td, fast5s)
    npys = {k: v for k, v in npys.items() if os.path.exists(v)}
    for i, (n1, n2) in enumerate(pair_names):
        s1 = os.path.splitext(n1)[0]
        s2 = os.path.splitext(n2)[0]
        y1, y2, env = bench.build_pair_workload(npys[s1], npys[s2])
        np.savez(f"{OUT}/pair{i}.npz", y1=y1, y2=y2, env=env)
        print(f"pair{i}: {n1} {n2} U={len(y1)} V={len(y2)} "
              f"cells={int(np.sum(env[:,1]-env[:,0]))}")
print("saved to", OUT)
