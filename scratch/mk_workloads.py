"""Build and cache the bench pair workloads (basecall + envelopes) once."""
import os
import pickle
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")
os.chdir("/root/repo")

DATA = "/root/reference/data"
OUT = "/root/repo/scratch/workloads.pkl"

from bench import _call_fast5s_to_npy, build_pair_workload  # noqa: E402

with open(f"{DATA}/pairs.txt") as f:
    pair_names = [line.split() for line in f if line.split()]
fast5s = sorted({f"{DATA}/reads/{n}" for p in pair_names for n in p})
workloads, extras = [], []
with tempfile.TemporaryDirectory() as td:
    t0 = time.perf_counter()
    npys = _call_fast5s_to_npy(td, fast5s)
    npys = {k: v for k, v in npys.items() if os.path.exists(v)}
    print(f"basecalled {len(npys)} in {time.perf_counter()-t0:.1f}s")
    for n1, n2 in pair_names:
        s1 = os.path.splitext(n1)[0]
        s2 = os.path.splitext(n2)[0]
        *wl, ex = build_pair_workload(npys[s1], npys[s2],
                                      with_alignment=True)
        workloads.append(tuple(wl))
        extras.append(ex)
with open(OUT, "wb") as f:
    pickle.dump((workloads, extras), f)
print(f"cached {len(workloads)} workloads -> {OUT}")
