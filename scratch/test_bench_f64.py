"""Smoke-test the rewritten bench_pair_f64 against the saved workloads."""
import json
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from poreover_tpu import native  # noqa: E402

wl = []
for i in range(5):
    d = np.load(f"/root/repo/scratch/pair_workloads/pair{i}.npz")
    wl.append((d["y1"], d["y2"], d["env"]))

oracle = native.pair_beam_row_col_cpu_emul(*wl[1], beam_width=5)
eng = oracle[:3257] + oracle[3258:]  # the engines' 6499-base output
seqs_tpu = ["", eng, "", "", ""]

bench.bench_pair_f64(wl, seqs_tpu)
print(json.dumps(bench.RESULTS["pair_f64"], indent=1))
