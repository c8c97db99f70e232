"""TPU validation of the pair-sat wave-size sweep (bench.py change):
run pipelined general-kernel waves of 5 and 8 over a 16-pair distinct
set (5 real + 11 synthetic) and compare rates + outputs."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402
from poreover_tpu.ops.pallas_pair_beam_batch import (  # noqa: E402
    fetch_prepared, launch_prepared, prepare_pairs,
)

wl = []
for i in range(5):
    d = np.load(f"/root/repo/scratch/pair_workloads/pair{i}.npz")
    wl.append((np.asarray(d["y1"], np.float32),
               np.asarray(d["y2"], np.float32), d["env"]))
t0 = time.perf_counter()
wl += bench.synth_pair_workloads(11)
n = len(wl)
print(f"{n} pairs built in {time.perf_counter()-t0:.1f}s", flush=True)

out_ref = None
for wave_sz in (5, 8):
    preps = [prepare_pairs(wl[k:k + wave_sz], beam_width=5)
             for k in range(0, n, wave_sz)]

    def run(preps=preps):
        hs = [(p, launch_prepared(p)) for p in preps]
        return [s for p, h in hs for s in fetch_prepared(p, h)]

    t0 = time.perf_counter()
    out = run()  # warm
    print(f"wave {wave_sz}: warm {time.perf_counter()-t0:.1f}s", flush=True)
    out, sec, med = bench._timed(run, n=3)
    if out_ref is None:
        out_ref = out
    else:
        print("outputs equal across wave sizes:", out == out_ref)
    print(f"wave {wave_sz}: {sec:.2f}s min ({med:.2f}s med) = "
          f"{2*n/sec:.2f} reads/s", flush=True)
